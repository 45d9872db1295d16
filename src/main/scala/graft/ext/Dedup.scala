package graft.ext
import graft.Q
object Dedup { val all: Seq[Q] = Seq() }

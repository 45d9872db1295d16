package graft.ext
import graft.Q
object Similarity { val all: Seq[Q] = Seq() }

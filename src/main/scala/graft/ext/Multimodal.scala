package graft.ext
import graft.Q
object Multimodal { val all: Seq[Q] = Seq() }

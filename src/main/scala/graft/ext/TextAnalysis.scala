package graft.ext
import graft.Q
object TextAnalysis { val all: Seq[Q] = Seq() }

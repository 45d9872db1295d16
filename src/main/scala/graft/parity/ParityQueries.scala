package graft.parity
import graft.Q
object ParityQueries { val all: Seq[Q] = Seq() }

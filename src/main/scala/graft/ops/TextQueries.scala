package graft.ops
import graft.Q
object TextQueries { def all: Seq[Q] = Seq.empty }

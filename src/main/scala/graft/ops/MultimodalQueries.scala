package graft.ops
import graft.Q
object MultimodalQueries { def all: Seq[Q] = Seq.empty }

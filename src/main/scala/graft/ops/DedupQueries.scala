package graft.ops
import graft.Q
object DedupQueries { def all: Seq[Q] = Seq.empty }

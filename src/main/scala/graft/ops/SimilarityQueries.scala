package graft.ops
import graft.Q
object SimilarityQueries { def all: Seq[Q] = Seq.empty }

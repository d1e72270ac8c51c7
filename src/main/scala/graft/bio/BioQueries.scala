package graft.bio
import graft.Q
object BioQueries { def all: Seq[Q] = Seq.empty }

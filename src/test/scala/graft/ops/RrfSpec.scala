package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Reciprocal-rank fusion: hand-computed scores, cross-list agreement
  * dominance, id tie-break.
  */
class RrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rrfFuse: hand-computed contributions; agreement outranks any single list") {
    val sparse = Seq((1L, 1), (2L, 2), (4L, 3)).toDF("id", "rank")
    val dense = Seq((2L, 1), (3L, 2), (4L, 4)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq(sparse, dense), "id", "rank", rrfK = 60,
      topK = 10)
      .select("id", "rrf_score", "n_lists")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def c(r: Int) = 1.0 / (60.0 + r)
    assert(out(1L) == ((c(1), 1L)))
    assert(out(2L) == ((c(2) + c(1), 2L)))
    assert(out(4L) == ((c(3) + c(4), 2L)))
    // doc 2 (rank 2 + rank 1) and doc 4 (rank 3 + rank 4) both beat the
    // single-list rank-1 doc 1: agreement dominates
    assert(out(2L)._1 > out(1L)._1 && out(4L)._1 > out(1L)._1)
  }

  test("rrfFuse: equal scores break ties on the smaller id") {
    val a = Seq((7L, 1), (5L, 2)).toDF("id", "rank")
    val b = Seq((5L, 1), (7L, 2)).toDF("id", "rank")
    val ids = Similarity.rrfFuse(Seq(a, b), "id", "rank", topK = 2)
      .select("id").as[Long].collect().toSeq
    assert(ids == Seq(5L, 7L))
  }
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diverse retrieval: pick 1 is plain relevance, and a near-duplicate
  * of the top hit is demoted below a less-relevant-but-diverse candidate.
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // query 0 at e1; candidates: 10 ~= e1 (cos .995), 11 = its near-dup
  // (cos .99 to q, ~1.0 to 10), 12 orthogonal-ish (cos .6)
  private def corpus() = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),
    (10L, Seq(0.995, 0.1, 0.0, 0.0)),
    (11L, Seq(0.99, 0.12, 0.0, 0.0)),
    (12L, Seq(0.6, 0.0, 0.8, 0.0))
  ).toDF("vec_id", "embedding")

  test("pick 1 = most relevant; pick 2 prefers diversity over the near-dup") {
    val c = corpus()
    val got = Similarity.mmrTopK(c, c.filter(col("vec_id") === 0), k = 3,
      lambda = 0.3, candN = 10)
      .orderBy("pick").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got(0) == (1, 10L))
    // plain top-k would rank 11 second; MMR must pick the diverse 12
    assert(got(1) == (2, 12L), s"got ${got.toSeq}")
    assert(got(2) == (3, 11L))
  }

  test("lambda = 1 degenerates to plain cosine top-k order") {
    val c = corpus()
    val got = Similarity.mmrTopK(c, c.filter(col("vec_id") === 0), k = 3,
      lambda = 1.0, candN = 10)
      .orderBy("pick").collect().map(_.getLong(2)).toSeq
    val plain = Similarity.cosineTopK(c, c.filter(col("vec_id") === 0), 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == plain)
  }

  test("k caps at the candidate count") {
    val c = corpus()
    val got = Similarity.mmrTopK(c, c.filter(col("vec_id") === 0), k = 9,
      lambda = 0.7, candN = 10)
    assert(got.count() == 3)
  }
}

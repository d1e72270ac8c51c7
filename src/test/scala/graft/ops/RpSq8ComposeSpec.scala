package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RP ∘ SQ8 composed compression + the exact inner-product baseline:
  * the generous-rerank == exact guarantee must survive BOTH error
  * sources, the composition must never lose recall against plain RP at
  * equal parameters (the grid is far finer than the JL distortion it
  * rides on), and ipTopK must rank by raw inner product.
  */
class RpSq8ComposeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int, dims: Int, seed: Int = 23) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian()).toSeq))
      .toDF("vec_id", "embedding")
  }

  test("rpSq8TopK with rerank covering the corpus matches the exact scan") {
    val c = corpus(120, 16)
    val q = c.filter(col("vec_id") % 30 === 0)
    val got = Similarity.rpSq8TopK(c, q, k = 5, dProj = 8, rerank = 119,
        dims = 16)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.cosineTopK(c, q, 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exact)
  }

  test("composing SQ8 onto RP loses no recall at equal parameters") {
    val c = corpus(200, 32, seed = 7)
    val q = c.filter(col("vec_id") % 40 === 0)
    val exact = Similarity.cosineTopK(c, q, 5)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(approx, exact, 5)
        .agg(avg(col("recall"))).head().getDouble(0)
    val rp = meanRecall(
      Similarity.rpTopK(c, q, k = 5, dProj = 8, rerank = 20, dims = 32))
    val comp = meanRecall(
      Similarity.rpSq8TopK(c, q, k = 5, dProj = 8, rerank = 20, dims = 32))
    // the uint8 grid step over the projected range is orders below the
    // JL distortion — allow at most a one-hit-in-the-suite wobble
    assert(comp >= rp - 0.05, s"composition recall $comp vs rp $rp")
  }

  test("ipTopK ranks by raw inner product, self excluded") {
    val c = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(3.0, 0.0)),   // largest IP with the query
      (2L, Seq(2.0, 0.0)),
      (3L, Seq(-5.0, 0.0))). // large magnitude, wrong direction
      toDF("vec_id", "embedding")
    val q = c.filter(col("vec_id") === 0)
    val got = Similarity.ipTopK(c, q, 3)
      .orderBy(col("rank"))
      .select("neighbor_id", "score")
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.map(_._2) == Seq(3.0, 2.0, -5.0))
  }

  test("ipTopK and cosineTopK agree on unit-norm corpora") {
    val c0 = corpus(80, 8, seed = 41)
    val c = c0.select(col("vec_id"),
      transform(col("embedding"),
        x => x / sqrt(aggregate(transform(col("embedding"), y => y * y),
          lit(0.0), (a, b) => a + b))).as("embedding"))
    val q = c.filter(col("vec_id") % 20 === 0)
    val ip = Similarity.ipTopK(c, q, 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val cos = Similarity.cosineTopK(c, q, 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ip == cos)
  }
}

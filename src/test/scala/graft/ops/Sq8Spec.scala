package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization: calibration, code range, decode error bound,
  * and recall against the exact scan.
  */
class Sq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int, dims: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian()).toSeq))
      .toDF("vec_id", "embedding")
  }

  test("sq8Encode codes stay in [0, 255] and decode error <= half a step") {
    val c = corpus(50, 8)
    val cal = Similarity.sq8Calibration(c)
    val enc = Similarity.sq8Encode(c, cal)
      .join(c.withColumnRenamed("embedding", "raw"), "vec_id")
      .crossJoin(broadcast(cal))
    val bad = enc.withColumn("code_ok", expr(
        "forall(codes, x -> x >= 0 AND x <= 255)"))
      .withColumn("err_ok", expr(
        "forall(transform(dec, (v, i) -> " +
          "abs(v - raw[i]) <= (hi[i] - lo[i]) / 255.0 * 0.5 + 1e-12), x -> x)"))
      .filter(!col("code_ok") || !col("err_ok"))
    assert(bad.count() == 0)
  }

  test("flat dimension encodes 0 and decodes to lo") {
    val c = Seq(
      (0L, Seq(1.0, 2.0)), (1L, Seq(1.0, 5.0)), (2L, Seq(1.0, -3.0))
    ).toDF("vec_id", "embedding")
    val enc = Similarity.sq8Encode(c, Similarity.sq8Calibration(c))
      .orderBy("vec_id").collect()
    enc.foreach { r =>
      assert(r.getAs[Seq[Long]]("codes").head == 0L)
      assert(r.getAs[Seq[Double]]("dec").head == 1.0)
    }
  }

  test("sq8TopK with generous rerank matches the exact scan") {
    val c = corpus(120, 16)
    val q = c.filter(col("vec_id") % 30 === 0)
    val sq = Similarity.sq8TopK(c, q, k = 5, rerank = 40)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.cosineTopK(c, q, 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // rerank=40 on 120 rows: the exact top-5 must be inside the candidate
    // window unless quantization pushed a true neighbor out of the top-40
    // approx list — with 8-bit codes on 16 dims that would be a bug
    assert(sq == exact)
  }

  test("recallAtK counts overlap per query and emits zero-overlap queries") {
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("query_id", "neighbor_id")
    val exact = Seq((1L, 10L), (1L, 12L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(approx, exact, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(1L -> (1L, 0.5), 2L -> (0L, 0.0), 3L -> (0L, 0.0)))
  }

  test("narrow rerank window still returns k ranked rows per query") {
    val c = corpus(80, 8)
    val q = c.filter(col("vec_id") === 0)
    val out = Similarity.sq8TopK(c, q, k = 3, rerank = 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("rank")).sorted.sameElements(Array(1, 2, 3)))
  }
}

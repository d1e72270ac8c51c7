package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JL random-projection ANN: projection shape/determinism, the
  * generous-rerank == exact-scan guarantee, and top-1 on separable blobs.
  */
class RpTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int, dims: Int, seed: Int = 11) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian()).toSeq))
      .toDF("vec_id", "embedding")
  }

  test("rpProject emits dProj components, deterministically") {
    val c = corpus(20, 32)
    val p1 = c.select(col("vec_id"),
      Similarity.rpProject(col("embedding"), 8, 32).as("pv"))
    assert(p1.select(size(col("pv"))).distinct().as[Int].collect()
      .toSeq == Seq(8))
    val a = p1.orderBy("vec_id").collect().map(_.toString)
    val b = c.select(col("vec_id"),
        Similarity.rpProject(col("embedding"), 8, 32).as("pv"))
      .orderBy("vec_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("rpTopK with rerank covering the corpus matches the exact scan") {
    val c = corpus(120, 16)
    val q = c.filter(col("vec_id") % 30 === 0)
    // rerank = corpus size: every row is a candidate, so the exact rerank
    // IS cosineTopK — the approximate stage can only reorder candidates,
    // never drop a true neighbor
    val rp = Similarity.rpTopK(c, q, k = 5, dProj = 8, rerank = 119,
        dims = 16)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.cosineTopK(c, q, 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rp == exact)
  }

  test("rpCandidates pool reranked at width w == rpTopK(rerank = w)") {
    // the sweep contract: one wide pool evaluates every narrower window
    val c = corpus(150, 16, seed = 23)
    val q = c.filter(col("vec_id") % 30 === 0)
    val pool = Similarity.rpCandidates(c, q, dProj = 8, window = 60,
      dims = 16)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    Seq(10, 25, 60).foreach { w =>
      val fromPool = pool.filter(col("arank") <= w)
        .withColumn("_rk", row_number().over(wr))
        .filter(col("_rk") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("_rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val direct = Similarity.rpTopK(c, q, k = 5, dProj = 8, rerank = w,
          dims = 16)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(fromPool == direct, s"window $w pool-rerank != rpTopK")
    }
  }

  test("rpTopK top-1 on well-separated blobs is the exact top-1") {
    // two tight families far apart: JL at dProj=8 on 16 dims preserves
    // the inter-family gap (projected cosine stays ~+1 in-family, ~-1
    // cross-family), so a rerank window the size of one family (30)
    // provably contains the whole home family — the exact rerank then
    // recovers the true top-1. A NARROW window would not: within a tight
    // blob all cosines agree to ~1e-4 and JL cannot rank them.
    val rnd = new scala.util.Random(3)
    val base0 = Array.fill(16)(rnd.nextGaussian() * 0.1 + 5.0)
    val base1 = Array.fill(16)(rnd.nextGaussian() * 0.1 - 5.0)
    val rows = (0 until 60).map { i =>
      val base = if (i % 2 == 0) base0 else base1
      (i.toLong, base.map(_ + rnd.nextGaussian() * 0.05).toSeq)
    }
    val c = rows.toDF("vec_id", "embedding")
    val q = c.filter(col("vec_id") < 4)
    val rp = Similarity.rpTopK(c, q, k = 1, dProj = 8, rerank = 30,
        dims = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val exact = Similarity.cosineTopK(c, q, 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(rp == exact)
    // and the match is family-pure
    rp.foreach { case (qid, nid) => assert(qid % 2 == nid % 2) }
  }

  test("persisted index: build + append == in-memory rpTopK exactly") {
    val c = corpus(90, 16, seed = 31)
    val q = c.filter(col("vec_id") % 30 === 0)
    val dir = java.nio.file.Files.createTempDirectory("rpidxspec").toString
    Similarity.buildRpIndex(c.filter(col("vec_id") < 60), dir,
      dProj = 8, dims = 16)
    Similarity.appendToRpIndex(c.filter(col("vec_id") >= 60), dir)
    val stored = Similarity.searchRpIndexed(spark, dir, q, k = 5,
        rerank = 15)
      .collect().map(_.toString).sorted.toSeq
    val mem = Similarity.rpTopK(c, q, k = 5, dProj = 8, rerank = 15,
        dims = 16)
      .collect().map(_.toString).sorted.toSeq
    assert(stored == mem && mem.nonEmpty)
  }

  test("rpTopK rejects rerank < k and out-of-range dProj") {
    val c = corpus(10, 8)
    intercept[IllegalArgumentException] {
      Similarity.rpTopK(c, c, k = 5, dProj = 4, rerank = 3, dims = 8)
    }
    intercept[IllegalArgumentException] {
      Similarity.rpTopK(c, c, k = 1, dProj = 9, rerank = 2, dims = 8)
    }
  }
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Feature hashing: dense assembly == sparse table, sign unbiasing, and
  * the vectors compose with the cosine family.
  */
class HashEmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs() = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("dense vectors == sparse table, missing buckets zero") {
    val d = 12
    val sparse = TextAnalysis.hashEmbed(docs(), "doc_id", "text", d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val dense = TextAnalysis.hashEmbedVectors(docs(), "doc_id", "text", d)
      .collect()
    assert(dense.nonEmpty)
    dense.foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Double](1)
      assert(v.length == d)
      v.zipWithIndex.foreach { case (x, b) =>
        assert(x == sparse.getOrElse((id, b.toLong), 0.0), s"doc $id bucket $b")
      }
    }
  }

  test("identical docs hash identically; vectors feed cosineTopK") {
    val two = Seq((1L, "alpha beta beta gamma"), (2L, "alpha beta beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val vecs = TextAnalysis.hashEmbedVectors(two, "doc_id", "text", 12)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val top = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") === 1), 1)
      .head()
    assert(top.getLong(1) == 2L && math.abs(top.getDouble(2) - 1.0) < 1e-12)
  }

  test("signs split ~evenly so collisions stay unbiased") {
    val w = TextAnalysis.hashEmbed(docs(), "doc_id", "text", 2)
      .agg(sum(col("w"))).head().getDouble(0)
    val total = docs().select(
      sum(size(split(trim(col("text")), "\\s+")))).head().getLong(0)
    // net signed mass is a small fraction of total token mass
    assert(math.abs(w) < total * 0.2, s"net $w of $total")
  }
}

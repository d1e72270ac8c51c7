package graft.ops

import graft.TestSpark
import graft.bio.KmerCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the codegen-local-collision bug: any custom expression
  * appearing more than once in a single projection must emit fresh local
  * names, or Janino rejects the generated method ("Redefinition of local
  * variable") and Spark silently drops the whole stage to interpreted eval.
  * TestSpark sets spark.sql.codegen.fallback=false, so a collision here is a
  * hard failure, not a slowdown.
  */
class CodegenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("multiple DotProducts in one projection compile (cosine = 3 dots)") {
    val df = Seq(
      (1L, Array(1.0, 0.0, 2.0), Array(0.5, 1.0, 1.0)),
      (2L, Array(3.0, 4.0, 0.0), Array(3.0, 4.0, 0.0))
    ).toDF("id", "a", "b")
    val out = df
      .withColumn("cos_ab", Similarity.cosine(col("a"), col("b")))
      .withColumn("cos_ba", Similarity.cosine(col("b"), col("a")))
      .withColumn("dot2", Similarity.dot(col("a"), col("b")) + Similarity.dot(col("b"), col("b")))
      .orderBy("id")
      .collect()
    assert(math.abs(out(1).getAs[Double]("cos_ab") - 1.0) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("cos_ab") - out(0).getAs[Double]("cos_ba")) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("dot2") - 50.0) < 1e-12)
  }

  test("LongestIdentityRun: leftmost-maximal run, codegen, multiple per projection") {
    val df = Seq(
      ("abcdef", "abxdef"), // runs: [ab]=2, [def]=3 -> (3, 3)
      ("aaaa", "aaaa"), // full match -> (4, 0)
      ("abc", "xyz"), // no match -> (0, 0)
      ("abab", "abab") // (4, 0)
    ).toDF("x", "y")
    val out = df
      .withColumn("r1", Similarity.dot(array(lit(1.0)), array(lit(1.0))) * 0 +
        TextAnalysis.longestIdentityRun(col("x"), col("y")).getField("len"))
      .withColumn("r2", TextAnalysis.longestIdentityRun(col("x"), col("y")))
      .withColumn("r3", TextAnalysis.longestIdentityRun(col("y"), col("x")))
      .select(col("r2.len"), col("r2.start"), col("r3.len"))
      .collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((3, 3), (4, 0), (0, 0), (4, 0)))
    assert(out.forall(r => r.getInt(0) == r.getInt(2)))
  }

  test("winnowing guarantee: docs sharing a >=k+w-1 substring share a fingerprint") {
    val shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghij" // 36 chars >= 11
    val df = Seq(
      (1L, s"prefix-one $shared suffix-one"),
      (2L, s"zzz $shared yyy longer tail here"),
      (3L, "completely unrelated text with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      explode(TextAnalysis.winnowFingerprints(col("text"), 8, 4)).as("f"))
      .select(col("doc_id"), col("f.hash"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty) // MOSS guarantee
    assert((fps(1L) intersect fps(3L)).isEmpty ||
      (fps(1L) intersect fps(3L)).size < (fps(1L) intersect fps(2L)).size)
  }

  test("scrub removes URLs and emails; stratified sample is deterministic") {
    val df = Seq(
      (1L, "see https://example.com/x?a=1 and mail bob@test.org now"),
      (2L, "no links here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrub(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_urls") == 1 && out(0).getAs[Int]("n_emails") == 1)
    assert(out(0).getAs[String]("clean_text") == "see and mail now")
    assert(out(1).getAs[String]("clean_text") == "no links here")

    val big = spark.range(1000).toDF("doc_id")
    val s1 = TextAnalysis.sampleStratified(big, "doc_id", lit(30))
      .collect().map(_.getLong(0)).toSet
    val s2 = TextAnalysis.sampleStratified(big, "doc_id", lit(30))
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // reproducible
    assert(s1.size > 200 && s1.size < 400) // ~30%
  }

  test("multiple KmerEncodes in one projection compile") {
    val df = Seq(("ACDEF", "GHIKL"), ("ACXEF", "MNPQR")).toDF("s1", "s2")
    val alpha = "ACDEFGHIKLMNPQRSTVWY"
    val out = df
      .withColumn("k1", KmerCodec.kmerEncode(col("s1"), alpha))
      .withColumn("k2", KmerCodec.kmerEncode(col("s2"), alpha))
      .collect()
    // X in s1 of row 2 -> null; all others defined
    assert(out.count(r => !r.isNullAt(2)) == 1)
    assert(out.count(r => !r.isNullAt(3)) == 2)
  }
}

package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract of the footer-derived manifest stats fast path:
  * whenever [[Versioned.statsForFooter]] returns Some, its encoded rows
  * must EQUAL the aggregation-job rows ([[Versioned.statsForJob]] — the
  * pre-optimization implementation), and every case the footer path
  * cannot prove exact must return None (so the commit tail falls back to
  * the job, never writing weaker stats).
  */
class FooterStatsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def writeFixture(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val dir = java.nio.file.Files.createTempDirectory("fstats").toString + "/d"
    df.write.parquet(dir)
    spark.read.parquet(dir).inputFiles.toSeq.sorted
  }

  test("footer stats equal aggregation-job stats on a mixed-type table") {
    import spark.implicits._
    val df = (1 to 500).toDF("i")
      .withColumn("iz", col("i") - 1) // exact integer 0 bound: footer-safe
      .withColumn("l", col("i").cast("long") * 1000000007L)
      .withColumn("d", col("i") / 7.0)
      .withColumn("f", (col("i") / 3.0).cast("float"))
      .withColumn("s", concat(lit("k"), lpad(col("i").cast("string"), 5, "0")))
      .withColumn("s_long", rpad(concat(lit("prefix_"),
        col("i").cast("string")), 100, "x")) // > 64 bytes, < 4 KB
      .withColumn("s_null", when(col("i") % 3 === 0, col("s")))
      .withColumn("all_null", lit(null).cast("string"))
      .withColumn("dt", to_date(lit("2026-01-01")))
      .withColumn("ts", to_timestamp(lit("2026-01-01 10:00:00")))
      .withColumn("b", col("i") % 2 === 0)
      .withColumn("arr", array(col("i")))
      .withColumn("neg", -col("i").cast("double") - 0.5)
      .repartition(3)
    val files = writeFixture(df)
    val footer = Versioned.statsForFooter(spark, files)
    assert(footer.isDefined, "mixed-type fixture must take the footer path")
    val job = Versioned.statsForJob(spark, files)
    assert(footer.get.toSet == job.toSet,
      s"footer rows != job rows:\n  footer-only: ${
        footer.get.toSet -- job.toSet}\n  job-only: ${
        job.toSet -- footer.get.toSet}")
  }

  test("string values above the footer-stats cap fall back to the job") {
    import spark.implicits._
    val huge = "x" * 5000 // > parquet-mr's 4 KB footer stats cap
    val df = Seq((1, huge), (2, "small")).toDF("i", "s")
    val files = writeFixture(df)
    assert(Versioned.statsForFooter(spark, files).isEmpty,
      "dropped footer stats must not be treated as provable")
  }

  test("NaN bounds fall back to the job") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, 3.0).toDF("d")
    val files = writeFixture(df)
    val footer = Versioned.statsForFooter(spark, files)
    // either the footer path refuses (preferred) or it must match the job
    footer.foreach(f =>
      assert(f.toSet == Versioned.statsForJob(spark, files).toSet))
    assert(footer.isEmpty, "NaN-poisoned footer min/max must not be used")
  }

  test("zero/minus-zero bounds normalize to +0.0 on the footer path") {
    import spark.implicits._
    val df = Seq(-0.0, 0.0, 2.5).toDF("d").coalesce(1)
    val files = writeFixture(df)
    val footer = Versioned.statsForFooter(spark, files)
    assert(footer.isDefined)
    val st = footer.get.map(Versioned.decodeStat)
    assert(st.size == 1)
    // +0.0, never parquet-mr's sign-smudged -0.0 (numerically equal, but
    // the manifest spelling must be deterministic)
    assert(st.head.lo.contains(0.0) &&
      st.head.lo.get.toString == "0.0" && st.head.hi.contains(2.5))
  }

  test("plain double zero bound matches the job byte-for-byte") {
    import spark.implicits._
    val df = Seq(0.0, 1.5, 560.21).toDF("d").coalesce(1)
    val files = writeFixture(df)
    val footer = Versioned.statsForFooter(spark, files)
    assert(footer.isDefined)
    assert(footer.get.toSet == Versioned.statsForJob(spark, files).toSet)
  }
}

package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 history derivation (q32): hand-built change log + structural
  * invariants on the real sf0.001 events table.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q32_scd2 invariants on sf0.001: versions dense, one current row") {
    val out = RelQueries.q32Scd2.run(spark, "/root/testdata/sf0.001").cache()
    assert(out.count() > 0)
    // exactly one open-ended (current) state per user
    val badCurrent = out.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
      .filter(col("n") =!= 1)
    assert(badCurrent.count() == 0)
    // versions are 1..n dense per user
    val badVersion = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max(col("version")).as("mx"),
        min(col("version")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(badVersion.count() == 0)
    // every closed interval ends where the next one starts, and no
    // adjacent rows share a state (else they'd have been collapsed)
    val rows = out.orderBy("user_id", "version")
      .select("user_id", "state", "valid_from", "valid_to", "version")
      .collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getLong(0) == b.getLong(0) =>
        assert(a.getString(3) == b.getString(2),
          s"gap between versions for user ${a.getLong(0)}")
        assert(a.getString(1) != b.getString(1),
          s"uncollapsed repeat state for user ${a.getLong(0)}")
      case _ =>
    }
    out.unpersist()
  }

  test("hand-built change log collapses repeats and stamps intervals") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 7L, "a", 0.0, "{}"),
      (2L, "2024-01-01 01:00:00", 7L, "a", 0.0, "{}"),
      (3L, "2024-01-01 02:00:00", 7L, "b", 0.0, "{}"),
      (4L, "2024-01-01 03:00:00", 7L, "b", 0.0, "{}"),
      (5L, "2024-01-01 04:00:00", 7L, "a", 0.0, "{}"),
      (6L, "2024-01-01 00:30:00", 8L, "x", 0.0, "{}"))
      .toDF("event_id", "s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val dir = java.nio.file.Files.createTempDirectory("scd2").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelQueries.q32Scd2.run(spark, dir)
      .select("user_id", "state", "version", "is_current")
      .as[(Long, String, Int, Boolean)].collect().toSeq
    assert(out == Seq(
      (7L, "a", 1, false), (7L, "b", 2, false), (7L, "a", 3, true),
      (8L, "x", 1, true)))
  }
}

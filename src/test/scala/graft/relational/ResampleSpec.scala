package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-fixture semantics for the q47 resample + forward-fill chain: grid
  * bounds, gap carry-forward, and the same-hour tie pick must match the
  * documented contract on data small enough to eyeball (the oracle gate
  * proves engine equivalence; this pins WHAT the contract is).
  */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Long, String, Long, Double)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("resample").toString
    rows.toDF("event_id", "s", "user_id", "value")
      .withColumn("ts", col("s").cast("timestamp"))
      .withColumn("event_type", lit("view"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RelQueries.q47ResampleFfill.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
  }

  test("grid spans first to last event hour; gaps carry last value forward") {
    // user 7: events at 00:10 (v=1.0) and 03:20 (v=4.0) — grid must be
    // hours 00..03 with 01 and 02 carrying 1.0 forward
    val out = run(Seq(
      (1L, "2024-01-01 00:10:00", 7L, 1.0),
      (2L, "2024-01-01 03:20:00", 7L, 4.0)))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01 00:00:00", 1.0),
      (7L, "2024-01-01 01:00:00", 1.0),
      (7L, "2024-01-01 02:00:00", 1.0),
      (7L, "2024-01-01 03:00:00", 4.0)))
  }

  test("same-hour ties resolve to the LAST observation by (ts, event_id)") {
    // three observations inside hour 00: latest ts wins; equal ts falls
    // back to the larger event_id — the immutable total order
    val out = run(Seq(
      (1L, "2024-01-01 00:05:00", 7L, 1.0),
      (3L, "2024-01-01 00:30:00", 7L, 3.0),
      (2L, "2024-01-01 00:30:00", 7L, 2.0),
      (4L, "2024-01-01 01:00:00", 7L, 9.0)))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01 00:00:00", 3.0),
      (7L, "2024-01-01 01:00:00", 9.0)))
  }

  test("users are independent: separate spans, no cross-user leakage") {
    val out = run(Seq(
      (1L, "2024-01-01 00:10:00", 1L, 1.0),
      (2L, "2024-01-01 01:10:00", 1L, 2.0),
      (3L, "2024-01-05 10:10:00", 2L, 5.0)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 01:00:00", 2.0),
      (2L, "2024-01-05 10:00:00", 5.0)))
  }
}

package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q54/q56's semantic claims beyond the oracle gate: the MAD z-score's
  * robustness (the reason it exists instead of a mean/stddev z) and the
  * cohort matrix's shape on a crafted log.
  */
class AnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("median/MAD flags heavy contamination that MASKS a mean/stddev " +
      "z-score (the robustness property, on a crafted sample)") {
    import spark.implicits._
    // 60 inliers 0..59, 30 contaminants at 1000: the contaminants drag
    // mean (~353) and stddev (~450) so far that their classic z is ~1.4
    // — classic 3.5-sigma flags NOTHING. Median (~44) and MAD stay on
    // the inliers, so the robust z flags exactly the 30 contaminants.
    val vals = (0 until 60).map(_.toDouble) ++ Seq.fill(30)(1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "value")
    val stats = df.agg(
      percentile($"value", lit(0.5)).as("med"),
      avg($"value").as("mu"),
      stddev_pop($"value").as("sigma")).head()
    val med = stats.getAs[Double]("med")
    val mad = df.agg(percentile(abs($"value" - med), lit(0.5))).head()
      .getDouble(0)
    val flaggedRobust = df
      .filter(abs(lit(0.6745) * ($"value" - med) / mad) > 3.5)
      .count()
    val flaggedClassic = df
      .filter(abs(($"value" - stats.getAs[Double]("mu")) /
        stats.getAs[Double]("sigma")) > 3.5)
      .count()
    assert(flaggedRobust === 30L, s"robust flagged $flaggedRobust, not 30")
    assert(flaggedClassic === 0L,
      s"classic z flagged $flaggedClassic — masking demo broken")
  }

  test("retention matrix on a crafted log: cohort rows decay, offsets " +
      "count distinct users once per active week") {
    import spark.implicits._
    // wk0 = 2024-01-01 (a Monday). u1 active wk0,wk1,wk2; u2 wk0,wk2;
    // u3 joins wk1, active wk1 only. Duplicate events inside a week must
    // not double-count.
    def t(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")
    val ev = Seq(
      (1L, t(1, 9)), (1L, t(2, 9)), (1L, t(8, 9)), (1L, t(15, 9)),
      (2L, t(3, 9)), (2L, t(16, 9)),
      (3L, t(9, 9)), (3L, t(10, 9))
    ).toDF("user_id", "ts")
    val act = ev.select($"user_id",
      date_trunc("week", $"ts").as("wk")).distinct()
    val got = act
      .withColumn("cohort", min($"wk").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")))
      .groupBy(date_format($"cohort", "yyyy-MM-dd").as("cohort_week"),
        (datediff($"wk", $"cohort") / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(got === Set(
      ("2024-01-01", 0, 2L), // u1, u2
      ("2024-01-01", 1, 1L), // u1
      ("2024-01-01", 2, 2L), // u1, u2
      ("2024-01-08", 0, 1L)  // u3
    ))
  }
}

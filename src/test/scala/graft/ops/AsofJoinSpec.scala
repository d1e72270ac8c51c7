package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Backward as-of join: directed semantics cases plus a randomized
  * differential against a brute-force per-row argmax.
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("asofBackward: most-recent-prior match, >= tie, pre-first-row nulls") {
    val left = Seq(
      (1L, 10L, ts(5)),   // before any right row -> nulls
      (2L, 10L, ts(20)),  // matches right @10
      (3L, 10L, ts(30)),  // EQUAL ts: right @30 visible (>= semantics)
      (4L, 10L, ts(95)),  // matches latest right @30, skipping none
      (5L, 99L, ts(50))   // key with no right rows at all -> nulls
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (10L, ts(10), 1.0), (10L, ts(30), 2.0)
    ).toDF("k", "ts", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("v"))
      .select($"event_id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1L -> None, 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> Some(2.0), 5L -> None))
  }

  test("asofBackward: matched right ts is emitted; left columns survive") {
    val left = Seq((7L, 1L, ts(100), "payload")).toDF("id", "k", "ts", "extra")
    val right = Seq((1L, ts(40), 9.0)).toDF("k", "ts", "v")
    val r = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"extra", $"asof_ts", $"asof_v").head()
    assert(r.getLong(0) == 7L && r.getString(1) == "payload")
    assert(r.getTimestamp(2) == ts(40) && r.getDouble(3) == 9.0)
  }

  test("asofForward: earliest-at-or-after match, >= tie, post-last-row nulls") {
    val left = Seq(
      (1L, 10L, ts(5)),   // matches right @10 (earliest at/after)
      (2L, 10L, ts(10)),  // EQUAL ts: right @10 visible
      (3L, 10L, ts(11)),  // matches right @30
      (4L, 10L, ts(31)),  // past the last right row -> nulls
      (5L, 99L, ts(50))   // key with no right rows -> nulls
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (10L, ts(10), 1.0), (10L, ts(30), 2.0)
    ).toDF("k", "ts", "v")
    val out = AsofJoin.asofForward(left, right, Seq("k"), "ts", Seq("v"))
      .select($"event_id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> None, 5L -> None))
  }

  test("asofForward == brute-force argmin on randomized data") {
    val rnd = new scala.util.Random(31)
    val leftRows = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000).toLong)))
    val rightRows = rnd.shuffle((1 to 5).flatMap(k =>
      rnd.shuffle((0 until 1000).toList).take(40).map(t =>
        (k.toLong, ts(t.toLong), rnd.nextDouble()))))
    val out = AsofJoin.asofForward(
      leftRows.toDF("id", "k", "ts"), rightRows.toDF("k", "ts", "v"),
      Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.before(t)).sortBy(_._2.getTime).headOption.map(_._3)
    }.toMap
    assert(out == expected)
    assert(expected.values.exists(_.isEmpty) &&
      expected.values.exists(_.nonEmpty), "vacuous fixture")
  }

  test("asofNearest: closer side wins, exact tie prefers backward, one-sided rows covered") {
    val left = Seq(
      (1L, 10L, ts(12)),  // bwd @10 (d=2) beats fwd @30 (d=18)
      (2L, 10L, ts(28)),  // fwd @30 (d=2) beats bwd @10 (d=18)
      (3L, 10L, ts(20)),  // EXACT tie (d=10 both) -> backward @10
      (4L, 10L, ts(5)),   // nothing behind -> forward @10
      (5L, 10L, ts(99)),  // nothing ahead -> backward @30
      (6L, 77L, ts(50))   // no right rows at all -> nulls
    ).toDF("event_id", "k", "ts")
    val right = Seq((10L, ts(10), 1.0), (10L, ts(30), 2.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofNearest(left, right, Seq("k"), "ts", Seq("v"))
      .select($"event_id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(1.0),
      4L -> Some(1.0), 5L -> Some(2.0), 6L -> None))
  }

  test("asofNearest == brute-force nearest on randomized data") {
    val rnd = new scala.util.Random(47)
    val leftRows = (0 until 250).map(i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong, ts(rnd.nextInt(800).toLong)))
    val rightRows = rnd.shuffle((1 to 4).flatMap(k =>
      rnd.shuffle((0 until 800).toList).take(30).map(t =>
        (k.toLong, ts(t.toLong), rnd.nextDouble()))))
    val out = AsofJoin.asofNearest(
      leftRows.toDF("id", "k", "ts"), rightRows.toDF("k", "ts", "v"),
      Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (id, k, t) =>
      val cands = byKey.getOrElse(k, Seq.empty)
      id -> (if (cands.isEmpty) None else {
        // min |dt|; ties prefer backward (r.ts <= t), then... unique ts
        // per key in this fixture, so (|dt|, forward?) is a total order
        Some(cands.minBy(c => (math.abs(c._2.getTime - t.getTime),
          if (c._2.getTime <= t.getTime) 0 else 1))._3)
      })
    }.toMap
    assert(out == expected)
    assert(expected.values.exists(_.nonEmpty), "vacuous fixture")
  }

  test("asofBackward == brute-force argmax on randomized data") {
    val rnd = new scala.util.Random(11)
    val leftRows = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000).toLong)))
    // unique (k, ts) right rows, as the contract requires
    val rightRows = rnd.shuffle((1 to 5).flatMap(k =>
      rnd.shuffle((0 until 1000).toList).take(40).map(t =>
        (k.toLong, ts(t.toLong), rnd.nextDouble()))))
    val out = AsofJoin.asofBackward(
      leftRows.toDF("id", "k", "ts"), rightRows.toDF("k", "ts", "v"),
      Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(t)).sortBy(_._2.getTime).lastOption.map(_._3)
    }.toMap
    assert(out == expected)
    assert(expected.values.exists(_.isEmpty) &&
      expected.values.exists(_.nonEmpty), "vacuous fixture")
  }

  test("tolerance gate: stale matches null out, left rows survive") {
    val left = Seq(
      (1L, 10L, ts(100)),  // match @90: 10s back, inside 30s tolerance
      (2L, 10L, ts(200)),  // match @90: 110s back, GATED -> nulls
      (3L, 10L, ts(90))    // exact-ts match: delta 0, inside
    ).toDF("event_id", "k", "ts")
    val right = Seq((10L, ts(90), 7.0)).toDF("k", "ts", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("v"),
      tolerance = Some(expr("INTERVAL 30 SECONDS")))
      .select($"event_id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1L -> Some(7.0), 2L -> None, 3L -> Some(7.0)))
  }

  test("tolerance nearest == brute-force with the same bound, randomized") {
    val rnd = new scala.util.Random(53)
    val leftRows = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000).toLong)))
    val rightRows = rnd.shuffle((1 to 5).flatMap(k =>
      rnd.shuffle((0 until 1000).toList).take(25).map(t =>
        (k.toLong, ts(t.toLong), rnd.nextDouble()))))
    val tolSec = 15L
    val out = AsofJoin.asofNearest(
      leftRows.toDF("id", "k", "ts"), rightRows.toDF("k", "ts", "v"),
      Seq("k"), "ts", Seq("v"),
      tolerance = Some(expr(s"INTERVAL $tolSec SECONDS")))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (id, k, t) =>
      val cands = byKey.getOrElse(k, Seq.empty)
        .filter(r => math.abs(r._2.getTime - t.getTime) <= tolSec * 1000L)
      id -> (if (cands.isEmpty) None
      else {
        // nearest; exact tie prefers the backward (at-or-before) match
        val best = cands.minBy(r => (math.abs(r._2.getTime - t.getTime),
          if (r._2.getTime <= t.getTime) 0 else 1))
        Some(best._3)
      })
    }.toMap
    assert(out == expected)
    assert(expected.values.exists(_.isEmpty) &&
      expected.values.exists(_.nonEmpty), "vacuous fixture")
  }

  test("allowExactMatches=false: equal-ts rows invisible in both directions") {
    val left = Seq((1L, 10L, ts(30)), (2L, 10L, ts(31)))
      .toDF("event_id", "k", "ts")
    val right = Seq((10L, ts(10), 1.0), (10L, ts(30), 2.0), (10L, ts(40), 3.0))
      .toDF("k", "ts", "v")
    val bwd = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("v"),
      allowExactMatches = false)
      .select($"event_id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // row 1 @30: the @30 right row is invisible (strict <) -> falls to @10
    assert(bwd == Map(1L -> Some(1.0), 2L -> Some(2.0)))
    val fwd = AsofJoin.asofForward(left, right, Seq("k"), "ts", Seq("v"),
      allowExactMatches = false)
      .select($"event_id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // row 1 @30: strict > skips @30 -> @40
    assert(fwd == Map(1L -> Some(3.0), 2L -> Some(3.0)))
  }

  test("strict backward == brute-force strict argmax on randomized ties") {
    val rnd = new scala.util.Random(61)
    // coarse ts grid so exact collisions are COMMON, not accidental
    val leftRows = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong, ts(rnd.nextInt(40).toLong * 10)))
    val rightRows = rnd.shuffle((1 to 4).flatMap(k =>
      rnd.shuffle((0 until 40).toList).take(15).map(t =>
        (k.toLong, ts(t.toLong * 10), rnd.nextDouble()))))
    val out = AsofJoin.asofBackward(
      leftRows.toDF("id", "k", "ts"), rightRows.toDF("k", "ts", "v"),
      Seq("k"), "ts", Seq("v"), allowExactMatches = false)
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(_._2.before(t)).sortBy(_._2.getTime).lastOption.map(_._3)
    }.toMap
    assert(out == expected)
    // fixture must contain at least one case where strictness CHANGED the
    // match (an exact-ts right row was skipped)
    val lax = leftRows.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(t)).sortBy(_._2.getTime).lastOption.map(_._3)
    }.toMap
    assert(expected != lax, "vacuous fixture: no exact-ts collisions hit")
  }

  test("banded bounded-staleness == window-plan tolerance, randomized + skew") {
    val rnd = new scala.util.Random(71)
    // skewed: key 1 holds ~2/3 of all rows (the hot-key case the banded
    // plan exists for), including exact-ts collisions with right rows
    val leftRows = (0 until 400).map { i =>
      val k = if (i % 3 != 0) 1L else (rnd.nextInt(4) + 2).toLong
      (i.toLong, k, ts(rnd.nextInt(600).toLong))
    }
    val rightRows = rnd.shuffle((1 to 5).flatMap(k =>
      rnd.shuffle((0 until 600).toList).take(30).map(t =>
        (k.toLong, ts(t.toLong), rnd.nextDouble()))))
    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "v")
    for (tolSec <- Seq(0L, 7L, 50L)) {
      val banded = AsofJoin.asofBackwardBanded(left, right, Seq("k"), "ts",
        Seq("v"), toleranceSec = tolSec, leftIdCol = "id")
        .select($"id", $"asof_ts", $"asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_ =>
          (r.getTimestamp(1), r.getDouble(2)))).toMap
      val window = AsofJoin.asofBackward(left, right, Seq("k"), "ts",
        Seq("v"), tolerance = Some(expr(s"INTERVAL $tolSec SECONDS")))
        .select($"id", $"asof_ts", $"asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_ =>
          (r.getTimestamp(1), r.getDouble(2)))).toMap
      assert(banded == window, s"toleranceSec=$tolSec")
      assert(window.values.exists(_.isEmpty) &&
        window.values.exists(_.nonEmpty), s"vacuous fixture tol=$tolSec")

      // forward and nearest twins against their window-plan equivalents
      def proj(df: org.apache.spark.sql.DataFrame) = df
        .select($"id", $"asof_ts", $"asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_ =>
          (r.getTimestamp(1), r.getDouble(2)))).toMap
      assert(proj(AsofJoin.asofForwardBanded(left, right, Seq("k"), "ts",
        Seq("v"), tolSec, "id")) ==
        proj(AsofJoin.asofForward(left, right, Seq("k"), "ts", Seq("v"),
          tolerance = Some(expr(s"INTERVAL $tolSec SECONDS")))),
        s"fwd tol=$tolSec")
      assert(proj(AsofJoin.asofNearestBanded(left, right, Seq("k"), "ts",
        Seq("v"), tolSec, "id")) ==
        proj(AsofJoin.asofNearest(left, right, Seq("k"), "ts", Seq("v"),
          tolerance = Some(expr(s"INTERVAL $tolSec SECONDS")))),
        s"nearest tol=$tolSec")
    }
  }

  test("leftCols narrow-payload contract == full carry, projected") {
    val rnd = new scala.util.Random(41)
    val left = (0 until 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000).toLong),
        "wide-" * 20 + i)).toDF("id", "k", "ts", "payload")
    val right = rnd.shuffle((1 to 5).flatMap(k =>
      rnd.shuffle((0 until 1000).toList).take(30).map(t =>
        (k.toLong, ts(t.toLong), rnd.nextDouble()))))
      .toDF("k", "ts", "v")
    for (dir <- Seq("bwd", "fwd", "nearest")) {
      def run(lc: Seq[String]) = (dir match {
        case "bwd" => AsofJoin.asofBackward(left, right, Seq("k"), "ts",
          Seq("v"), leftCols = lc)
        case "fwd" => AsofJoin.asofForward(left, right, Seq("k"), "ts",
          Seq("v"), leftCols = lc)
        case _ => AsofJoin.asofNearest(left, right, Seq("k"), "ts",
          Seq("v"), leftCols = lc)
      })
      val narrow = run(Seq("id"))
      // the wide payload column is genuinely absent from the narrow plan
      assert(!narrow.columns.contains("payload"))
      val got = narrow.select($"id", $"asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val want = run(Seq.empty).select($"id", $"asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got == want, dir)
      assert(want.values.exists(_.nonEmpty), "vacuous fixture")
    }
    // unknown columns fail loudly, not silently drop
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("v"),
        leftCols = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  // Regression: the driver testdata shifted to plain timestamp[us] parquet,
  // which Spark reads as TIMESTAMP_NTZ — asofNearest's delta comparison
  // must accept NTZ (round-10 failure: unix_micros rejected it outright).
  test("asofNearest works on TIMESTAMP_NTZ columns") {
    import java.time.LocalDateTime
    def ldt(s: String) = LocalDateTime.parse(s)
    val left = Seq((1L, 10L, ldt("2024-01-01T10:00:00")),
      (2L, 10L, ldt("2024-01-01T10:40:00"))).toDF("id", "k", "ts")
    val right = Seq((10L, ldt("2024-01-01T09:50:00"), 1.0),
      (10L, ldt("2024-01-01T10:25:00"), 2.0)).toDF("k", "ts", "v")
    assert(left.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val out = AsofJoin.asofNearest(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // row 1: 10 min back vs 25 min fwd -> bwd; row 2: 15 min back -> bwd
    assert(out == Map(1L -> 1.0, 2L -> 2.0))
  }

  // NTZ is pure wall clock: deltas must be wall-clock differences, never
  // mapped through the session timezone. Across a DST spring-forward the
  // tz mapping is non-monotonic (the old cast-to-TIMESTAMP rewrite took
  // different UTC offsets for the two ends of a delta and flipped the
  // nearest choice). America/New_York 2026-03-08: 02:00->03:00 skip.
  test("asofNearest on NTZ is timezone-invariant across a DST gap") {
    import java.time.LocalDateTime
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val left = Seq((1L, 1L, LocalDateTime.parse("2026-03-08T03:00:00")))
        .toDF("id", "k", "ts")
      val right = Seq(
        (1L, LocalDateTime.parse("2026-03-08T01:30:00"), "bwd"),
        (1L, LocalDateTime.parse("2026-03-08T04:00:00"), "fwd"))
        .toDF("k", "ts", "v")
      // wall clock: 90 min back vs 60 min fwd -> fwd. Mapped through
      // America/New_York instants it would be 30 min back vs 60 min fwd
      // and wrongly pick bwd.
      val out = AsofJoin.asofNearest(left, right, Seq("k"), "ts", Seq("v"))
        .select($"asof_v").head().getString(0)
      assert(out == "fwd")
    } finally spark.conf.set(tzKey, saved)
  }
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Banded interval join: boundary semantics, exactly-once pair emission,
  * randomized differential vs the naive inequality join, plan shape.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("intervalJoin: inclusive bounds, non-matches dropped, once per pair") {
    val pts = Seq((1L, 5L, ts(100)), (2L, 5L, ts(200)), (3L, 5L, ts(201)),
      (4L, 6L, ts(150))).toDF("id", "k", "ts")
    val ivs = Seq((5L, 10L, ts(100), ts(200), "a"))
      .toDF("k", "iid", "s", "e", "tag")
    val out = RangeJoin.intervalJoin(pts, ivs, Seq("k"), "ts", "s", "e",
      bandWidth = 30L)
      .select($"id", $"iv_iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // id 1 and 2 inside [100, 200] (both ends inclusive); 3 is past the
    // end; 4 is another key. Each match appears EXACTLY once even though
    // the interval spans 4+ bands.
    assert(out.sorted.toSeq == Seq((1L, 10L), (2L, 10L)))
  }

  test("intervalJoin == naive inequality join on randomized data, any bandWidth") {
    val rnd = new scala.util.Random(23)
    val pts = (0 until 400).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong, ts(rnd.nextInt(5000).toLong)))
      .toDF("id", "k", "ts")
    val ivs = (0 until 80).map { i =>
      val s = rnd.nextInt(5000).toLong
      ((rnd.nextInt(6) + 1).toLong, i.toLong, ts(s),
        ts(s + rnd.nextInt(400).toLong))
    }.toDF("k", "iid", "s", "e")
    val naive = pts.join(ivs, Seq("k"))
      .filter($"s" <= $"ts" && $"ts" <= $"e")
      .select($"id", $"iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(7L, 100L, 1000L)) {
      val banded = RangeJoin.intervalJoin(pts, ivs, Seq("k"), "ts", "s", "e",
        bandWidth = w)
        .select($"id", $"iv_iid").as[(Long, Long)].collect().toSet
      assert(banded == naive, s"bandWidth=$w")
    }
    assert(naive.nonEmpty, "vacuous fixture")
  }

  test("fan-out guard: over-long intervals take the broadcast path, same rows") {
    val rnd = new scala.util.Random(31)
    val pts = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong, ts(rnd.nextInt(5000).toLong)))
      .toDF("id", "k", "ts")
    // mix: typical intervals plus a degenerate year-long one (at
    // bandWidth=100 it spans ~315k bands — pre-guard it would explode
    // that many copies; the guard routes it to the broadcast side)
    val ivs = ((0 until 40).map { i =>
      val s = rnd.nextInt(5000).toLong
      ((rnd.nextInt(4) + 1).toLong, i.toLong, ts(s),
        ts(s + rnd.nextInt(300).toLong))
    } :+ ((2L, 99L, ts(0), ts(365L * 24 * 3600)))).toDF("k", "iid", "s", "e")
    val naive = pts.join(ivs, Seq("k"))
      .filter($"s" <= $"ts" && $"ts" <= $"e")
      .select($"id", $"iid").as[(Long, Long)].collect().toSet
    // every key-2 point falls inside the year interval
    assert(naive.exists(_._2 == 99L), "vacuous fixture")
    for (cap <- Seq(1, 3, 4096)) {
      val out = RangeJoin.intervalJoin(pts, ivs, Seq("k"), "ts", "s", "e",
        bandWidth = 100L, maxFanout = cap)
        .select($"id", $"iv_iid").as[(Long, Long)].collect().toSet
      assert(out == naive, s"maxFanout=$cap")
    }
  }

  test("fan-out guard: reversed intervals match nothing and never explode") {
    val pts = Seq((1L, 5L, ts(100))).toDF("id", "k", "ts")
    // end far before start: a descending band sequence would explode
    // millions of rows; the guard's 1..maxFanout band-count predicate
    // routes it to the broadcast side where the residual discards it
    val ivs = Seq((5L, 10L, ts(400000000L), ts(0L)))
      .toDF("k", "iid", "s", "e")
    assert(RangeJoin.intervalJoin(pts, ivs, Seq("k"), "ts", "s", "e")
      .count() == 0)
  }

  test("intervalJoin plans as a shuffled equi-join, not nested-loop") {
    val pts = Seq((1L, 5L, ts(100))).toDF("id", "k", "ts")
    val ivs = Seq((5L, 10L, ts(90), ts(110))).toDF("k", "iid", "s", "e")
    val plan = RangeJoin.intervalJoin(pts, ivs, Seq("k"), "ts", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}

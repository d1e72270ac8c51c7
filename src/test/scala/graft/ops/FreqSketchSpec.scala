package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries mergeable heavy-hitters (q55's engine and the
  * heavyHittersSink's fold). Pins both regimes the scaladoc claims:
  * the EXACT regime (capacity ≥ distinct keys in every partial — the
  * oracle gate's determinism argument) and the LOSSY regime's
  * mergeable-summaries guarantees (n/(m+1) error bound, heavy-key
  * survival) across shard layouts, plus the streaming maintenance's
  * replay/equivalence contract.
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mg(keys: Seq[String], m: Int): Map[String, Long] =
    keys.foldLeft(Map.empty[String, Long])(FreqSketch.addOne(_, _, m))

  test("exact regime: capacity >= distinct => summary IS the count map") {
    val keys = Seq("a", "b", "a", "c", "a", "b", "d")
    assert(mg(keys, 4) === Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
    // merges of exact partials stay exact, at any split point
    (1 until keys.size).foreach { cut =>
      val merged = FreqSketch.mergeSummaries(
        mg(keys.take(cut), 4), mg(keys.drop(cut), 4), 4)
      assert(merged === mg(keys, 4), s"split at $cut drifted")
    }
  }

  test("lossy regime: n/(m+1) error bound and heavy-key survival " +
      "hold for single-pass and for every merge layout") {
    // skewed stream: one heavy key over a long tail of singletons
    val keys = Seq.fill(400)("hot") ++ (1 to 600).map(i => s"t$i")
    val m = 16
    val n = keys.size
    val bound = n / (m + 1) // = 58
    def check(s: Map[String, Long], label: String): Unit = {
      assert(s.size <= m, s"$label: ${s.size} entries > capacity")
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      s.foreach { case (k, est) =>
        val e = exact.getOrElse(k, 0L)
        assert(est <= e && e - est <= bound,
          s"$label: $k est=$est exact=$e outside [e-$bound, e]")
      }
      // any key with true count > n/(m+1) must be present
      assert(s.contains("hot"), s"$label: heavy key evicted")
      assert(s("hot") >= 400L - bound)
    }
    check(mg(keys, m), "single-pass")
    Seq(2, 5, 10).foreach { shards =>
      val parts = keys.zipWithIndex.groupBy(_._2 % shards)
        .values.map(p => mg(p.map(_._1), m))
      check(parts.reduce(FreqSketch.mergeSummaries(_, _, m)),
        s"$shards-shard merge")
    }
  }

  test("q55 layout invariance in the exact regime: merged top-k equals " +
      "the exact groupBy count at 2, 8, and 32 shards") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val exact = li.groupBy($"l_suppkey".cast("string").as("key"))
      .agg(count(lit(1)).as("est"))
      .orderBy($"est".desc, $"key").limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Seq(2, 8, 32).foreach { shards =>
      val merged = li
        .groupBy(($"l_orderkey" % shards).as("shard"))
        .agg(FreqSketch.misraGries($"l_suppkey".cast("string"), 4096)
          .as("sk"))
        .agg(FreqSketch.misraGriesMerge($"sk", 4096).as("merged"))
      val got = FreqSketch.topK(merged, "merged", 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === exact, s"$shards shards diverged from exact")
    }
  }

  test("heavyHittersSink: 3-slice maintenance == batch counts; replay " +
      "rewrites identical bytes") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("hhsink").toString
    (0 to 2).foreach { i =>
      graft.streaming.EventsStream.processHeavyHittersBatch(
        ev.filter($"event_id" % 3 === i), i.toLong, "event_type", 64, dir)
    }
    val got = graft.streaming.EventsStream
      .heavyHittersTopK(spark, dir, 64, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = ev.groupBy($"event_type".cast("string").as("key"))
      .agg(count(lit(1)).as("est"))
      .orderBy($"est".desc, $"key").limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exact)
    // replayed trigger: overwrite its own batch dir, answer unchanged
    graft.streaming.EventsStream.processHeavyHittersBatch(
      ev.filter($"event_id" % 3 === 1), 1L, "event_type", 64, dir)
    val replayed = graft.streaming.EventsStream
      .heavyHittersTopK(spark, dir, 64, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(replayed === exact, "replay changed the maintained answer")
  }

  test("summary compaction: merging any subset of persisted rows into " +
      "one preserves the merged answer (associativity on disk)") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val summaries = li
      .groupBy(($"l_orderkey" % 8).as("shard"))
      .agg(FreqSketch.misraGries($"l_suppkey".cast("string"), 4096)
        .as("sk"))
    val full = FreqSketch.topK(
      summaries.agg(FreqSketch.misraGriesMerge($"sk", 4096).as("m")),
      "m", 10).collect().toSeq
    // compact shards 0-3 into one row, keep 4-7 as-is, re-merge
    val compacted = summaries.filter($"shard" < 4)
      .agg(FreqSketch.misraGriesMerge($"sk", 4096).as("sk"))
      .unionByName(summaries.filter($"shard" >= 4).select($"sk"))
    val got = FreqSketch.topK(
      compacted.agg(FreqSketch.misraGriesMerge($"sk", 4096).as("m")),
      "m", 10).collect().toSeq
    assert(got === full)
  }
}

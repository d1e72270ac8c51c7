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

  private def evDf(rows: Seq[(Long, String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "s", "user_id", "event_type")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
  }

  private def histSet(path: String) =
    spark.read.parquet(s"$path/history")
      .select(col("user_id"), col("state"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("version"), col("is_current"))
      .collect().map(_.toString).toSet

  test("merge == full rebuild: change, no-change, new-user, seed-only") {
    val early = evDf(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "a"),
      (2L, "2024-01-01 01:00:00", 7L, "b"),
      (3L, "2024-01-01 00:00:00", 8L, "x"),
      (4L, "2024-01-01 00:00:00", 9L, "p")))
    val late = evDf(Seq(
      (5L, "2024-01-02 00:00:00", 7L, "b"),   // no-change: still b
      (6L, "2024-01-02 01:00:00", 7L, "a"),   // change: new version
      (7L, "2024-01-02 00:00:00", 8L, "y"),   // change
      (8L, "2024-01-02 00:00:00", 10L, "n"))) // brand-new user
    // user 9 untouched by the batch: rows must pass through verbatim
    val inc = java.nio.file.Files.createTempDirectory("scd2m").toString
    Scd2.init(early, inc)
    Scd2.merge(spark, inc, late)
    val full = java.nio.file.Files.createTempDirectory("scd2f").toString
    Scd2.init(early.unionByName(late), full)
    assert(histSet(inc) == histSet(full))
    // and the watermark advanced for batch users only
    val last = spark.read.parquet(s"$inc/last")
      .select(col("user_id"), col("last_ts").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(last(7L).startsWith("2024-01-02 01"))
    assert(last(9L).startsWith("2024-01-01 00"))
    assert(last(10L).startsWith("2024-01-02 00"))
  }

  test("stale events at or before the (ts, event_id) watermark are dropped") {
    val early = evDf(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "a"),
      (2L, "2024-01-01 02:00:00", 7L, "b")))
    val stale = evDf(Seq(
      (3L, "2024-01-01 01:00:00", 7L, "c"),   // between collapsed history
      (2L, "2024-01-01 02:00:00", 7L, "c")))  // exact (ts, eid) replay
    val dir = java.nio.file.Files.createTempDirectory("scd2s").toString
    Scd2.init(early, dir)
    val before = histSet(dir)
    Scd2.merge(spark, dir, stale)
    assert(histSet(dir) == before,
      "stale events changed collapsed history")
  }

  test("boundary-timestamp event with a fresh event_id folds like a rebuild") {
    // the watermark is a (ts, event_id) TUPLE: an event at exactly the
    // last processed ts but with a NEW event_id is safely orderable by
    // the fold's own (ts, event_id) sort key — merge must include it
    // exactly as a full rebuild over the concatenated log would
    val early = evDf(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "a"),
      (2L, "2024-01-01 02:00:00", 7L, "b")))
    val boundary = evDf(Seq(
      (4L, "2024-01-01 02:00:00", 7L, "c")))  // same ts as watermark, new id
    val inc = java.nio.file.Files.createTempDirectory("scd2b").toString
    Scd2.init(early, inc)
    Scd2.merge(spark, inc, boundary)
    val full = java.nio.file.Files.createTempDirectory("scd2bf").toString
    Scd2.init(early.unionByName(boundary), full)
    assert(histSet(inc) == histSet(full),
      "boundary-ts event with a fresh event_id diverged from the rebuild")
  }

  test("torn-write replay: merge is idempotent when last lags history") {
    // crash model: merge wrote history but died before advancing `last`.
    // A replayed merge of the same batch must leave history unchanged —
    // the effective watermark includes the current row's valid_from, so
    // the already-collapsed events cannot fold back in as duplicates.
    val early = evDf(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "a")))
    val batch = evDf(Seq(
      (2L, "2024-01-02 00:00:00", 7L, "b"),
      (3L, "2024-01-02 01:00:00", 7L, "b")))  // trailing no-change event
    val dir = java.nio.file.Files.createTempDirectory("scd2t").toString
    Scd2.init(early, dir)
    val lastBefore = spark.read.parquet(s"$dir/last").collect().toSeq
    Scd2.merge(spark, dir, batch)
    val after = histSet(dir)
    // simulate the torn state: roll `last` back to its pre-merge value
    // (keeping the table's bucketed layout)
    val lastDf = spark.createDataFrame(
      spark.sparkContext.parallelize(lastBefore),
      spark.read.parquet(s"$dir/last").schema).localCheckpoint()
    lastDf.write.mode("overwrite").partitionBy("ubucket")
      .parquet(s"$dir/last")
    Scd2.merge(spark, dir, batch)
    assert(histSet(dir) == after,
      "replay against a lagging watermark corrupted history")
  }

  test("torn replay of a same-timestamp state flip stays idempotent") {
    // two distinct-state events share one timestamp; the second wins the
    // (ts, event_id) order. In the crash-torn state (last lags history)
    // the merge cannot know which same-ts event_ids were already folded,
    // so the gate closes at (valid_from, +inf) — the replayed flip must
    // NOT re-fold as a spurious extra version
    val early = evDf(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "a")))
    val batch = evDf(Seq(
      (2L, "2024-01-02 00:00:00", 7L, "b"),
      (4L, "2024-01-02 00:00:00", 7L, "c")))  // same ts, later id: b -> c
    val dir = java.nio.file.Files.createTempDirectory("scd2tf").toString
    Scd2.init(early, dir)
    val lastBefore = spark.read.parquet(s"$dir/last").collect().toSeq
    Scd2.merge(spark, dir, batch)
    val after = histSet(dir)
    assert(after.exists(_.contains("c")))     // the flip landed
    val lastDf = spark.createDataFrame(
      spark.sparkContext.parallelize(lastBefore),
      spark.read.parquet(s"$dir/last").schema).localCheckpoint()
    lastDf.write.mode("overwrite").partitionBy("ubucket")
      .parquet(s"$dir/last")
    Scd2.merge(spark, dir, batch)
    assert(histSet(dir) == after,
      "torn replay of a same-ts state flip grew history")
  }

  test("merge rewrites only touched buckets; bucket-count mismatch fails loudly") {
    // many users spread across buckets; a single-user batch must leave
    // the files of every other bucket byte-untouched on disk (the
    // clusterMaintSink partial-rewrite contract, here for SCD2)
    val early = evDf((0 until 64).map { u =>
      (u.toLong, f"2024-01-01 00:${u % 60}%02d:00", u.toLong, "a")
    })
    val batch = evDf(Seq((100L, "2024-01-02 00:00:00", 3L, "b")))
    val dir = java.nio.file.Files.createTempDirectory("scd2pb").toString
    Scd2.init(early, dir)
    def fileState(sub: String) = {
      val root = new java.io.File(s"$dir/$sub")
      root.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("ubucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified())).toMap
    }
    val histBefore = fileState("history")
    val lastBefore = fileState("last")
    assert(histBefore.size > 4, "expected a multi-bucket layout")
    Scd2.merge(spark, dir, batch)
    // content: merge == rebuild, as ever
    val full = java.nio.file.Files.createTempDirectory("scd2pbf").toString
    Scd2.init(early.unionByName(batch), full)
    assert(histSet(dir) == histSet(full))
    // layout: only the batch user's bucket was rewritten
    val histAfter = fileState("history")
    def untouched(b: Map[String, Long], a: Map[String, Long]) =
      b.keySet.intersect(a.keySet).count(p => b(p) == a(p))
    assert(untouched(histBefore, histAfter) >= histBefore.size - 2,
      "merge rewrote buckets its batch never touched")
    assert(untouched(lastBefore, fileState("last")) >= lastBefore.size - 2,
      "merge rewrote watermark buckets its batch never touched")
    // nBuckets is part of the layout: mismatches must fail before writing
    val e = intercept[IllegalArgumentException] {
      Scd2.merge(spark, dir, batch, nBuckets = 16)
    }
    assert(e.getMessage.contains("nBuckets"))
  }

  test("merge writes self-compact: one file per touched bucket, always") {
    // dynamic partition overwrite REPLACES a touched bucket's files and
    // the bucket-routed write lands exactly one file there — repeated
    // merges can never accumulate per-bucket files, so SCD2 needs no
    // LSM-style compaction pass (unlike the append-only indexes)
    def ev(rows: Seq[(Long, String, Long, String)]) = evDf(rows)
    val dir = java.nio.file.Files.createTempDirectory("scd2sc").toString
    Scd2.init(ev((0 until 40).map { i =>
      (i.toLong, f"2024-01-01 00:$i%02d:00", (i % 8).toLong, "a")
    }), dir, nBuckets = 4)
    (1 to 3).foreach { m =>
      Scd2.merge(spark, dir, ev((0 until 8).map { i =>
        ((100 * m + i).toLong, f"2024-01-0${m + 1} 00:0$i:00",
          (i % 8).toLong, if (m % 2 == 0) "a" else "b")
      }), nBuckets = 4)
    }
    def files(sub: String) = new java.io.File(s"$dir/$sub").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ubucket="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).toSeq
    assert(files("history").nonEmpty &&
      files("history").forall(_ == 1), s"history: ${files("history")}")
    assert(files("last").forall(_ == 1), s"last: ${files("last")}")
    // and the content still equals the full rebuild over everything
    val full = java.nio.file.Files.createTempDirectory("scd2scf").toString
    Scd2.init(ev((0 until 40).map { i =>
      (i.toLong, f"2024-01-01 00:$i%02d:00", (i % 8).toLong, "a")
    } ++ (1 to 3).flatMap { m => (0 until 8).map { i =>
      ((100 * m + i).toLong, f"2024-01-0${m + 1} 00:0$i:00",
        (i % 8).toLong, if (m % 2 == 0) "a" else "b")
    }}), full)
    assert(histSet(dir) == histSet(full))
  }

  test("randomized: 3 sequential merges == one full rebuild") {
    val rnd = new scala.util.Random(19)
    val all = (0 until 400).map { i =>
      (i.toLong, f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00",
        rnd.nextInt(12).toLong, Seq("a", "b", "c")(rnd.nextInt(3)))
    }
    // time-ordered batches (the append-only contract)
    val Seq(b1, b2, b3) = Seq(all.slice(0, 200), all.slice(200, 300),
      all.slice(300, 400)).map(evDf)
    val inc = java.nio.file.Files.createTempDirectory("scd2r").toString
    Scd2.init(b1, inc)
    Scd2.merge(spark, inc, b2)
    Scd2.merge(spark, inc, b3)
    val full = java.nio.file.Files.createTempDirectory("scd2rf").toString
    Scd2.init(evDf(all), full)
    assert(histSet(inc) == histSet(full))
  }

  test("changesBetween: merge delta is exactly the closes + inserts") {
    val early = evDf(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "a"),
      (2L, "2024-01-01 00:00:00", 8L, "x"),
      (3L, "2024-01-01 00:00:00", 9L, "p")))
    val late = evDf(Seq(
      (4L, "2024-01-02 00:00:00", 7L, "b"),   // close v1, insert v2
      (5L, "2024-01-02 00:00:00", 8L, "x"),   // no-change event: no delta
      (6L, "2024-01-02 00:00:00", 10L, "n"))) // brand-new user: insert v1
    val before = Scd2.build(early)
    val after = Scd2.build(early.unionByName(late))
    val out = Scd2.changesBetween(before, after)
      .select(col("user_id"), col("version"), col("change_type"))
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set(
      (7L, 1, "close"), (7L, 2, "insert"), (10L, 1, "insert")))
    // user 8 (no state change) and user 9 (untouched) emit nothing
    // ... and the PERSISTED merge produces the identical delta: diff of
    // the on-disk table before/after merge == diff of the two rebuilds
    val dir = java.nio.file.Files.createTempDirectory("scd2cd").toString
    Scd2.init(early, dir)
    val histBefore = spark.read.parquet(s"$dir/history").drop("ubucket")
      .localCheckpoint()
    Scd2.merge(spark, dir, late)
    val persisted = Scd2.changesBetween(histBefore,
      spark.read.parquet(s"$dir/history").drop("ubucket"))
      .select(col("user_id"), col("version"), col("change_type"))
      .as[(Long, Int, String)].collect().toSet
    assert(persisted == out)
  }

  test("merge outbox == changesBetween(pre, post); feed replays into history") {
    val rnd = new scala.util.Random(31)
    val all = (0 until 300).map { i =>
      (i.toLong, f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00",
        rnd.nextInt(10).toLong, Seq("a", "b", "c")(rnd.nextInt(3)))
    }
    val batches = Seq(all.slice(0, 150), all.slice(150, 220),
      all.slice(220, 300)).map(evDf)
    val dir = java.nio.file.Files.createTempDirectory("scd2ob").toString
    val feed = java.nio.file.Files.createTempDirectory("scd2obf").toString
    def hist() = spark.read.parquet(s"$dir/history").drop("ubucket")
      .localCheckpoint()
    Scd2.init(batches(0), dir, changesTo = Some(s"$feed/batch=0"))
    val deltaCols = Seq("user_id", "version", "change_type", "state",
      "valid_from", "valid_to").map(col)
    def deltaSet(df: org.apache.spark.sql.DataFrame) =
      df.select(deltaCols: _*).collect().map(_.toString).toSet
    // bootstrap batch: the whole built history as inserts
    assert(deltaSet(spark.read.parquet(s"$feed/batch=0")) ==
      deltaSet(hist().withColumn("change_type", lit("insert"))))
    // each merge's outbox equals the generic diff of its pre/post tables
    (1 to 2).foreach { i =>
      val pre = hist()
      Scd2.merge(spark, dir, batches(i),
        changesTo = Some(s"$feed/batch=$i"))
      assert(deltaSet(spark.read.parquet(s"$feed/batch=$i")) ==
        deltaSet(Scd2.changesBetween(pre, hist())),
        s"batch $i outbox != changesBetween")
    }
    // the feed alone reconstructs the final history: last write per
    // (user_id, version) across batches, in batch order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("version"))
      .orderBy(col("_b").desc)
    val rebuilt = (0 to 2).map(i =>
        spark.read.parquet(s"$feed/batch=$i").withColumn("_b", lit(i)))
      .reduce(_ unionByName _)
      .withColumn("_r", row_number().over(w)).filter(col("_r") === 1)
      .select(col("user_id"), col("state"), col("valid_from"),
        col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("state"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("version"), col("is_current"))
        .collect().map(_.toString).toSet
    assert(asSet(rebuilt) == histSet(dir),
      "replaying the change feed did not reconstruct the history")
    // replay of a committed batch must not clobber its feed dir: the
    // stale gate makes the recomputed delta empty, but the _SUCCESS
    // guard leaves the landed one alone
    Scd2.merge(spark, dir, batches(2),
      changesTo = Some(s"$feed/batch=2"))
    assert(spark.read.parquet(s"$feed/batch=2").count() > 0,
      "replay overwrote a committed outbox batch with an empty delta")
  }

  test("changesBetween: manual edits surface as update/delete") {
    val base = Scd2.build(evDf(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "a"),
      (2L, "2024-01-02 00:00:00", 7L, "b"),
      (3L, "2024-01-01 00:00:00", 8L, "x"))))
    // doctor the AFTER side: user 7's v1 state rewritten (update), user
    // 8's v1 gone entirely (delete)
    val doctored = base.filter(col("user_id") =!= 8L)
      .withColumn("state",
        when(col("user_id") === 7L && col("version") === 1, lit("z"))
          .otherwise(col("state")))
    val out = Scd2.changesBetween(base, doctored)
      .select(col("user_id"), col("version"), col("change_type"))
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set((7L, 1, "update"), (8L, 1, "delete")))
  }

  test("historyFor: every requested user's rows, only touched buckets read") {
    // 40 users spread across 8 buckets; ask for 2 users — the read must
    // return their complete history while opening a strict subset of the
    // bucket directories (the merge's O(touched) contract, applied to
    // reads)
    val ev = evDf((0 until 80).map { i =>
      (i.toLong, f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00",
        (i % 40).toLong, Seq("a", "b", "c")(i % 3))
    })
    val dir = java.nio.file.Files.createTempDirectory("scd2hf").toString
    Scd2.init(ev, dir, nBuckets = 8)
    val want = Seq(3L, 17L)
    val users = want.toDF("user_id")
    // keep the scan plan live: input_file_name() below must see the
    // parquet files, which a localCheckpoint would erase
    val out = Scd2.historyFor(spark, dir, users)
    val full = spark.read.parquet(s"$dir/history")
    def rowSet(df: org.apache.spark.sql.DataFrame, uids: Seq[Long]) =
      df.filter(col("user_id").isin(uids: _*))
        .select(col("user_id"), col("state"),
          col("valid_from").cast("string"),
          col("valid_to").cast("string"), col("version"),
          col("is_current"))
        .collect().map(_.toString).toSet
    // containment: the requested users' rows are all there, exactly
    assert(rowSet(out, want) == rowSet(full.drop("ubucket"), want))
    assert(rowSet(out, want).nonEmpty)
    // pruning: every file the pruned read touches lives in a bucket one
    // of the requested users hashes into — and that's a strict subset
    val touched = users
      .select(pmod(xxhash64(col("user_id")), lit(8L)).as("b"))
      .distinct().as[Long].collect().toSet
    assert(touched.size < 8)
    val filesRead = out.select(input_file_name()).distinct()
      .as[String].collect()
    assert(filesRead.nonEmpty)
    filesRead.foreach { f =>
      val b = "ubucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toLong)
      assert(b.exists(touched.contains),
        s"pruned read opened a file outside the touched buckets: $f")
    }
    // every returned row belongs to a touched bucket (no spurious dirs),
    // and rows of co-bucketed OTHER users pass through — historyFor is a
    // directory-level prune, not a per-user filter (the caller's join
    // ignores the extras; re-filtering would re-scan what pruning saved)
    val outBuckets = out
      .select(pmod(xxhash64(col("user_id")), lit(8L)).as("b"))
      .distinct().as[Long].collect().toSet
    assert(outBuckets.subsetOf(touched))
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

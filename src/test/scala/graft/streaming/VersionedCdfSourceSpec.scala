package graft.streaming

import graft.TestSpark
import graft.sources.Versioned
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The versioned table as a streaming source: every commit is one
  * micro-batch, offsets are table versions, change rows match the batch
  * CDF exactly (with per-commit attribution), and offset deserialization
  * round-trips.
  */
class VersionedCdfSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("streams history + live commits; rows match batch CDF per version") {
    val dir = java.nio.file.Files.createTempDirectory("cdfsrc").toString + "/t"
    val evens = ev.filter(col("event_id") % 2 === 0)
    Versioned.append(evens, dir) // v1 (pre-stream history)
    val name = "cdfstream_" + java.util.UUID.randomUUID.toString.take(8)
    val q = spark.readStream.format("versioned-cdf")
      .option("path", dir).option("startingVersion", "0").load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val afterV1 = spark.table(name)
      assert(afterV1.count() == evens.count())
      assert(afterV1.filter(col("_change_type") =!= "insert").count() == 0)
      assert(afterV1.filter(col("_commit_version") =!= 1L).count() == 0)
      // live commits while the stream runs: append + a COW upsert
      Versioned.append(ev.filter(col("event_id") % 2 === 1), dir) // v2
      Versioned.upsert(ev.filter(col("event_id") % 100 === 0)
        .withColumn("value", col("value") + 1000)
        .withColumn("event_type", lit("patched")), dir, "event_id") // v3
      q.processAllAvailable()
      val got = spark.table(name)
      // per-version rows equal the batch CDF of that version
      Seq(2, 3).foreach { v =>
        val want = Versioned.changesBetween(spark, dir, v - 1, v)
        val gotV = got.filter(col("_commit_version") === v.toLong)
          .drop("_commit_version")
        assert(gotV.exceptAll(want).isEmpty && want.exceptAll(gotV).isEmpty,
          s"v$v stream != batch CDF")
      }
      // the upsert batch carries delete+insert pairs
      assert(got.filter(col("_commit_version") === 3L &&
        col("_change_type") === "delete").count() ==
        ev.filter(col("event_id") % 100 === 0).count())
    } finally q.stop()
  }

  test("replicateSink: the replica converges to the source through " +
    "churn, including cross-commit delete-then-reinsert") {
    val src = java.nio.file.Files.createTempDirectory("repl").toString + "/t"
    val rep = java.nio.file.Files.createTempDirectory("repl").toString + "/r"
    Versioned.append(ev.filter(col("event_id") % 2 === 0), src) // v1
    val stream = spark.readStream.format("versioned-cdf")
      .option("path", src).option("startingVersion", "0").load()
    val q = EventsStream.replicateSink(stream, rep, "event_id").start()
    def sync(): Unit = q.processAllAvailable()
    try {
      sync()
      // churn: append, update (COW), MOR delete, then RE-INSERT one of
      // the deleted keys in a LATER commit — the net-out rule must keep
      // the reinsert when both commits land in one catch-up batch
      Versioned.append(ev.filter(col("event_id") % 2 === 1), src) // v2
      Versioned.upsert(ev.filter(col("event_id") % 100 === 0)
        .withColumn("event_type", lit("patched")), src, "event_id") // v3
      val delKeys = ev.filter(col("event_id") % 10 === 3)
        .select(col("event_id"))
      Versioned.deleteByKeyMor(delKeys, src, "event_id") // v4
      val reborn = ev.filter(col("event_id") % 10 === 3).limit(1)
        .withColumn("event_type", lit("reborn"))
      Versioned.append(reborn, src) // v5
      sync()
      val want = Versioned.read(spark, src)
      val got = Versioned.read(spark, rep)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "replica diverged from source")
      assert(got.filter(col("event_type") === "reborn").count() == 1)
      // redelivered batch no-ops (merge-on-read txn marker)
      val repV = Versioned.currentVersion(rep)
      EventsStream.processReplicateBatch(
        new VersionedCdfSource(spark.sqlContext, src, 0).batchFrame(0, 5),
        0L, rep, "event_id")
      assert(Versioned.currentVersion(rep) == repV)
    } finally q.stop()
  }

  test("offsets: serialized offsets parse; catch-up batch spans commits " +
    "with exact attribution") {
    val dir = java.nio.file.Files.createTempDirectory("cdfsrc2").toString + "/t"
    Versioned.append(ev.filter(col("event_id") % 3 === 0), dir) // v1
    Versioned.append(ev.filter(col("event_id") % 3 === 1), dir) // v2
    Versioned.append(ev.filter(col("event_id") % 3 === 2), dir) // v3
    val src = new VersionedCdfSource(spark.sqlContext, dir, starting = 0)
    import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
    assert(src.getOffset.contains(LongOffset(3L)))
    // one batch spanning v2..v3 from a checkpoint-deserialized offset:
    // the streaming wrapper reports isStreaming, the underlying frame
    // carries exact per-commit attribution
    assert(src.getBatch(Some(SerializedOffset("1")), LongOffset(3L))
      .isStreaming)
    val batch = src.batchFrame(1, 3)
    val byV = batch.groupBy(col("_commit_version")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV.keySet == Set(2L, 3L))
    assert(byV(2L) == ev.filter(col("event_id") % 3 === 1).count())
    assert(byV(3L) == ev.filter(col("event_id") % 3 === 2).count())
    // default start = current version: a fresh source sees no backlog
    val live = new VersionedCdfSource(spark.sqlContext, dir,
      starting = Versioned.currentVersion(dir))
    assert(live.getOffset.isEmpty)
    // a replayed no-op span yields an empty frame, never a crash
    assert(src.batchFrame(3, 3).isEmpty)
  }

  test("checkpointed init: restart reuses the persisted base version " +
    "and schema; downtime commits are delivered") {
    val dir = java.nio.file.Files.createTempDirectory("cdfsrc3").toString + "/t"
    val meta = java.nio.file.Files.createTempDirectory("cdfmeta").toString
    Versioned.append(ev.filter(col("event_id") % 2 === 0), dir) // v1
    val provider = new VersionedCdfProvider
    val params = Map("path" -> dir)
    val s1 = provider.createSource(spark.sqlContext, meta, None,
      "versioned-cdf", params).asInstanceOf[VersionedCdfSource]
    // default base pinned at v1; no backlog yet
    assert(s1.getOffset.isEmpty)
    // "downtime": the stream is gone, commits land
    Versioned.append(ev.filter(col("event_id") % 2 === 1), dir) // v2
    // restart: the base must come from the CHECKPOINT, not re-pin to
    // the new head (which would withhold v2 forever)
    val s2 = provider.createSource(spark.sqlContext, meta, None,
      "versioned-cdf", params).asInstanceOf[VersionedCdfSource]
    assert(s2.getOffset.contains(
      org.apache.spark.sql.execution.streaming.runtime.LongOffset(2L)))
    assert(s2.batchFrame(1, 2).count() ==
      ev.filter(col("event_id") % 2 === 1).count())
    // an explicit startingVersion on restart is ignored in favor of the
    // checkpointed base (the engine's offsets reference it)
    val s3 = provider.createSource(spark.sqlContext, meta, None,
      "versioned-cdf", params + ("startingVersion" -> "0"))
      .asInstanceOf[VersionedCdfSource]
    assert(s3.getOffset.contains(
      org.apache.spark.sql.execution.streaming.runtime.LongOffset(2L)))
    // a table with a reserved column rejects up front
    val bad = java.nio.file.Files.createTempDirectory("cdfbad").toString + "/t"
    Versioned.append(ev.limit(5)
      .withColumn("_change_type", lit("x")), bad)
    intercept[IllegalArgumentException](
      VersionedCdfSource.cdfSchema(spark.sqlContext, bad))
  }

  test("replicateSink skips row-less source commits (no delete-file " +
    "debris on the replica)") {
    val src = java.nio.file.Files.createTempDirectory("replc").toString + "/t"
    val rep = java.nio.file.Files.createTempDirectory("replc").toString + "/r"
    Versioned.append(ev.limit(100).repartition(4), src) // v1
    EventsStream.processReplicateBatch(
      new VersionedCdfSource(spark.sqlContext, src, 0).batchFrame(0, 1),
      0L, rep, "event_id")
    val v = Versioned.currentVersion(rep)
    val pending = Versioned.pendingDeleteKeys(spark, rep)
    // a content-neutral source commit (compact) yields an EMPTY batch
    Versioned.compact(spark, src, numFiles = 1) // v2
    EventsStream.processReplicateBatch(
      new VersionedCdfSource(spark.sqlContext, src, 0).batchFrame(1, 2),
      1L, rep, "event_id")
    assert(Versioned.currentVersion(rep) == v, "empty batch minted debris")
    assert(Versioned.pendingDeleteKeys(spark, rep) == pending)
    val got = Versioned.read(spark, rep)
    val want = Versioned.read(spark, src)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("option(\"table\", cat.ns.t) resolves a CATALOG table through its " +
      "warehouse conf — CDF streaming of SQL-managed tables, no paths") {
    val wh = java.nio.file.Files.createTempDirectory("cdfcat").toString
    spark.conf.set("spark.sql.catalog.gcdf",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcdf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcdf.ns")
    spark.sql("CREATE TABLE gcdf.ns.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gcdf.ns.t VALUES (1, 'x'), (2, 'y')")
    val name = "cdfcat_" + java.util.UUID.randomUUID.toString.take(8)
    val q = spark.readStream.format("versioned-cdf")
      .option("table", "gcdf.ns.t").option("startingVersion", "0").load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      spark.sql("DELETE FROM gcdf.ns.t WHERE id = 1") // a change commit
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == Seq((1L, "delete"), (1L, "insert"),
      (2L, "insert")), s"got ${got.toSeq}")
    // a bad reference names the problem
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("versioned-cdf")
        .option("table", "nocat.ns.t").load()
    }
    assert(e.getMessage.contains("no spark.sql.catalog.nocat.warehouse"))
  }
}

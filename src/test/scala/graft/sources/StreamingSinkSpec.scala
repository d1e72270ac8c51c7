package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `df.writeStream.toTable("cat.ns.t")` — the streaming SINK half of the
  * catalog table ([[GraftStreamingWrite]]): executor task files adopted
  * as exactly-once epoch commits; redelivered epochs no-op on the txn
  * marker; empty epochs mint no version; Complete mode rejects.
  */
class StreamingSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  private def newCatalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    wh
  }

  test("writeStream.toTable lands exactly-once epoch commits readable by " +
      "both SQL and the commit API") {
    val wh = newCatalog("ssk1")
    spark.sql("CREATE TABLE ssk1.ns.t (event_id BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE)")
    val in = java.nio.file.Files.createTempDirectory("ssk1in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssk1ck").toString
    ev.write.mode("overwrite").parquet(in)
    val q = spark.readStream.schema(ev.schema).parquet(in)
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("ssk1.ns.t")
    try q.processAllAvailable() finally q.stop()

    val got = spark.sql("SELECT * FROM ssk1.ns.t")
    assert(got.exceptAll(ev).isEmpty && ev.exceptAll(got).isEmpty)
    // the API face reads the same snapshot; the epoch id is a txn marker
    val dir = s"$wh/ns/t"
    assert(Versioned.read(spark, dir).count() == ev.count())

    // RESTART with the same checkpoint: nothing re-delivers, content
    // stays single-counted
    val v = Versioned.currentVersion(dir)
    val q2 = spark.readStream.schema(ev.schema).parquet(in)
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("ssk1.ns.t")
    try q2.processAllAvailable() finally q2.stop()
    assert(Versioned.currentVersion(dir) == v)
    assert(spark.sql("SELECT COUNT(*) AS c FROM ssk1.ns.t")
      .head().getLong(0) == ev.count())
  }

  /** Stage `n` rows of `ev` as one epoch's committed task files under
    * `w`'s uid and return the commit messages.
    */
  private def stageEpoch(w: GraftStreamingWrite, dir: String, epoch: Long,
      n: Int): Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
    val uidField = classOf[GraftStreamingWrite].getDeclaredField("uid")
    uidField.setAccessible(true)
    val uid = uidField.get(w).asInstanceOf[String]
    val staging = Versioned.streamStagingDir(dir, uid, epoch)
    ev.limit(n).coalesce(1).write.mode("overwrite").parquet(staging + "_tmp")
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    fs.rename(new org.apache.hadoop.fs.Path(staging + "_tmp"),
      new org.apache.hadoop.fs.Path(staging))
    fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(f => RowLevelCommitMessage(Some(f.getPath.toString)):
        org.apache.spark.sql.connector.write.WriterCommitMessage)
  }

  test("a redelivered epoch no-ops on the QUERY-SCOPED txn marker; an " +
      "empty epoch mints no version; one marker per query survives") {
    val wh = newCatalog("ssk2")
    val dir = s"$wh/ns/t"
    Versioned.createEmpty(spark, dir, ev.schema)
    val w = new GraftStreamingWrite(dir, ev.schema, "query-A")
    w.commit(7L, stageEpoch(w, dir, 7L, 100))
    val v = Versioned.currentVersion(dir)
    assert(Versioned.read(spark, dir).count() == 100)
    // redelivery: same epoch id commits again -> no-op, staging reclaimed
    val msgs2 = stageEpoch(w, dir, 7L, 100)
    w.commit(7L, msgs2)
    assert(Versioned.currentVersion(dir) == v)
    assert(Versioned.read(spark, dir).count() == 100)
    // a LATER epoch commits and REPLACES the query's marker — the txn
    // list stays one-entry-per-writer, not one-per-trigger forever
    w.commit(9L, stageEpoch(w, dir, 9L, 50))
    assert(Versioned.read(spark, dir).count() == 150)
    val hist = Versioned.history(spark, dir)
    val nTxns = hist.orderBy(org.apache.spark.sql.functions
      .col("version").desc).select("n_txns").head().getInt(0)
    assert(nTxns == 1, s"expected ONE surviving marker, got $nTxns")
    // a redelivery of the OLDER epoch after the newer one still no-ops
    val vv = Versioned.currentVersion(dir)
    w.commit(7L, stageEpoch(w, dir, 7L, 100))
    assert(Versioned.currentVersion(dir) == vv)
    // empty epoch: no version
    w.commit(11L, Array(RowLevelCommitMessage(None)))
    assert(Versioned.currentVersion(dir) == vv)
  }

  test("a NEW query (fresh checkpoint) starting at epoch 0 against a " +
      "table carrying another query's markers does NOT lose data") {
    val wh = newCatalog("ssk4")
    val dir = s"$wh/ns/t"
    Versioned.createEmpty(spark, dir, ev.schema)
    val a = new GraftStreamingWrite(dir, ev.schema, "query-A")
    a.commit(0L, stageEpoch(a, dir, 0L, 100))
    a.commit(1L, stageEpoch(a, dir, 1L, 20))
    assert(Versioned.read(spark, dir).count() == 120)
    // a different query's epoch 0 must COMMIT, not silently no-op on
    // query-A's epoch-0 marker (the bare-epoch collision)
    val b = new GraftStreamingWrite(dir, ev.schema, "query-B")
    b.commit(0L, stageEpoch(b, dir, 0L, 30))
    assert(Versioned.read(spark, dir).count() == 150,
      "query-B's first epoch was silently dropped")
    // and speculative-attempt debris staged but NOT in the commit
    // messages is pruned before adoption
    val uidField = classOf[GraftStreamingWrite].getDeclaredField("uid")
    uidField.setAccessible(true)
    val uidB = uidField.get(b).asInstanceOf[String]
    val msgs = stageEpoch(b, dir, 2L, 40)
    val staging = Versioned.streamStagingDir(dir, uidB, 2L)
    ev.limit(5).coalesce(1).write.parquet(staging + "_junk")
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val junk = fs.listStatus(
      new org.apache.hadoop.fs.Path(staging + "_junk"))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(junk, new org.apache.hadoop.fs.Path(staging,
      "part-zombie-attempt.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(staging + "_junk"), true)
    b.commit(2L, msgs)
    assert(Versioned.read(spark, dir).count() == 190,
      "zombie task-attempt file must not be adopted")
  }

  test("Complete output mode rejects: versioned streaming is append-only") {
    newCatalog("ssk3")
    spark.sql("CREATE TABLE ssk3.ns.t (event_type STRING, c BIGINT)")
    val in = java.nio.file.Files.createTempDirectory("ssk3in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssk3ck").toString
    ev.write.mode("overwrite").parquet(in)
    val agg = spark.readStream.schema(ev.schema).parquet(in)
      .groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt).toTable("ssk3.ns.t")
    val e = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("append-only")),
      s"expected the append-only refusal, got: ${chain(e)}")
  }
}

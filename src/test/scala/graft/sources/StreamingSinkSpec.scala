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

  test("a redelivered epoch no-ops on the txn marker; an empty epoch " +
      "mints no version") {
    val wh = newCatalog("ssk2")
    val dir = s"$wh/ns/t"
    Versioned.createEmpty(spark, dir, ev.schema)
    val w = new GraftStreamingWrite(dir, ev.schema)
    // drive the write surface directly (the engine path is covered
    // above): one epoch's committed files, committed twice
    val uidField = classOf[GraftStreamingWrite].getDeclaredField("uid")
    uidField.setAccessible(true)
    val uid = uidField.get(w).asInstanceOf[String]
    val staging = Versioned.streamStagingDir(dir, uid, 7L)
    ev.limit(100).coalesce(1).write.parquet(staging + "_tmp")
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(staging + "_tmp"),
      new org.apache.hadoop.fs.Path(staging))
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      files.map(f => RowLevelCommitMessage(Some(f)))
    w.commit(7L, msgs)
    val v = Versioned.currentVersion(dir)
    assert(Versioned.read(spark, dir).count() == 100)
    // redelivery: same epoch id commits again -> no-op
    ev.limit(100).coalesce(1).write.parquet(staging + "_tmp")
    fs.rename(new org.apache.hadoop.fs.Path(staging + "_tmp"),
      new org.apache.hadoop.fs.Path(staging))
    val files2 = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    w.commit(7L, files2.map(f => RowLevelCommitMessage(Some(f)):
      org.apache.spark.sql.connector.write.WriterCommitMessage))
    assert(Versioned.currentVersion(dir) == v)
    assert(Versioned.read(spark, dir).count() == 100)
    // and the redelivered staging was reclaimed
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staging)))
    // empty epoch: no version
    w.commit(8L, Array(RowLevelCommitMessage(None)))
    assert(Versioned.currentVersion(dir) == v)
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

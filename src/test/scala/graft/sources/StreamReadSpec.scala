package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.readStream.table("cat.ns.t")` — the DSv2 micro-batch READ of a
  * catalog table ([[GraftMicroBatchStream]]): version-number offsets,
  * append commits stream as batches of plain rows, non-append commits
  * refuse unless skipChangeCommits (Delta's streaming-source contract).
  * Closes the write/read asymmetry: `writeStream.toTable` +
  * `readStream.table` now chain entirely inside the catalog.
  */
class StreamReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def catalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    wh
  }

  test("readStream.table replays append commits as batches and follows " +
      "new commits; pruning projects columns") {
    val wh = catalog("gsr1")
    spark.sql("CREATE TABLE gsr1.ns.t (id BIGINT, v DOUBLE, tag STRING)")
    spark.sql("INSERT INTO gsr1.ns.t VALUES (1, 1.0, 'a'), (2, 2.0, 'b')")
    spark.sql("INSERT INTO gsr1.ns.t VALUES (3, 3.0, 'c')")
    val q = spark.readStream
      .option("startingVersion", "0")
      .table("gsr1.ns.t")
      .select(col("id"), col("v"))
      .writeStream.format("memory").queryName("gsr1_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr1ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val got1 = spark.sql("SELECT id, v FROM gsr1_sink ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got1.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
      // a LIVE append streams through on the next trigger
      spark.sql("INSERT INTO gsr1.ns.t VALUES (4, 4.0, 'd')")
      q.processAllAvailable()
      val got2 = spark.sql("SELECT id, v FROM gsr1_sink ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got2.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0),
        (4L, 4.0)))
    } finally q.stop()
  }

  test("default start position streams only NEW commits") {
    val wh = catalog("gsr2")
    spark.sql("CREATE TABLE gsr2.ns.t (id BIGINT)")
    spark.sql("INSERT INTO gsr2.ns.t VALUES (1), (2)") // before start
    val q = spark.readStream.table("gsr2.ns.t")
      .writeStream.format("memory").queryName("gsr2_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr2ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM gsr2_sink").count() == 0)
      spark.sql("INSERT INTO gsr2.ns.t VALUES (3)")
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM gsr2_sink ORDER BY id")
        .collect().map(_.getLong(0))
      assert(got.toSeq == Seq(3L))
    } finally q.stop()
  }

  test("non-append commit refuses loudly; skipChangeCommits skips it " +
      "and keeps streaming later appends") {
    val wh = catalog("gsr3")
    spark.sql("CREATE TABLE gsr3.ns.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gsr3.ns.t VALUES (1, 1.0), (2, 2.0)")
    // a COW rewrite (UPDATE) removes files — not an append commit
    spark.sql("UPDATE gsr3.ns.t SET v = 9.0 WHERE id = 1")
    spark.sql("INSERT INTO gsr3.ns.t VALUES (3, 3.0)")

    val strict = spark.readStream.option("startingVersion", "0")
      .table("gsr3.ns.t")
      .writeStream.format("memory").queryName("gsr3_strict")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr3ck1").toString)
      .start()
    val err = intercept[Exception] {
      try strict.processAllAvailable() finally strict.stop()
    }
    def rootMessages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ rootMessages(t.getCause)
    assert(rootMessages(err).exists(_.contains("not an append commit")),
      s"unexpected error: $err")

    val skip = spark.readStream.option("startingVersion", "0")
      .option("skipChangeCommits", "true")
      .table("gsr3.ns.t")
      .writeStream.format("memory").queryName("gsr3_skip")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr3ck2").toString)
      .start()
    try {
      skip.processAllAvailable()
      val got = spark.sql("SELECT id FROM gsr3_skip ORDER BY id")
        .collect().map(_.getLong(0))
      // v2's appends (1, 2) and v4's append (3); v3's rewrite skipped
      assert(got.toSeq == Seq(1L, 2L, 3L), s"got ${got.toSeq}")
    } finally skip.stop()
  }

  test("admission control: maxVersionsPerTrigger / maxFilesPerTrigger " +
      "rate-limit the catch-up into multiple batches with progress") {
    val wh = catalog("gsr6")
    spark.sql("CREATE TABLE gsr6.ns.t (id BIGINT)")
    (1 to 6).foreach(i => spark.sql(s"INSERT INTO gsr6.ns.t VALUES ($i)"))
    // 6 append commits; one version per trigger -> 6 non-empty batches
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .table("gsr6.ns.t")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr6ck").toString)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => {
        val n = df.count()
        if (n > 0) batches.synchronized { batches += n }
        ()
      })
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.size == 6 && batches.forall(_ == 1L),
      s"expected 6 one-row batches, got $batches")

    // maxFilesPerTrigger (through Spark's ReadMaxFiles): 6 single-file
    // commits at 2 files per trigger -> 3 batches of 2 rows
    val batches2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "2")
      .table("gsr6.ns.t")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr6ck2").toString)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => {
        val n = df.count()
        if (n > 0) batches2.synchronized { batches2 += n }
        ()
      })
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(batches2.size == 3 && batches2.forall(_ == 2L),
      s"expected 3 two-row batches, got $batches2")
  }

  test("Trigger.AvailableNow drains the pinned backlog rate-limited and " +
      "stops") {
    val wh = catalog("gsr7")
    spark.sql("CREATE TABLE gsr7.ns.t (id BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO gsr7.ns.t VALUES ($i)"))
    val q = spark.readStream
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .table("gsr7.ns.t")
      .writeStream.format("memory").queryName("gsr7_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr7ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow run must terminate")
    val got = spark.sql("SELECT id FROM gsr7_sink ORDER BY id")
      .collect().map(_.getLong(0))
    assert(got.toSeq == (1L to 4L), s"got ${got.toSeq}")
  }

  test("replay of an EXPIRED version refuses with the live range, not " +
      "a raw manifest path error") {
    val wh = catalog("gsr8")
    spark.sql("CREATE TABLE gsr8.ns.t (id BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO gsr8.ns.t VALUES ($i)"))
    // CREATE minted v1, the inserts v2..v5; keep the last two
    Versioned.expire(spark, s"$wh/ns/t", keepLast = 2) // live: v4..v5
    val q = spark.readStream
      .option("startingVersion", "1").table("gsr8.ns.t")
      .writeStream.format("memory").queryName("gsr8_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr8ck").toString)
      .start()
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("expired by retention") &&
      m.contains("live versions: 4..5")), s"got ${chain(e)}")
  }

  test("writeStream.toTable chains into readStream.table — the full " +
      "in-catalog pipeline") {
    import spark.implicits._
    val wh = catalog("gsr4")
    spark.sql("CREATE TABLE gsr4.ns.src (id BIGINT)")
    spark.sql("CREATE TABLE gsr4.ns.dst (id BIGINT, doubled BIGINT)")
    // stage 2 first: tail src into dst with a transform
    val tail = spark.readStream.option("startingVersion", "0")
      .table("gsr4.ns.src")
      .withColumn("doubled", col("id") * 2)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsr4ck").toString)
      .toTable("gsr4.ns.dst")
    try {
      spark.sql("INSERT INTO gsr4.ns.src VALUES (1), (2), (3)")
      tail.processAllAvailable()
      val got = spark.sql("SELECT id, doubled FROM gsr4.ns.dst ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == Seq((1L, 2L), (2L, 4L), (3L, 6L)))
    } finally tail.stop()
  }

}

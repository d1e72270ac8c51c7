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

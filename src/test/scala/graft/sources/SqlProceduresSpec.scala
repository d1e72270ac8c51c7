package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance as SQL `CALL` procedures ([[GraftProcedures]] — Spark 4's
  * ProcedureCatalog seam, Iceberg's system-procedure convention): every
  * Versioned maintenance primitive runs without leaving SQL and returns
  * a one-row result the caller can assert on.
  */
class SqlProceduresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def catalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    wh
  }

  test("CALL compact materializes MOR masks and returns the version; " +
      "named and positional arguments both bind") {
    import spark.implicits._
    val wh = catalog("gpr1")
    val dir = s"$wh/ns/t"
    Versioned.append((0L to 9L).map(i => (i, 1.0)).toDF("id", "v"), dir)
    Versioned.deleteByKeyMor(Seq(3L).toDF("id"), dir, "id")
    assert(Versioned.pendingDeleteKeys(spark, dir) == 1)
    val v = spark.sql(
      "CALL gpr1.system.compact(table => 'ns.t', num_files => 2)")
      .collect().head.getInt(0)
    assert(v == Versioned.currentVersion(dir))
    assert(Versioned.pendingDeleteKeys(spark, dir) == 0)
    assert(spark.sql("SELECT COUNT(*) FROM gpr1.ns.t")
      .collect().head.getLong(0) == 9)
    // positional spelling
    spark.sql("CALL gpr1.system.compact('ns.t', 1)")
    assert(Versioned.read(spark, dir).inputFiles.length == 1)
  }

  test("CALL compact_small bin-packs; default arguments apply") {
    import spark.implicits._
    val wh = catalog("gpr2")
    val dir = s"$wh/ns/t"
    (1 to 4).foreach(i =>
      Versioned.append(Seq((i.toLong, "x")).toDF("id", "s")
        .coalesce(1), dir))
    val before = Versioned.listDataFiles(spark, dir).size
    assert(before == 4)
    spark.sql("CALL gpr2.system.compact_small(table => 'ns.t')")
    assert(Versioned.listDataFiles(spark, dir).size < before)
    assert(spark.sql("SELECT COUNT(*) FROM gpr2.ns.t")
      .collect().head.getLong(0) == 4)
  }

  test("CALL tag / publish / rollback / expire / vacuum round-trip") {
    import spark.implicits._
    val wh = catalog("gpr3")
    val dir = s"$wh/ns/t"
    Versioned.append(Seq((1L, "a")).toDF("id", "s"), dir) // v1
    Versioned.append(Seq((2L, "b")).toDF("id", "s"), dir) // v2
    val pinned = spark.sql(
      "CALL gpr3.system.tag(table => 'ns.t', name => 'rel1', " +
        "version => 1)").collect().head.getInt(0)
    assert(pinned == 1 && Versioned.tags(dir) == Map("rel1" -> 1))
    val pub = spark.sql("CALL gpr3.system.publish(table => 'ns.t')")
      .collect().head.getInt(0)
    assert(pub == 2 && Versioned.publishedVersion(dir).contains(2))
    val rb = spark.sql(
      "CALL gpr3.system.rollback(table => 'ns.t', to_version => 1)")
      .collect().head.getInt(0)
    assert(rb == 3) // rollback is a NEW commit carrying v1's content
    assert(spark.sql("SELECT s FROM gpr3.ns.t").collect()
      .map(_.getString(0)).toSeq == Seq("a"))
    // expire keeps the last N plus ref-pinned versions
    spark.sql("CALL gpr3.system.expire(table => 'ns.t', keep_last => 1)")
    // v1 survives (tag-pinned), v2 survives (published), head v3 kept
    assert(spark.sql("SELECT s FROM gpr3.ns.t VERSION AS OF 1").count() == 1)
    val vac = spark.sql("CALL gpr3.system.vacuum(table => 'ns.t', " +
      "grace_ms => 0)").collect().head.getInt(0)
    assert(vac >= 0)
    // drop_tag then expire again: v1 loses its pin
    spark.sql("CALL gpr3.system.drop_tag(table => 'ns.t', name => 'rel1')")
    assert(Versioned.tags(dir).isEmpty)
  }

  test("CALL maintain runs the policy loop and reports what ran; " +
      "unknown procedures reject with the available list") {
    import spark.implicits._
    val wh = catalog("gpr4")
    val dir = s"$wh/ns/t"
    Versioned.append((0L to 99L).map(i => (i, i.toDouble))
      .toDF("id", "v"), dir)
    Versioned.deleteByKeyMor((0L to 50L).toDF("id"), dir, "id")
    val m = spark.sql("CALL gpr4.system.maintain(table => 'ns.t', " +
      "max_pending_delete_keys => 10)").collect().head
    assert(m.getBoolean(0), "expected a compaction") // over the cap
    assert(spark.sql("SELECT COUNT(*) FROM gpr4.ns.t")
      .collect().head.getLong(0) == 49)
    val err = intercept[Exception] {
      spark.sql("CALL gpr4.system.nope(table => 'ns.t')")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    // Spark wraps the load failure (FAILED_TO_LOAD_ROUTINE); the cause
    // carries the available-procedure list
    assert(chain(err).exists(_.contains("available: compact")),
      s"expected the available list in the cause chain: ${chain(err)}")
  }

  test("CALL compact_where rewrites only the files the predicate " +
      "provably covers: one partition packs, the rest carry by identity") {
    import spark.implicits._
    val wh = catalog("gpr5")
    val dir = s"$wh/ns/t"
    spark.sql("CREATE TABLE gpr5.ns.t (id BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    // three commits into d1 (several small files), one into d2
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO gpr5.ns.t VALUES ($i, 'd1')"))
    spark.sql("INSERT INTO gpr5.ns.t VALUES (100, 'd2')")
    val before = Versioned.listDataFiles(spark, dir)
    val d1Before = before.filter(_.contains("__p_day=d1"))
    val d2Before = before.filterNot(_.contains("__p_day=d1")).toSet
    assert(d1Before.size >= 3)
    val v = spark.sql("CALL gpr5.system.compact_where(" +
      "table => 'ns.t', where => \"day = 'd1'\", target_files => 1)")
      .collect().head.getInt(0)
    assert(v == Versioned.currentVersion(dir))
    val after = Versioned.listDataFiles(spark, dir)
    val d1After = after.filter(_.contains("__p_day=d1"))
    assert(d1After.size == 1, s"d1 should pack to 1 file: $d1After")
    // out-of-scope files carry BY IDENTITY (byte-untouched)
    assert(after.filterNot(_.contains("__p_day=d1")).toSet == d2Before)
    // content is invisible to the compaction
    assert(spark.sql("SELECT id FROM gpr5.ns.t ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L, 100L))
    // time travel still reads the pre-compact snapshot
    assert(spark.sql(s"SELECT COUNT(*) FROM gpr5.ns.t VERSION AS OF ${v - 1}")
      .collect().head.getLong(0) == 4)
  }

  test("compact_where leaves straddling files alone and applies pending " +
      "MOR masks to the rows it rewrites") {
    import spark.implicits._
    val wh = catalog("gpr6")
    val dir = s"$wh/ns/t"
    // one flat file holds BOTH days -> must-match cannot prove it; two
    // more files are pure d1
    Versioned.append(Seq((1L, "d1"), (100L, "d2")).toDF("id", "day")
      .coalesce(1), dir)
    Versioned.append(Seq((2L, "d1")).toDF("id", "day"), dir)
    Versioned.append(Seq((3L, "d1")).toDF("id", "day"), dir)
    Versioned.deleteByKeyMor(Seq(2L).toDF("id"), dir, "id")
    val straddler = Versioned.listDataFiles(spark, dir).toSet
    Versioned.compactWhere(spark, dir,
      col("day") === "d1", targetFiles = 1)
    val after = Versioned.listDataFiles(spark, dir).toSet
    // exactly the two provable d1 files rewrote; the straddler carried
    assert(after.intersect(straddler).size == 1,
      s"expected only the straddling file to carry: " +
        s"kept ${after.intersect(straddler)}")
    // the pending delete applied to the rewrite and did not resurrect
    assert(spark.sql("SELECT id FROM gpr6.ns.t ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 3L, 100L))
  }
}

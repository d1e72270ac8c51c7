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
}

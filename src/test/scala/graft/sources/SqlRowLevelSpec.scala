package graft.sources

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `UPDATE` / `MERGE INTO` / arbitrary-predicate `DELETE FROM`
  * through [[GraftRowLevelOperation]] (SupportsRowLevelOperations,
  * group-based copy-on-write): statement semantics against DataFrame
  * replays, group pruning (untouched files carry BY IDENTITY — both the
  * static manifest-stats cut and the engine's runtime group filtering),
  * commit discipline (no-op statements mint no version, history stays
  * readable), and the refusal edges (pending MOR masks, time travel).
  */
class SqlRowLevelSpec extends AnyFunSuite {
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

  /** Fresh table under `cat` holding `ev` split into two files with
    * DISJOINT user_id ranges, 0-7 and 8-14 (sf0.001 user ids span
    * [0, 14]), so manifest stats can prune one file.
    * Returns (sqlName, dir).
    */
  private def mkTable(cat: String, wh: String): (String, String) = {
    val name = "t_" + java.util.UUID.randomUUID.toString.take(8)
    val dir = s"$wh/ns/$name"
    Versioned.append(ev.filter(col("user_id") < 8).coalesce(1), dir)
    Versioned.append(ev.filter(col("user_id") >= 8).coalesce(1), dir)
    (s"$cat.ns.$name", dir)
  }

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    val extra = got.exceptAll(want)
    val missing = want.exceptAll(got)
    assert(extra.isEmpty && missing.isEmpty,
      s"extra=${extra.take(3).mkString(";")} " +
        s"missing=${missing.take(3).mkString(";")}")
  }

  private def dataFiles(dir: String): Set[String] =
    Versioned.listDataFiles(spark, dir, None)
      .map(f => f.split("/data/").last).toSet

  test("UPDATE: row semantics exact, untouched file carries by identity, " +
      "pre-update snapshot stays readable") {
    val wh = newCatalog("rl1")
    val (t, dir) = mkTable("rl1", wh)
    val before = dataFiles(dir)
    val lowFile = before.find(_.startsWith("c=1")).get
    val highFile = before.find(_.startsWith("c=2")).get

    spark.sql(s"UPDATE $t SET value = value * 2.0, event_type = 'boost' " +
      "WHERE event_type = 'click' AND user_id < 4")

    val expect = ev.withColumn("__hit",
        col("event_type") === "click" && col("user_id") < 4)
      .withColumn("value", when(col("__hit"), col("value") * 2.0)
        .otherwise(col("value")))
      .withColumn("event_type", when(col("__hit"), lit("boost"))
        .otherwise(col("event_type")))
      .drop("__hit")
    assertSameRows(spark.sql(s"SELECT * FROM $t"), expect)

    // group pruning: user_id stats prove the >=8 file holds no match —
    // it must survive UNREWRITTEN (same physical file), while the low
    // file was replaced
    val after = dataFiles(dir)
    assert(after.contains(highFile),
      s"untouched file must carry by identity: $after")
    assert(!after.contains(lowFile), "affected file must be replaced")

    // pre-update snapshot intact (v2 = the second append)
    assertSameRows(spark.sql(s"SELECT * FROM $t VERSION AS OF 2"), ev)
  }

  test("UPDATE matching nothing mints no version; unconditional UPDATE " +
      "rewrites everything") {
    val wh = newCatalog("rl2")
    val (t, dir) = mkTable("rl2", wh)
    val v = Versioned.currentVersion(dir)
    spark.sql(s"UPDATE $t SET value = 0.0 WHERE user_id = 999999999")
    assert(Versioned.currentVersion(dir) == v,
      "a no-match update must not mint a snapshot")

    spark.sql(s"UPDATE $t SET value = value + 1.0")
    assertSameRows(spark.sql(s"SELECT * FROM $t"),
      ev.withColumn("value", col("value") + 1.0))
  }

  test("DELETE with an untranslatable predicate rewrites through the " +
      "row-level fallback; full-file deletes drop files with no " +
      "replacement") {
    val wh = newCatalog("rl3")
    val (t, dir) = mkTable("rl3", wh)
    // % has no V1 Filter form -> canDeleteWhere=false -> group rewrite
    spark.sql(s"DELETE FROM $t WHERE event_id % 3 = 0")
    assertSameRows(spark.sql(s"SELECT * FROM $t"),
      ev.filter(col("event_id") % 3 =!= 0))

    // delete EVERY row of one file (user_id < 8 is exactly file 1's
    // span, but spelled untranslatably so it stays on the rewrite path):
    // the group replacement writes zero rows for it -> the file drops
    // with no successor
    spark.sql(s"DELETE FROM $t WHERE CAST(user_id AS DOUBLE) < 8.0 " +
      "AND user_id % 1 = 0")
    assertSameRows(spark.sql(s"SELECT * FROM $t"),
      ev.filter(col("event_id") % 3 =!= 0 && col("user_id") >= 8))
  }

  test("MERGE INTO: conditional delete/update clauses + gated insert, " +
      "runtime group filtering carries the unmatched file") {
    val wh = newCatalog("rl4")
    val (t, dir) = mkTable("rl4", wh)
    val before = dataFiles(dir)
    val highFile = before.find(_.startsWith("c=2")).get

    // source touches ONLY user_id < 8 keys (file 1) + brand-new keys
    val src = ev.filter(col("user_id") < 8 && col("event_id") % 5 === 0)
      .select(col("event_id"), col("user_id"),
        lit("patched").as("event_type"),
        when(col("event_id") % 10 === 0, lit(-1.0)).otherwise(lit(50.0))
          .as("value"))
      .unionByName(ev.filter(col("event_id") % 97 === 0)
        .select((col("event_id") + 1000000000L).as("event_id"),
          col("user_id"), lit("fresh").as("event_type"),
          lit(7.0).as("value")))
    src.createOrReplaceTempView("rl4_src")

    spark.sql(s"MERGE INTO $t t USING rl4_src s ON t.event_id = s.event_id " +
      "WHEN MATCHED AND s.value < 0 THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET value = t.value + s.value, " +
      "event_type = s.event_type " +
      "WHEN NOT MATCHED THEN INSERT *")

    // DataFrame replay of the clause algebra
    val s2 = src.withColumnRenamed("event_type", "s_et")
      .withColumnRenamed("value", "s_v").withColumnRenamed("user_id", "s_u")
    val joined = ev.join(s2, Seq("event_id"), "left_outer")
    val kept = joined.filter(col("s_v").isNull || col("s_v") >= 0)
      .select(col("event_id"), col("user_id"),
        when(col("s_v").isNotNull, col("s_et")).otherwise(col("event_type"))
          .as("event_type"),
        when(col("s_v").isNotNull, col("value") + col("s_v"))
          .otherwise(col("value")).as("value"))
    val inserts = src.join(ev.select("event_id"), Seq("event_id"),
      "left_anti")
    assertSameRows(spark.sql(s"SELECT * FROM $t"),
      kept.unionByName(inserts))

    // the engine's runtime group filter must have kept the >=8 file:
    // no source key can match it (matches live in file 1 only)
    assert(dataFiles(dir).contains(highFile),
      "runtime group filtering must carry the unmatched file by identity")
  }

  test("MERGE cardinality violation (duplicate source keys) fails loudly " +
      "and leaves the table untouched") {
    val wh = newCatalog("rl5")
    val (t, dir) = mkTable("rl5", wh)
    val v = Versioned.currentVersion(dir)
    val dup = ev.limit(1).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"))
    dup.unionAll(dup).createOrReplaceTempView("rl5_dup")
    intercept[Exception] {
      spark.sql(s"MERGE INTO $t t USING rl5_dup s ON t.event_id = " +
        "s.event_id WHEN MATCHED THEN UPDATE SET value = s.value")
    }
    assert(Versioned.currentVersion(dir) == v)
    assertSameRows(spark.sql(s"SELECT * FROM $t"), ev)
  }

  test("row-level ops apply pending MOR delete masks IN-SCAN (no " +
      "compact needed); masked rows never resurrect") {
    val wh = newCatalog("rl6")
    val (t, dir) = mkTable("rl6", wh)
    Versioned.deleteByKeyMor(
      ev.filter(col("event_id") % 7 === 0).select("event_id"),
      dir, "event_id")
    // the UPDATE runs directly against the MOR-pending snapshot: the
    // group scan applies the masks (MaskingReaderFactory), the rewrite
    // retires them for the affected files
    spark.sql(s"UPDATE $t SET value = 0.0 WHERE event_id % 2 = 0")
    assertSameRows(spark.sql(s"SELECT * FROM $t"),
      ev.filter(col("event_id") % 7 =!= 0)
        .withColumn("value",
          when(col("event_id") % 2 === 0, 0.0).otherwise(col("value"))))
  }

  test("UPDATE against a time-travel read rejects; SELECT _file exposes " +
      "the metadata column through the plain scan") {
    val wh = newCatalog("rl7")
    val (t, dir) = mkTable("rl7", wh)
    intercept[Exception] {
      spark.sql(s"UPDATE $t VERSION AS OF 1 SET value = 0.0")
    }
    // _file: every row maps to a live manifest file (compared by suffix —
    // URI spelling differs between scan and manifest)
    val files = dataFiles(dir)
    val got = spark.sql(s"SELECT DISTINCT _file FROM $t").collect()
      .map(r => r.getString(0).split("/data/").last).toSet
    assert(got == files, s"got=$got want=$files")
    // on a masked snapshot attribution now WORKS through the V2
    // masking scan (per-file partitions keep row→file exact); rows of
    // masked keys simply vanish
    Versioned.deleteByKeyMor(
      ev.filter(col("event_id") % 11 === 0).select("event_id"),
      dir, "event_id")
    val gotMasked = spark.sql(s"SELECT DISTINCT _file FROM $t").collect()
      .map(r => r.getString(0).split("/data/").last).toSet
    assert(gotMasked == files, s"got=$gotMasked want=$files")
    assert(spark.sql(s"SELECT COUNT(*) FROM $t").collect().head.getLong(0)
      == ev.filter(col("event_id") % 11 =!= 0).count())
  }

  test("a concurrent append between basis and commit REBASES: both the " +
      "update and the appended rows survive") {
    val wh = newCatalog("rl8")
    val (t, dir) = mkTable("rl8", wh)
    val extra = spark.range(1).select(
      lit(2000000000L).as("event_id"), lit(1L).as("user_id"),
      lit("late").as("event_type"), lit(5.0).as("value"))
    Versioned.onBeforeCommit = () => { Versioned.append(extra, dir) }
    try {
      spark.sql(s"UPDATE $t SET value = -9.0 WHERE event_type = 'click'")
    } finally Versioned.onBeforeCommit = () => ()
    val want = ev.withColumn("value",
        when(col("event_type") === "click", -9.0).otherwise(col("value")))
      .unionByName(extra)
    assertSameRows(spark.sql(s"SELECT * FROM $t"), want)
  }

  test("UPDATE over an additively-evolved schema null-fills and rewrites " +
      "consistently") {
    val wh = newCatalog("rl9")
    val (t, dir) = mkTable("rl9", wh)
    // evolve: append a batch carrying a NEW column; old files null-fill
    Versioned.append(
      spark.range(1).select(lit(3000000000L).as("event_id"),
        lit(2L).as("user_id"), lit("new").as("event_type"),
        lit(1.0).as("value"), lit("x").as("tag")), dir)
    spark.sql(s"UPDATE $t SET tag = 'touched' WHERE user_id < 4")
    val got = spark.sql(s"SELECT * FROM $t")
    assert(got.columns.toSeq ==
      Seq("event_id", "user_id", "event_type", "value", "tag"))
    val want = ev.withColumn("tag", lit(null).cast("string"))
      .unionByName(spark.range(1).select(lit(3000000000L).as("event_id"),
        lit(2L).as("user_id"), lit("new").as("event_type"),
        lit(1.0).as("value"), lit("x").as("tag")))
      .withColumn("tag", when(col("user_id") < 4, "touched")
        .otherwise(col("tag")))
    assertSameRows(got, want)
  }
}

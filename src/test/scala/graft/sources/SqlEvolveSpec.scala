package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `ALTER TABLE DROP COLUMN / RENAME COLUMN` as pure-metadata commits
  * over the manifest's per-snapshot schemas ([[Versioned.dropColumns]]/
  * [[Versioned.renameColumn]]): reads of old snapshots keep the old
  * schemas; renamed columns coalesce over their name epochs
  * ([[Versioned.physicalScan]]) until [[Versioned.compact]]
  * materializes the mapping; mutation paths that cannot coalesce
  * refuse loudly.
  */
class SqlEvolveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def catalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    wh
  }

  test("RENAME COLUMN is pure metadata: reads coalesce name epochs, " +
      "time travel keeps old names, compact materializes") {
    import spark.implicits._
    val wh = catalog("gse1")
    val dir = s"$wh/ns/t"
    spark.sql("CREATE TABLE gse1.ns.t (id BIGINT, amount DOUBLE)")
    spark.sql("INSERT INTO gse1.ns.t VALUES (1, 10.0), (2, 20.0)") // v2
    val filesBefore = Versioned.listDataFiles(spark, dir).toSet
    spark.sql("ALTER TABLE gse1.ns.t RENAME COLUMN amount TO total") // v3
    // zero data I/O: the same physical files carry
    assert(Versioned.listDataFiles(spark, dir).toSet == filesBefore)
    // new epoch writes the NEW name physically
    spark.sql("INSERT INTO gse1.ns.t VALUES (3, 30.0)") // v4
    val got = spark.sql("SELECT id, total FROM gse1.ns.t ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)), s"got $got")
    // old snapshot keeps the OLD schema and name
    val old = spark.sql("SELECT * FROM gse1.ns.t VERSION AS OF 2")
    assert(old.schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(old.count() == 2)
    // filters on the renamed column work across epochs
    assert(spark.sql(
      "SELECT id FROM gse1.ns.t WHERE total > 15 ORDER BY id")
      .as[Long].collect().toSeq == Seq(2L, 3L))
    // compact materializes: mapping clears, planner pruning returns
    assert(Versioned.columnMapping(spark, dir).nonEmpty)
    Versioned.compact(spark, dir, 2)
    assert(Versioned.columnMapping(spark, dir).isEmpty)
    val after = spark.sql("SELECT id, total FROM gse1.ns.t ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(after == got)
    // and the physical files now carry the logical name
    assert(spark.read.parquet(Versioned.listDataFiles(spark, dir): _*)
      .schema.fieldNames.contains("total"))
  }

  test("DROP COLUMN is pure metadata; old snapshots still read it; " +
      "re-adding a recycled name refuses (old values would resurface)") {
    val wh = catalog("gse2")
    val dir = s"$wh/ns/t"
    spark.sql("CREATE TABLE gse2.ns.t (id BIGINT, junk STRING, v DOUBLE)")
    spark.sql("INSERT INTO gse2.ns.t VALUES (1, 'x', 1.0)") // v2
    val filesBefore = Versioned.listDataFiles(spark, dir).toSet
    spark.sql("ALTER TABLE gse2.ns.t DROP COLUMN junk") // v3
    assert(Versioned.listDataFiles(spark, dir).toSet == filesBefore)
    assert(spark.sql("SELECT * FROM gse2.ns.t").schema.fieldNames.toSeq ==
      Seq("id", "v"))
    // time travel: the column is still there before the drop
    val old = spark.sql("SELECT junk FROM gse2.ns.t VERSION AS OF 2")
      .collect().map(_.getString(0))
    assert(old.toSeq == Seq("x"))
    // re-ADDing the dropped name refuses: parquet reads by NAME, so the
    // old file's 'x' would resurface under the new column instead of
    // null-filling — a silent wrong answer. Fresh names are fine.
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE gse2.ns.t ADD COLUMNS (junk STRING)")
    }
    assert(err.getMessage.contains("re-add"), err.getMessage)
    spark.sql("ALTER TABLE gse2.ns.t ADD COLUMNS (junk2 STRING)")
    val re = spark.sql("SELECT id, junk2 FROM gse2.ns.t").collect()
    assert(re.length == 1 && re(0).isNullAt(1))
  }

  test("rename guards: recycled names refuse; partition columns refuse; " +
      "row-level ops and streams refuse while a mapping is pending") {
    import spark.implicits._
    val wh = catalog("gse3")
    val dir = s"$wh/ns/t"
    spark.sql("CREATE TABLE gse3.ns.t (id BIGINT, a DOUBLE, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gse3.ns.t VALUES (1, 1.0, 'd1')")
    // renaming TO a name any live snapshot used refuses (files could
    // carry a column by it — epoch coalesce would collide)
    spark.sql("ALTER TABLE gse3.ns.t RENAME COLUMN a TO b")
    intercept[Exception] {
      spark.sql("ALTER TABLE gse3.ns.t RENAME COLUMN b TO a")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gse3.ns.t RENAME COLUMN day TO d")
    }
    // row-level SQL refuses while the mapping is pending
    val err = intercept[Exception] {
      spark.sql("UPDATE gse3.ns.t SET b = 2.0 WHERE id = 1")
    }
    assert(err.getMessage.contains("compact"), err.getMessage)
    // MOR delete + upsert still work mapped (coalescing read paths)
    Versioned.deleteByKeyMor(Seq(99L).toDF("id"), dir, "id")
    Versioned.upsert(Seq((1L, 5.0, "d1")).toDF("id", "b", "day"), dir,
      "id")
    val got = spark.sql("SELECT id, b, day FROM gse3.ns.t ORDER BY id")
      .as[(Long, Double, String)].collect().toSeq
    assert(got == Seq((1L, 5.0, "d1")), s"got $got")
  }

  test("MOR equality deletes recorded BEFORE a rename still mask after " +
      "it (delete-file key columns remap through the rename history)") {
    import spark.implicits._
    val wh = catalog("gse4")
    val dir = s"$wh/ns/t"
    Versioned.append(Seq((1L, "x"), (2L, "y")).toDF("k", "s"), dir)
    Versioned.deleteByKeyMor(Seq(1L).toDF("k"), dir, "k") // keyed "k"
    spark.sql("ALTER TABLE gse4.ns.t RENAME COLUMN k TO key")
    val got = spark.sql("SELECT key, s FROM gse4.ns.t ORDER BY key")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "y")), s"masked row resurrected: $got")
  }

  test("ALTER COLUMN TYPE widening is pure metadata: old files promote " +
      "at read, post-widen rows exceed the narrow range, time travel " +
      "keeps the narrow type") {
    import spark.implicits._
    val wh = catalog("gse5")
    val dir = s"$wh/ns/t"
    spark.sql("CREATE TABLE gse5.ns.t (id INT, ratio FLOAT)")
    spark.sql("INSERT INTO gse5.ns.t VALUES (1, CAST(1.5 AS FLOAT)), " +
      "(2, CAST(2.5 AS FLOAT))") // v2
    val filesBefore = Versioned.listDataFiles(spark, dir).toSet
    spark.sql("ALTER TABLE gse5.ns.t ALTER COLUMN id TYPE BIGINT") // v3
    spark.sql("ALTER TABLE gse5.ns.t ALTER COLUMN ratio TYPE DOUBLE") // v4
    // zero data I/O: the same physical files carry
    assert(Versioned.listDataFiles(spark, dir).toSet == filesBefore)
    // a value the OLD type could not hold lands fine now
    spark.sql("INSERT INTO gse5.ns.t VALUES (3000000000, 3.5)") // v5
    val got = spark.sql("SELECT id, ratio FROM gse5.ns.t ORDER BY id")
    assert(got.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.schema("ratio").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(got.as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5), (2L, 2.5), (3000000000L, 3.5)))
    // old snapshot keeps the narrow types
    val old = spark.sql("SELECT * FROM gse5.ns.t VERSION AS OF 2")
    assert(old.schema("id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(old.schema("ratio").dataType ==
      org.apache.spark.sql.types.FloatType)
    // manifest-stats file skipping stays sound across the widen: the
    // pre-widen file's bounds still admit/prune correctly for the
    // widened column, and the pruned read returns exact rows
    assert(spark.sql("SELECT id FROM gse5.ns.t WHERE id > 2000000000")
      .as[Long].collect().toSeq == Seq(3000000000L))
    assert(spark.sql("SELECT id FROM gse5.ns.t WHERE id <= 2 ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
  }

  test("widen guards: narrowing, long->double, strings, and partition " +
      "columns refuse; decimal widens precision at the same scale only") {
    val wh = catalog("gse6")
    spark.sql("CREATE TABLE gse6.ns.t (id BIGINT, s STRING, " +
      "amt DECIMAL(5,2), day INT) PARTITIONED BY (day)")
    spark.sql("INSERT INTO gse6.ns.t VALUES " +
      "(1, 'x', CAST(12.34 AS DECIMAL(5,2)), 7)")
    def refuses(stmt: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(stmt))
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m => m != null && m.contains(frag)),
        s"expected '$frag' in ${chain(e)}")
    }
    // Spark's own analyzer pre-rejects non-upcasts (narrowing, string
    // retypes) before the catalog ever sees them
    refuses("ALTER TABLE gse6.ns.t ALTER COLUMN id TYPE INT",
      "NOT_SUPPORTED_CHANGE_COLUMN")
    refuses("ALTER TABLE gse6.ns.t ALTER COLUMN s TYPE BIGINT",
      "NOT_SUPPORTED_CHANGE_COLUMN")
    // …but long -> double IS a Spark upcast (lossy above 2^53) — the
    // connector's value-preserving guard is the one that refuses it
    refuses("ALTER TABLE gse6.ns.t ALTER COLUMN id TYPE DOUBLE",
      "cannot widen")
    refuses("ALTER TABLE gse6.ns.t ALTER COLUMN amt TYPE DECIMAL(10,4)",
      "cannot widen")
    // an in-matrix widen of a PARTITION column refuses at the connector
    refuses("ALTER TABLE gse6.ns.t ALTER COLUMN day TYPE BIGINT",
      "cannot widen partition column")
    // the in-matrix decimal widen commits and reads back exact
    spark.sql("ALTER TABLE gse6.ns.t ALTER COLUMN amt TYPE DECIMAL(20,2)")
    val got = spark.sql("SELECT amt FROM gse6.ns.t").collect()
      .map(_.getDecimal(0).toPlainString)
    assert(got.toSeq == Seq("12.34"), s"got ${got.toSeq}")
  }

  test("widening composes with MOR deletes and pending renames: a " +
      "pre-widen equality delete still masks; prior-name files promote") {
    import spark.implicits._
    val wh = catalog("gse7")
    val dir = s"$wh/ns/t"
    Versioned.append(Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "s"), dir)
    // equality delete keyed on the NARROW int column, then widen it
    Versioned.deleteByKeyMor(Seq(2).toDF("k"), dir, "k")
    spark.sql("ALTER TABLE gse7.ns.t ALTER COLUMN k TYPE BIGINT")
    val got = spark.sql("SELECT k, s FROM gse7.ns.t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "x"), (3L, "z")),
      s"pre-widen delete mask broke: $got")
    // rename AFTER the widen: files from the OLD name epoch (physical
    // column k at int32) promote through the coalescing read too — the
    // prior-name request carries the widened type
    spark.sql("ALTER TABLE gse7.ns.t RENAME COLUMN k TO key")
    spark.sql("INSERT INTO gse7.ns.t VALUES (4000000000, 'w')")
    val got2 = spark.sql("SELECT key, s FROM gse7.ns.t ORDER BY key")
      .as[(Long, String)].collect().toSeq
    assert(got2 == Seq((1L, "x"), (3L, "z"), (4000000000L, "w")),
      s"got $got2")
  }

  test("DROP COLUMN refuses while a pending MOR delete keys on it " +
      "(the mask would become unapplicable); compact unlocks") {
    import spark.implicits._
    val wh = catalog("gse8")
    val dir = s"$wh/ns/t"
    Versioned.append(Seq((1L, "x", 1.0), (2L, "y", 2.0))
      .toDF("k", "s", "v"), dir)
    Versioned.deleteByKeyMor(Seq(1L).toDF("k"), dir, "k")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gse8.ns.t DROP COLUMN k")
    }
    assert(e.getMessage.contains("pending merge-on-read delete"),
      s"got ${e.getMessage}")
    // an un-keyed column still drops fine under the pending mask
    spark.sql("ALTER TABLE gse8.ns.t DROP COLUMN v")
    assert(spark.sql("SELECT * FROM gse8.ns.t").columns.toSeq ==
      Seq("k", "s"))
    // compact materializes the mask; the drop then commits
    Versioned.compact(spark, dir, 1)
    spark.sql("ALTER TABLE gse8.ns.t DROP COLUMN k")
    assert(spark.sql("SELECT * FROM gse8.ns.t").collect()
      .map(_.getString(0)).toSeq == Seq("y"))
  }

  test("recycled names refuse even after EXPIRE erases the schema " +
      "history — live files' stats are the physical-column record") {
    import spark.implicits._
    val wh = catalog("gse9")
    val dir = s"$wh/ns/t"
    Versioned.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"), dir) // v1
    spark.sql("ALTER TABLE gse9.ns.t DROP COLUMN x")                  // v2
    // expire every snapshot whose SCHEMA named x — the files carrying
    // x's bytes are still referenced by the head
    Versioned.expire(spark, dir, keepLast = 1)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gse9.ns.t ADD COLUMNS (x DOUBLE)")
    }
    assert(e.getMessage.contains("physically carry"), s"got ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gse9.ns.t RENAME COLUMN k TO x")
    }
    assert(e2.getMessage.contains("physically carr"), s"got ${e2.getMessage}")
    // compact rewrites the files without x; both DDLs then commit and
    // the re-added column null-fills instead of resurfacing 10.0/20.0
    Versioned.compact(spark, dir, 1)
    spark.sql("ALTER TABLE gse9.ns.t ADD COLUMNS (x DOUBLE)")
    val got = spark.sql("SELECT k, x FROM gse9.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(got.toSeq == Seq((1L, true), (2L, true)), s"got ${got.toSeq}")
  }
}

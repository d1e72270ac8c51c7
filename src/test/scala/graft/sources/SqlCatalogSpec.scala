package graft.sources

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL faces of the versioned table: [[GraftCatalog]] (DataSource V2
  * TableCatalog — CREATE/INSERT/DELETE/SELECT with VERSION AS OF /
  * TIMESTAMP AS OF) and [[GraftVersionedProvider]] (the
  * `graft-versioned` format). Correctness against the commit-API reads,
  * refusal paths (untranslatable DELETE, writes to history, partitioned
  * CREATE), and the pushdown seam (pushed filters visible in the plan;
  * the inner scan's manifest admission actually prunes files).
  */
class SqlCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  private def newWarehouse(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Register (or re-point) catalog `name` at a fresh warehouse. */
  private def catalog(name: String): String = {
    val wh = newWarehouse(name)
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit =
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

  test("CREATE TABLE / INSERT INTO / SELECT round-trips through SQL") {
    val wh = catalog("gsp1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp1.ns")
    spark.sql("CREATE TABLE gsp1.ns.t (event_id BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE)")
    // a freshly created table is readable: empty, at the declared schema
    val empty = spark.sql("SELECT * FROM gsp1.ns.t")
    assert(empty.count() == 0)
    assert(empty.columns.toSeq ==
      Seq("event_id", "user_id", "event_type", "value"))
    ev.createOrReplaceTempView("gsp1_ev")
    spark.sql("INSERT INTO gsp1.ns.t SELECT * FROM gsp1_ev " +
      "WHERE event_id % 2 = 0")
    spark.sql("INSERT INTO gsp1.ns.t SELECT * FROM gsp1_ev " +
      "WHERE event_id % 2 = 1")
    assertSameRows(spark.sql("SELECT * FROM gsp1.ns.t"), ev)
    // the SQL face and the commit API see the same table
    assertSameRows(Versioned.read(spark, s"$wh/ns/t"), ev)
    assert(Versioned.currentVersion(s"$wh/ns/t") == 3) // create + 2 inserts
    // catalog surface: listing, existence, drop
    assert(spark.sql("SHOW TABLES IN gsp1.ns").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql("DROP TABLE gsp1.ns.t")
    assert(!spark.catalog.tableExists("gsp1.ns.t"))
  }

  test("INSERT OVERWRITE replaces content; previous snapshot stays") {
    val wh = catalog("gsp2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp2.ns")
    val dir = s"$wh/ns/t"
    Versioned.append(ev, dir) // v1
    ev.filter(col("event_type") === "click")
      .createOrReplaceTempView("gsp2_clicks")
    spark.sql("INSERT OVERWRITE gsp2.ns.t SELECT * FROM gsp2_clicks") // v2
    assertSameRows(spark.sql("SELECT * FROM gsp2.ns.t"),
      ev.filter(col("event_type") === "click"))
    assertSameRows(spark.sql("SELECT * FROM gsp2.ns.t VERSION AS OF 1"), ev)
  }

  test("VERSION AS OF resolves numbers and tag names; TIMESTAMP AS OF " +
      "resolves commit times") {
    val wh = catalog("gsp3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp3.ns")
    val dir = s"$wh/ns/t"
    val evens = ev.filter(col("event_id") % 2 === 0)
    Versioned.append(evens, dir) // v1
    Versioned.tag(dir, "first")
    val ts1 = System.currentTimeMillis()
    Thread.sleep(60)
    Versioned.append(ev.filter(col("event_id") % 2 === 1), dir) // v2
    assertSameRows(spark.sql("SELECT * FROM gsp3.ns.t VERSION AS OF 1"),
      evens)
    assertSameRows(spark.sql("SELECT * FROM gsp3.ns.t VERSION AS OF 'first'"),
      evens)
    assertSameRows(spark.sql("SELECT * FROM gsp3.ns.t"), ev)
    // TIMESTAMP AS OF: a literal between the commits pins v1 (formatted
    // in UTC — the session timezone — not the JVM default)
    val lit1 = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ts1), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assertSameRows(
      spark.sql(s"SELECT * FROM gsp3.ns.t TIMESTAMP AS OF '$lit1'"), evens)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gsp3.ns.t VERSION AS OF 'nope'").collect()
    }
    assert(e.getMessage.contains("neither a snapshot number nor a tag"))
  }

  test("DELETE FROM deletes through the commit API; untranslatable " +
      "predicates refuse") {
    val wh = catalog("gsp4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp4.ns")
    val dir = s"$wh/ns/t"
    Versioned.append(ev, dir) // v1
    spark.sql("DELETE FROM gsp4.ns.t WHERE event_type = 'view' " +
      "AND user_id < 30")
    assertSameRows(spark.sql("SELECT * FROM gsp4.ns.t"),
      ev.filter(!(col("event_type") === "view" && col("user_id") < 30)))
    // pre-delete snapshot remains readable history
    assertSameRows(spark.sql("SELECT * FROM gsp4.ns.t VERSION AS OF 1"), ev)
    // a predicate with no exact source-filter form no longer refuses: it
    // falls back to the row-level COW rewrite (SqlRowLevelSpec covers the
    // semantics); here it matches nothing, so no snapshot is minted
    val vBefore = Versioned.currentVersion(dir)
    spark.sql("DELETE FROM gsp4.ns.t WHERE abs(value) > 1e9")
    assert(Versioned.currentVersion(dir) == vBefore)
    assertSameRows(spark.sql("SELECT * FROM gsp4.ns.t"),
      ev.filter(!(col("event_type") === "view" && col("user_id") < 30)))
  }

  test("SQL reads a MOR snapshot with pending delete files correctly") {
    val wh = catalog("gsp5")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp5.ns")
    val dir = s"$wh/ns/t"
    Versioned.append(ev, dir) // v1
    val dropIds = ev.filter(col("event_id") % 7 === 0)
      .select(col("event_id"))
    Versioned.deleteByKeyMor(dropIds, dir, "event_id") // v2: delete file
    assert(Versioned.hasDeleteFiles(spark, dir))
    assertSameRows(spark.sql("SELECT * FROM gsp5.ns.t"),
      ev.filter(col("event_id") % 7 =!= 0))
  }

  test("catalog SELECT pushes filters into the scan and the manifest " +
      "admission prunes files") {
    val wh = catalog("gsp6")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp6.ns")
    val dir = s"$wh/ns/t"
    // key-clustered commits -> disjoint per-file user_id ranges
    Versioned.append(ev.repartitionByRange(8, col("user_id")), dir)
    val q = spark.sql(
      "SELECT event_id, user_id FROM gsp6.ns.t WHERE user_id < 10")
    assertSameRows(q, ev.filter(col("user_id") < 10)
      .select(col("event_id"), col("user_id")))
    // the V1 bridge reports what it pushed
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      s"expected pushed filters in plan:\n$plan")
    // and the inner scan the bridge builds admits fewer files than the
    // snapshot holds (same seam SqlBridge.scan drives)
    val inner = Versioned.readForScan(spark, dir)
      .filter(col("user_id") < 10)
    val scan = inner.queryExecution.sparkPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in inner plan"))
    val admitted = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.size).sum
    val total = Versioned.read(spark, dir).inputFiles.length
    assert(admitted < total,
      s"expected pruning: admitted $admitted of $total files")
  }

  test("graft-versioned format: modes, versionAsOf, tags, and " +
      "timestampAsOf options") {
    val dir = newWarehouse("gspfmt") + "/t"
    val evens = ev.filter(col("event_id") % 2 === 0)
    evens.write.format("graft-versioned").save(dir) // v1 via ErrorIfExists
    intercept[IllegalStateException] {
      evens.write.format("graft-versioned").save(dir) // exists -> error
    }
    evens.write.format("graft-versioned").mode("ignore").save(dir) // no-op
    assert(Versioned.currentVersion(dir) == 1)
    Versioned.tag(dir, "base")
    ev.filter(col("event_id") % 2 === 1).write
      .format("graft-versioned").mode("append").save(dir) // v2
    assertSameRows(
      spark.read.format("graft-versioned").load(dir), ev)
    assertSameRows(
      spark.read.format("graft-versioned")
        .option("versionAsOf", "1").load(dir), evens)
    assertSameRows(
      spark.read.format("graft-versioned")
        .option("versionAsOf", "base").load(dir), evens)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned")
        .option("versionAsOf", "1").option("timestampAsOf", "0").load(dir)
        .collect()
    }
    ev.withColumn("value", col("value") * 2).write
      .format("graft-versioned").mode("overwrite").save(dir) // v3 replace
    assertSameRows(spark.read.format("graft-versioned").load(dir),
      ev.withColumn("value", col("value") * 2))
  }

  test("nested-field predicates stay residual (never mistranslated) and " +
      "evaluate correctly through SQL") {
    import org.apache.spark.sql.sources.{EqualTo => V1EqualTo}
    // a dotted V1 attribute is a NESTED field reference — backtick-
    // wrapping it would name a nonexistent top-level column, so the
    // translation must refuse (scan keeps it residual; DELETE rejects)
    assert(SqlBridge.toColumn(V1EqualTo("s.x", 1)).isEmpty)
    assert(SqlBridge.conjunction(Seq(V1EqualTo("s.x", 1))).isEmpty)
    val wh = catalog("gsp9")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp9.ns")
    val dir = s"$wh/ns/t"
    Versioned.append(
      ev.select(col("event_id"),
        struct(col("user_id").as("x"), col("event_type").as("k")).as("s")),
      dir)
    val got = spark.sql(
      "SELECT event_id FROM gsp9.ns.t WHERE s.x < 10 ORDER BY event_id")
    assertSameRows(got, ev.filter(col("user_id") < 10)
      .select(col("event_id")).orderBy(col("event_id")))
  }

  test("metadata tables: history, files, and tags read through SQL") {
    val wh = catalog("gsp8")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp8.ns")
    val dir = s"$wh/ns/t"
    Versioned.append(ev.filter(col("event_id") % 2 === 0), dir) // v1
    Versioned.tag(dir, "base")
    Versioned.append(ev.filter(col("event_id") % 2 === 1), dir) // v2
    val hist = spark.sql(
      "SELECT version, n_files, n_delete_files FROM gsp8.ns.t.history " +
        "ORDER BY version").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(hist(1).getInt(1) > hist(0).getInt(1)) // v2 carries v1's files
    val files = spark.sql("SELECT path, bytes FROM gsp8.ns.t.files")
      .collect()
    assert(files.length == hist(1).getInt(1))
    assert(files.forall(r => !r.isNullAt(1) && r.getLong(1) > 0))
    val tags = spark.sql("SELECT tag, version FROM gsp8.ns.t.tags")
      .collect()
    assert(tags.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("base", 1)))
    // an unknown metadata suffix is a missing table, not a silent empty
    intercept[Exception] {
      spark.sql("SELECT * FROM gsp8.ns.t.nope").collect()
    }
  }

  test("catalog DDL edges: non-identity partition transforms refuse, " +
      "additive ALTER works, destructive ALTER refuses, rename moves, " +
      "namespaces list") {
    val wh = catalog("gsp7")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp7.ns")
    // identity PARTITIONED BY is supported (SqlPartitionedSpec); the
    // transform families manifest stats cannot prune refuse loudly
    intercept[Exception] {
      spark.sql("CREATE TABLE gsp7.ns.p (a BIGINT, b STRING) " +
        "PARTITIONED BY (bucket(4, b))")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE gsp7.ns.p2 (a BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
    }
    spark.sql("CREATE TABLE gsp7.ns.a (x BIGINT)")
    // additive evolution is a pure metadata commit; old rows null-fill
    spark.sql("INSERT INTO gsp7.ns.a VALUES (1)")
    spark.sql("ALTER TABLE gsp7.ns.a ADD COLUMNS (y STRING)")
    spark.sql("INSERT INTO gsp7.ns.a VALUES (2, 'two')")
    val rows = spark.sql("SELECT * FROM gsp7.ns.a ORDER BY x").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).isNullAt(1) && rows(1).getString(1) == "two")
    // duplicate column (incl. case-insensitive) and destructive changes
    // refuse; so do position/NOT NULL riders the format cannot honor
    intercept[Exception] {
      spark.sql("ALTER TABLE gsp7.ns.a ADD COLUMNS (y DOUBLE)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gsp7.ns.a ADD COLUMNS (Y DOUBLE)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gsp7.ns.a ADD COLUMNS (z DOUBLE FIRST)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gsp7.ns.a ADD COLUMNS (w DOUBLE NOT NULL)")
    }
    // DROP/RENAME are supported metadata commits now (SqlEvolveSpec);
    // the destructive change that stays a rebuild is a RETYPE
    intercept[Exception] {
      spark.sql("ALTER TABLE gsp7.ns.a ALTER COLUMN y TYPE DOUBLE")
    }
    spark.sql("ALTER TABLE gsp7.ns.a RENAME TO ns.b")
    assert(!spark.catalog.tableExists("gsp7.ns.a"))
    assert(spark.catalog.tableExists("gsp7.ns.b"))
    assert(spark.sql("SHOW NAMESPACES IN gsp7").collect()
      .map(_.getString(0)).contains("ns"))
    // a table path is NOT a namespace — listing inside it must not leak
    // the table's internal layout (data/, _manifests) as namespaces
    intercept[Exception] {
      spark.sql("SHOW NAMESPACES IN gsp7.ns.b").collect()
    }
  }

  test("TRUNCATE TABLE mints an empty snapshot; history stays readable") {
    val wh = catalog("gsp9")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp9.ns")
    val dir = s"$wh/ns/t"
    Versioned.append(ev, dir) // v1
    spark.sql("TRUNCATE TABLE gsp9.ns.t") // v2: empty at the same schema
    val now = spark.sql("SELECT * FROM gsp9.ns.t")
    assert(now.count() == 0)
    assert(now.columns.toSeq ==
      Seq("event_id", "user_id", "event_type", "value"))
    assertSameRows(spark.sql("SELECT * FROM gsp9.ns.t VERSION AS OF 1"), ev)
    // and it keeps taking writes
    spark.sql("INSERT INTO gsp9.ns.t SELECT * FROM gsp9.ns.t VERSION AS OF 1")
    assert(spark.sql("SELECT COUNT(*) AS c FROM gsp9.ns.t")
      .head().getLong(0) == ev.count())
  }

  test("CREATE TABLE AS SELECT lands a populated versioned table in ONE " +
      "atomic commit (the staged path)") {
    val wh = catalog("gsp8")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp8.ns")
    ev.createOrReplaceTempView("gsp8_ev")
    spark.sql("CREATE TABLE gsp8.ns.c AS SELECT event_id, value " +
      "FROM gsp8_ev WHERE event_id % 4 = 0")
    assertSameRows(spark.sql("SELECT * FROM gsp8.ns.c"),
      ev.filter(col("event_id") % 4 === 0)
        .select(col("event_id"), col("value")))
    // StagingTableCatalog: the CTAS is ONE commit, not create + write
    assert(Versioned.currentVersion(s"$wh/ns/c") == 1)
  }

  test("CREATE OR REPLACE TABLE AS SELECT is atomic: one re-release " +
      "commit, history survives, a FAILED replace leaves the table " +
      "untouched, a failed CTAS leaves no table") {
    val wh = catalog("gsp10")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp10.ns")
    val dir = s"$wh/ns/t"
    ev.createOrReplaceTempView("gsp10_ev")
    spark.sql("CREATE TABLE gsp10.ns.t AS SELECT * FROM gsp10_ev") // v1
    spark.sql("CREATE OR REPLACE TABLE gsp10.ns.t AS " +
      "SELECT * FROM gsp10_ev WHERE event_id % 2 = 0") // v2 re-release
    assertSameRows(spark.sql("SELECT * FROM gsp10.ns.t"),
      ev.filter(col("event_id") % 2 === 0))
    // a replace is a re-release, not a purge: v1 stays readable
    assertSameRows(spark.sql("SELECT * FROM gsp10.ns.t VERSION AS OF 1"),
      ev)
    assert(Versioned.currentVersion(dir) == 2)

    // FAILED replace: the SELECT throws mid-job; the manifest CAS never
    // ran, so head, content, and history are all untouched
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE gsp10.ns.t AS " +
        "SELECT event_id, user_id, event_type, " +
        "CAST(raise_error('boom') AS DOUBLE) AS value FROM gsp10_ev")
    }
    assert(Versioned.currentVersion(dir) == 2)
    assertSameRows(spark.sql("SELECT * FROM gsp10.ns.t"),
      ev.filter(col("event_id") % 2 === 0))
    assertSameRows(spark.sql("SELECT * FROM gsp10.ns.t VERSION AS OF 1"),
      ev)

    // FAILED brand-new CTAS: no half-created table survives
    intercept[Exception] {
      spark.sql("CREATE TABLE gsp10.ns.broken AS " +
        "SELECT CAST(raise_error('boom') AS BIGINT) AS x FROM gsp10_ev")
    }
    assert(!spark.catalog.tableExists("gsp10.ns.broken"))
  }

  test("write-less REPLACE TABLE of an existing table mints an EMPTY " +
      "snapshot at the declared schema (not a silent no-op)") {
    val wh = catalog("gsp11")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp11.ns")
    val dir = s"$wh/ns/t"
    ev.createOrReplaceTempView("gsp11_ev")
    spark.sql("CREATE TABLE gsp11.ns.t AS SELECT * FROM gsp11_ev") // v1
    // plain REPLACE (no AS SELECT): AtomicReplaceTableExec stages and
    // commits WITHOUT ever writing — the commit must still re-release
    spark.sql("REPLACE TABLE gsp11.ns.t (k BIGINT, s STRING)")
    assert(Versioned.currentVersion(dir) == 2)
    val head = spark.sql("SELECT * FROM gsp11.ns.t")
    assert(head.count() == 0)
    assert(head.schema.fieldNames.toSeq == Seq("k", "s"))
    // history stays readable (a replace is a re-release, not a purge)
    assert(spark.sql("SELECT * FROM gsp11.ns.t VERSION AS OF 1").count() ==
      ev.count())
    // CREATE OR REPLACE without AS SELECT on an existing table: same
    spark.sql("CREATE OR REPLACE TABLE gsp11.ns.t (z DOUBLE)")
    assert(Versioned.currentVersion(dir) == 3)
    assert(spark.sql("SELECT * FROM gsp11.ns.t").schema
      .fieldNames.toSeq == Seq("z"))
  }
}

package graft.sources

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned VERSIONED tables through the SQL catalog: `CREATE TABLE …
  * PARTITIONED BY (identity cols)` lays every commit's data files under
  * partition directories while keeping files SELF-CONTAINED
  * ([[Versioned.PartDirPrefix]]), so every existing read path — time
  * travel, CDF, MOR masks, the V2 batch scan — works unchanged, and
  * identity stats (lo == hi per file) make the ordinary manifest
  * admission an EXACT partition pruner. Static
  * `INSERT OVERWRITE … PARTITION (p = v)` maps onto
  * [[Versioned.replaceWhere]] (whole-partition drops are pure metadata);
  * dynamic mode onto [[Versioned.replacePartitions]].
  */
class SqlPartitionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def catalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    wh
  }

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit =
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

  test("PARTITIONED BY lays files under partition dirs; files stay " +
      "self-contained; reads round-trip") {
    val wh = catalog("gpp1")
    spark.sql("CREATE TABLE gpp1.ns.t (id BIGINT, day STRING, v DOUBLE) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gpp1.ns.t VALUES " +
      "(1, 'd1', 1.0), (2, 'd1', 2.0), (3, 'd2', 3.0), (4, 'd3', 4.0)")
    val dir = s"$wh/ns/t"
    val files = Versioned.listDataFiles(spark, dir)
    assert(files.nonEmpty && files.forall(_.contains("/__p_day=")),
      s"expected partition-laid files, got:\n${files.mkString("\n")}")
    // self-contained: the partition column is IN the file content
    val one = spark.read.parquet(files.head)
    assert(one.schema.fieldNames.contains("day"))
    assert(one.schema.fieldNames.toSet ==
      Set("id", "day", "v"))
    val got = spark.sql("SELECT * FROM gpp1.ns.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "d1", 1.0), (2L, "d1", 2.0),
      (3L, "d2", 3.0), (4L, "d3", 4.0)))
    // DESCRIBE reports the declared partitioning
    assert(Versioned.partitionColumns(spark, dir) == Seq("day"))
  }

  test("partition-column filters prune files exactly (identity stats " +
      "through manifest admission), composing with time travel") {
    val wh = catalog("gpp2")
    spark.sql("CREATE TABLE gpp2.ns.t (id BIGINT, day STRING, v DOUBLE) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gpp2.ns.t SELECT id, concat('d', id % 4), " +
      "CAST(id AS DOUBLE) FROM range(100)")
    val dir = s"$wh/ns/t"
    val total = Versioned.listDataFiles(spark, dir).size
    assert(total >= 4, s"want >=4 partition files, got $total")
    val q = spark.sql("SELECT id, v FROM gpp2.ns.t WHERE day = 'd2'")
    assert(q.count() == 25)
    // the V2 batch scan's description records admitted/total
    val desc = q.queryExecution.executedPlan.toString
    val m = "graft-versioned-scan v=(\\d+) (\\d+)/(\\d+) files".r
      .findFirstMatchIn(desc)
      .getOrElse(fail(s"no versioned batch scan in plan:\n$desc"))
    // identity layout: one value per file, so EXACTLY the d2 files admit
    // (one partition in four)
    assert(m.group(2).toInt * 4 == m.group(3).toInt,
      s"expected exact partition pruning, admitted ${m.group(2)} of " +
        s"${m.group(3)}:\n$desc")
  }

  test("static INSERT OVERWRITE … PARTITION replaces exactly that " +
      "partition in one commit; history stays readable") {
    val wh = catalog("gpp3")
    spark.sql("CREATE TABLE gpp3.ns.t (id BIGINT, day STRING, v DOUBLE) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gpp3.ns.t VALUES " +
      "(1, 'd1', 1.0), (2, 'd2', 2.0), (3, 'd3', 3.0)")
    val dir = s"$wh/ns/t"
    val v2 = Versioned.currentVersion(dir)
    spark.sql("INSERT OVERWRITE gpp3.ns.t PARTITION (day = 'd2') " +
      "VALUES (20, 99.0), (21, 98.0)")
    assert(Versioned.currentVersion(dir) == v2 + 1,
      "partition overwrite must be ONE commit")
    val got = spark.sql("SELECT id, day, v FROM gpp3.ns.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "d1", 1.0), (3L, "d3", 3.0),
      (20L, "d2", 99.0), (21L, "d2", 98.0)))
    // pre-overwrite snapshot intact
    val before = spark.sql(
      s"SELECT id FROM gpp3.ns.t VERSION AS OF $v2 ORDER BY id")
      .collect().map(_.getLong(0))
    assert(before.toSeq == Seq(1L, 2L, 3L))
    // a whole-partition overwrite drops the old partition's files as
    // PURE METADATA: the INSERT commit's d2 file (under /data/c=…) left
    // the head manifest — only the overwrite commit's d2 files remain —
    // while d1/d3 files carry from the original commit by reference
    val head = Versioned.listDataFiles(spark, dir)
    assert(!head.exists(f =>
      f.contains("__p_day=d2") && f.contains("/data/c=")),
      s"old d2 file still live:\n${head.mkString("\n")}")
    assert(head.exists(_.contains("__p_day=d2"))) // the new rows
    assert(head.exists(f =>
      f.contains("__p_day=d1") && f.contains("/data/c=")),
      "untouched partitions must carry by reference")
  }

  test("dynamic partitionOverwriteMode replaces exactly the partitions " +
      "present in the data") {
    val wh = catalog("gpp4")
    spark.sql("CREATE TABLE gpp4.ns.t (id BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gpp4.ns.t VALUES (1,'d1'),(2,'d2'),(3,'d3')")
    val prev = spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE gpp4.ns.t VALUES (20, 'd2'), (40, 'd4')")
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val got = spark.sql("SELECT id, day FROM gpp4.ns.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "d1"), (3L, "d3"), (20L, "d2"),
      (40L, "d4")))
  }

  test("CTAS PARTITIONED BY; replaceWhere rejects rows violating the " +
      "overwrite predicate; SQL UPDATE works on a partitioned table") {
    val wh = catalog("gpp5")
    spark.sql("CREATE TABLE gpp5.ns.t PARTITIONED BY (day) AS " +
      "SELECT id, concat('d', id % 3) AS day FROM range(30)")
    val dir = s"$wh/ns/t"
    assert(Versioned.partitionColumns(spark, dir) == Seq("day"))
    assert(Versioned.listDataFiles(spark, dir)
      .forall(_.contains("/__p_day=")))
    // overwrite rows must satisfy the partition predicate
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE gpp5.ns.t PARTITION (day = 'd1') " +
        "SELECT id, 'd2' FROM range(5)")
    }
    // row-level ops still work (replacement files land unlaid — content
    // stays self-contained, so pruning and reads are unaffected)
    spark.sql("UPDATE gpp5.ns.t SET day = 'dX' WHERE id = 7")
    assert(spark.sql("SELECT day FROM gpp5.ns.t WHERE id = 7")
      .collect().head.getString(0) == "dX")
    assert(spark.sql("SELECT COUNT(*) FROM gpp5.ns.t")
      .collect().head.getLong(0) == 30)
  }

  test("the partitions metadata table summarizes per-partition " +
      "files/bytes/rows from the manifest alone") {
    val wh = catalog("gpp7")
    spark.sql("CREATE TABLE gpp7.ns.t (id BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gpp7.ns.t VALUES " +
      "(1,'d1'),(2,'d1'),(3,'d2')")
    spark.sql("INSERT INTO gpp7.ns.t VALUES (4,'d1')")
    val got = spark.sql(
      "SELECT partition, n_files, rows FROM gpp7.ns.t.partitions " +
        "ORDER BY partition")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // row counts are exact; file counts depend on task layout — d1 has
    // at least two (the two commits each wrote it), d2 exactly one
    assert(got.map(g => (g._1, g._3)).toSeq ==
      Seq(("day=d1", 3L), ("day=d2", 1L)), s"got ${got.toSeq}")
    assert(got(0)._2 >= 2 && got(1)._2 >= 1)
    // file counts reconcile with the files metadata table exactly
    val nFiles = spark.sql("SELECT SUM(n_files) FROM gpp7.ns.t.partitions")
      .collect().head.getLong(0)
    assert(nFiles == spark.sql("SELECT COUNT(*) FROM gpp7.ns.t.files")
      .collect().head.getLong(0))
    val bytes = spark.sql("SELECT SUM(bytes) FROM gpp7.ns.t.partitions")
      .collect().head.getLong(0)
    assert(bytes > 0)
    // an unpartitioned table reports an EMPTY partitions table
    spark.sql("CREATE TABLE gpp7.ns.flat (id BIGINT)")
    spark.sql("INSERT INTO gpp7.ns.flat VALUES (1)")
    assert(spark.sql("SELECT * FROM gpp7.ns.flat.partitions").count() == 0)
  }

  test("writes cluster by partition columns (RequiresDistributionAnd" +
      "Ordering): a many-task INSERT lands one file per partition") {
    import spark.implicits._
    val wh = catalog("gpp8")
    spark.sql("CREATE TABLE gpp8.ns.t (id BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    // a source spread over 8 tasks holding only 2 distinct days: without
    // the required distribution this commit mints up to 16 files
    spark.range(0, 100).select(col("id"),
        concat(lit("d"), (col("id") % 2).cast("string")).as("day"))
      .repartition(8)
      .createOrReplaceTempView("gpp8_src")
    spark.sql("INSERT INTO gpp8.ns.t SELECT * FROM gpp8_src")
    val files = spark.sql("SELECT path FROM gpp8.ns.t.files")
      .collect().map(_.getString(0))
    assert(files.length == 2,
      s"expected one file per partition, got ${files.length}: " +
        files.mkString(", "))
    assert(spark.sql("SELECT COUNT(DISTINCT day) FROM gpp8.ns.t")
      .collect().head.getLong(0) == 2)
    assert(spark.sql("SELECT COUNT(*) FROM gpp8.ns.t")
      .collect().head.getLong(0) == 100)
    // CTAS takes the same clustered write path
    spark.sql("CREATE TABLE gpp8.ns.t2 PARTITIONED BY (day) AS " +
      "SELECT * FROM gpp8_src")
    assert(spark.sql("SELECT COUNT(*) FROM gpp8.ns.t2.files")
      .collect().head.getLong(0) == 2)
  }

  test("dynamic overwrite replaces the NULL partition like any other " +
      "(null-safe partition tuples — __HIVE_DEFAULT_PARTITION__)") {
    import spark.implicits._
    val wh = catalog("gpp9")
    spark.sql("CREATE TABLE gpp9.ns.t (id BIGINT, day STRING) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gpp9.ns.t VALUES " +
      "(1, 'd1'), (2, NULL), (3, NULL)")
    // dynamic overwrite carrying ONLY null-partition rows must replace
    // the old null partition — not duplicate alongside it
    val prev = spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE TABLE gpp9.ns.t VALUES (9, NULL)")
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset(
        "spark.sql.sources.partitionOverwriteMode")
    }
    val got = spark.sql(
      "SELECT id, day FROM gpp9.ns.t ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "NULL" else r.getString(1)))
    assert(got.toSeq == Seq((1L, "d1"), (9L, "NULL")),
      s"null partition not replaced: ${got.toSeq}")
  }

  test("MOR deletes sequence correctly against partition-laid files " +
      "(seqOf walks past partition dirs)") {
    import spark.implicits._
    val wh = catalog("gpp6")
    val dir = s"$wh/ns/t"
    Versioned.createEmpty(spark,
      dir, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("day",
          org.apache.spark.sql.types.StringType))), Seq("day"))
    Versioned.append(Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"), dir)
    // MOR-delete id=1, then RE-APPEND id=1: the re-appended row's file
    // sits at a LATER sequence than the delete and must survive the mask
    Versioned.deleteByKeyMor(Seq(1L).toDF("id"), dir, "id")
    Versioned.append(Seq((1L, "d9")).toDF("id", "day"), dir)
    val got = Versioned.read(spark, dir).as[(Long, String)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "d9"), (2L, "d2")),
      s"sequence rule broke on partition-laid files: ${got.toSeq}")
  }
}

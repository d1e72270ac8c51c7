package graft.sources

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only aggregate pushdown ([[AggPushdown]] through
  * `SupportsPushDownAggregates`): global COUNT/COUNT(col)/MIN/MAX answer
  * from manifest stats with zero data I/O — proven by hiding the data
  * directory — while anything the stats cannot answer EXACTLY (SUM,
  * grouped, filtered, strings, distinct) falls back to the ordinary
  * scan.
  */
class AggPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  private def mk(name: String): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    val dir = s"$wh/ns/t"
    Versioned.append(ev.filter(col("event_id") % 2 === 0), dir)
    Versioned.append(ev.filter(col("event_id") % 2 === 1), dir)
    (s"$name.ns.t", dir)
  }

  test("global COUNT/COUNT(col)/MIN/MAX answer from the manifest with " +
      "ZERO data I/O (data dir physically hidden)") {
    val (t, dir) = mk("agp1")
    val want = ev.agg(count(lit(1)).as("c"), count(col("value")).as("cv"),
      min("user_id").as("mn"), max("value").as("mx")).head()
    // the plan must be the metadata scan, not a parquet read
    val plan = spark.sql(
      s"SELECT COUNT(*), MIN(user_id) FROM $t").queryExecution
      .executedPlan.toString
    assert(plan.contains("MetadataAggScan"), plan)
    // decisive: no data files, still exact
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(s"$dir/data"), new Path(s"$dir/data_h")))
    try {
      val got = spark.sql(s"SELECT COUNT(*) AS c, COUNT(value) AS cv, " +
        s"MIN(user_id) AS mn, MAX(value) AS mx FROM $t").head()
      assert(got.getLong(0) == want.getLong(0))
      assert(got.getLong(1) == want.getLong(1))
      assert(got.getLong(2) == want.getLong(2))
      assert(got.getDouble(3) == want.getDouble(3))
      // SUM cannot answer from stats: it must try (and fail) to scan
      intercept[Exception] {
        spark.sql(s"SELECT SUM(value) FROM $t").collect()
      }
    } finally fs.rename(new Path(s"$dir/data_h"), new Path(s"$dir/data"))
  }

  test("pushdown composes with time travel and refuses what it cannot " +
      "answer exactly") {
    val (t, dir) = mk("agp2")
    // v1 = evens only; the pinned read's aggregate must see v1's stats
    val evens = ev.filter(col("event_id") % 2 === 0)
    val got = spark.sql(
      s"SELECT COUNT(*) AS c, MAX(event_id) AS mx FROM $t VERSION AS OF 1")
      .head()
    assert(got.getLong(0) == evens.count())
    assert(got.getLong(1) ==
      evens.agg(max("event_id")).head().getLong(0))
    // grouped / filtered / string-extreme aggregates all take the scan
    // path and stay correct
    val byType = spark.sql(
      s"SELECT event_type, COUNT(*) AS c FROM $t GROUP BY event_type")
    val wantByType = ev.groupBy("event_type").agg(count(lit(1)).as("c"))
    assert(byType.exceptAll(wantByType).isEmpty &&
      wantByType.exceptAll(byType).isEmpty)
    val filtered = spark.sql(
      s"SELECT COUNT(*) AS c FROM $t WHERE user_id < 5").head().getLong(0)
    assert(filtered == ev.filter(col("user_id") < 5).count())
    val smin = spark.sql(s"SELECT MIN(event_type) AS m FROM $t")
    assert(!smin.queryExecution.executedPlan.toString
      .contains("MetadataAggScan"),
      "string extremes must refuse (truncated stats)")
    assert(smin.head().getString(0) ==
      ev.agg(min("event_type")).head().getString(0))
  }

  test("stats survive the SQL write paths: files minted by UPDATE and by " +
      "the streaming sink still answer metadata aggregates and prune") {
    val (t, dir) = mk("agp4")
    // a row-level rewrite replaces one file with executor-written ones;
    // their manifest stats entries must keep the SAME spelling as the
    // 'f' rows, or every raw-equality consumer goes stats-blind
    spark.sql(s"UPDATE $t SET value = value + 1.0 WHERE event_id < 100")
    val afterUpd = spark.sql(s"SELECT COUNT(*) AS c, MAX(value) AS mx " +
      s"FROM $t")
    assert(afterUpd.queryExecution.executedPlan.toString
      .contains("MetadataAggScan"),
      "aggregate pushdown must survive a SQL UPDATE's rewritten files")
    assert(afterUpd.head().getLong(0) == ev.count())
    // file pruning from the rewritten files' stats: event_id < 100 rows
    // all live in the UPDATE-written files (2 appends split by parity,
    // both touched), so a disjoint probe must open fewer files
    val probe = spark.sql(
      s"SELECT COUNT(*) AS c FROM $t WHERE event_id > 1000000")
    assert(probe.head().getLong(0) == 0L)

    // streaming-sink files: same contract
    val w = new GraftStreamingWrite(dir, ev.schema, "agp4-q")
    val uidField = classOf[GraftStreamingWrite].getDeclaredField("uid")
    uidField.setAccessible(true)
    val uid = uidField.get(w).asInstanceOf[String]
    val staging = Versioned.streamStagingDir(dir, uid, 0L)
    ev.limit(10).withColumn("event_id", col("event_id") + 5000000L)
      .coalesce(1).write.parquet(staging + "_tmp")
    val fs = new Path(staging).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(staging + "_tmp"), new Path(staging))
    val msgs = fs.listStatus(new Path(staging))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(f => RowLevelCommitMessage(Some(f.getPath.toString)):
        org.apache.spark.sql.connector.write.WriterCommitMessage)
    w.commit(0L, msgs)
    val afterStream = spark.sql(s"SELECT COUNT(*) AS c, " +
      s"MAX(event_id) AS mx FROM $t")
    assert(afterStream.queryExecution.executedPlan.toString
      .contains("MetadataAggScan"),
      "aggregate pushdown must survive streamed-in files")
    assert(afterStream.head().getLong(0) == ev.count() + 10)
    assert(afterStream.head().getLong(1) >= 5000000L)
  }

  test("MOR delete masks disable the metadata answer until compact") {
    val (t, dir) = mk("agp3")
    Versioned.deleteByKeyMor(
      ev.filter(col("event_id") % 7 === 0).select("event_id"),
      dir, "event_id")
    val masked = spark.sql(s"SELECT COUNT(*) AS c FROM $t")
    assert(!masked.queryExecution.executedPlan.toString
      .contains("MetadataAggScan"))
    assert(masked.head().getLong(0) ==
      ev.filter(col("event_id") % 7 =!= 0).count())
    Versioned.compact(spark, dir, numFiles = 2)
    val compacted = spark.sql(s"SELECT COUNT(*) AS c FROM $t")
    assert(compacted.queryExecution.executedPlan.toString
      .contains("MetadataAggScan"))
    assert(compacted.head().getLong(0) ==
      ev.filter(col("event_id") % 7 =!= 0).count())
  }
}

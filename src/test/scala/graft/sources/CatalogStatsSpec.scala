package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-planning statistics for versioned tables
  * ([[Versioned.snapshotStats]] through `SupportsReportStatistics` on
  * the catalog scan, `BaseRelation.sizeInBytes` on the format face):
  * without them every catalog read carries Spark's assume-huge default
  * and a KB-sized dimension never broadcasts.
  */
class CatalogStatsSpec extends AnyFunSuite {
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
    Versioned.append(ev, dir)
    (s"$name.ns.t", dir)
  }

  test("catalog scans report manifest-derived sizeInBytes and rowCount; " +
      "a small versioned dimension auto-broadcasts") {
    val (t, dir) = mk("cst1")
    val wantBytes = Versioned.dataFileSizes(spark, dir).values.sum
    val df = spark.sql(s"SELECT * FROM $t")
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes == BigInt(wantBytes),
      s"got ${stats.sizeInBytes}, manifest says $wantBytes")

    ev.createOrReplaceTempView("cst1_probe")
    val joined = spark.sql(
      s"SELECT p.event_id, d.event_type FROM cst1_probe p " +
        s"JOIN $t d ON p.event_id = d.event_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"KB-sized versioned table must broadcast:\n$plan")

    // the estimate FLOWS (it is not a constant): below a 1-byte
    // threshold the same join must stop broadcasting the scan side
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val plan2 = spark.sql(
        s"SELECT p.event_id, d.event_type FROM cst1_probe p " +
          s"JOIN $t d ON p.event_id = d.event_id")
        .queryExecution.executedPlan.toString
      assert(!plan2.contains("BroadcastHashJoin"), plan2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("masked snapshots KEEP manifest byte estimates (the V2 masking " +
      "scan — an overcount, never an undercount); row counts stay " +
      "honest; over-cap masks fall back to assume-huge") {
    val (t, dir) = mk("cst2")
    // delete-free: the format face reports manifest bytes at the V1
    // relation level
    val rel = spark.read.format("graft-versioned").load(dir)
    val relStats = rel.queryExecution.optimizedPlan.stats
    assert(relStats.sizeInBytes > 0 &&
      relStats.sizeInBytes < (1L << 30), s"${relStats.sizeInBytes}")

    // a pending MOR mask now rides the V2 masking scan: manifest BYTES
    // still flow (masks only remove rows, so the estimate is an
    // overcount — sound for broadcast planning), while the ROW count is
    // withheld (masked rows would overcount it)
    Versioned.deleteByKeyMor(
      ev.filter(col("event_id") % 9 === 0).select("event_id"),
      dir, "event_id")
    val masked = spark.sql(s"SELECT * FROM $t").queryExecution
      .optimizedPlan.stats
    assert(masked.sizeInBytes > 0 && masked.sizeInBytes < (1L << 30),
      s"masked snapshot lost its manifest estimate: " +
        s"${masked.sizeInBytes}")
    assert(masked.rowCount.isEmpty,
      s"masked row count must be withheld: ${masked.rowCount}")

    // an OVER-CAP mask degrades to the V1 anti-join read, where the
    // estimate must be the conservative default
    spark.conf.set("graft.versioned.maxBroadcastKeys", "1")
    try {
      val huge = spark.sql(s"SELECT * FROM $t").queryExecution
        .optimizedPlan.stats
      assert(huge.sizeInBytes > (1L << 40),
        s"over-cap mask must not report a manifest estimate: " +
          s"${huge.sizeInBytes}")
    } finally spark.conf.unset("graft.versioned.maxBroadcastKeys")

    // compact materializes the mask and row counts return
    Versioned.compact(spark, dir, numFiles = 2)
    val after = spark.sql(s"SELECT * FROM $t").queryExecution
      .optimizedPlan.stats
    assert(after.sizeInBytes < (1L << 30) &&
      after.rowCount.contains(BigInt(
        ev.filter(col("event_id") % 9 =!= 0).count())),
      s"${after.sizeInBytes} / ${after.rowCount}")
  }
}

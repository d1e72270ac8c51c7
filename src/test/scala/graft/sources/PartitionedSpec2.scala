package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Date-partitioned layout: content identity under the rewrite, the
  * planned file-count contract (days x filesPerDay), and the actual prune
  * — a one-day slice touches only its own dt= directory.
  *
  * (Named Spec2 to avoid clashing with the bio PartitionedSearchSpec.)
  */
class PartitionedSpec2 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("dtpart").toString + "/t"
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
    Partitioned.writeDatePartitioned(ev, d, saltCol = "event_id",
      filesPerDay = 2)
    d
  }

  test("rewrite is content-identical to the source (dt is derived)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val back = spark.read.parquet(dir).drop("dt")
      .select(ev.columns.map(col): _*)
    assert(back.count() == ev.count())
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }

  test("per-day file count bounded by filesPerDay, no small-file explosion") {
    val files = spark.read.parquet(dir).inputFiles
    val perDay = files.groupBy(f => f.split("/dt=")(1).split("/")(0))
      .map(_._2.length)
    assert(perDay.size == 30)
    assert(perDay.max <= 2 && perDay.min >= 1)
    // a naive partitionBy would have written tasks x days files
    assert(files.length <= 60)
  }

  test("a one-day slice prunes to its own dt= directory at planning time") {
    val day = Partitioned.readDay(spark, dir, "2024-01-15")
    // the predicate must reach the scan as a PartitionFilter (planning-time
    // directory prune), not a post-scan Filter
    val planStr = day.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = planStr.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("2024-01-15")), s"no partition filter:\n$planStr")
    // and the executed scan opened only that day's files
    val rows = day.collect()
    val scan = day.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value <= 2,
      s"read ${scan.metrics("numFiles").value} files for one day")
    val want = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .filter(to_date(col("ts")) === lit("2024-01-15")).count()
    assert(rows.length.toLong == want && want > 0)
  }
}

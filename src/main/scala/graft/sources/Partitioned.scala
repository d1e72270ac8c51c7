package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style date-partitioned layout — the bread-and-butter 100 TB fact
  * layout (public prior art: Hive partitioning; Spark partition discovery
  * + pruning). `ZOrder` buys multi-column box locality and `BloomIndex`
  * point-key locality; this buys the cheapest and most common win of all:
  * a time-sliced query reads ONLY the `dt=` directories it names, pruned
  * at PLANNING time from directory names — zero footer/stat reads for
  * skipped days.
  *
  * Write-side shape matters at scale:
  *   - a naive `write.partitionBy("dt")` makes EVERY task write one file
  *     per day it holds — tasks × days small files (the classic
  *     small-file explosion);
  *   - `repartition(col("dt"))` collapses each day to ONE task — one big
  *     file per day and no intra-day write parallelism (a day of a
  *     100 TB stream does not fit one task).
  * So the rewrite shuffles on (dt, hash(key) % filesPerDay): exactly
  * `filesPerDay` tasks/files per day, each day written in parallel,
  * file count = days × filesPerDay by construction.
  */
object Partitioned {

  /** Rewrite `ev` (needs a `ts` timestamp column) date-partitioned at
    * `dir`, at most `filesPerDay` files per `dt=` directory.
    *
    * `shuffleTasks` is explicit (not `repartition(cols…)`) so AQE cannot
    * coalesce the write back to one-task-per-day on a small batch; size it
    * ~ days × filesPerDay. Per-day file count is bounded by construction:
    * a task writes one file per day it holds, and a day spans at most
    * `filesPerDay` salt groups — so [1, filesPerDay] files per day,
    * NEVER the tasks × days small-file explosion of a naive partitionBy.
    */
  def writeDatePartitioned(ev: DataFrame, dir: String, saltCol: String,
      filesPerDay: Int = 2, shuffleTasks: Int = 64): Unit = {
    require(filesPerDay >= 1, s"filesPerDay=$filesPerDay")
    ev.withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(shuffleTasks, col("dt"),
        pmod(hash(col(saltCol)), lit(filesPerDay)))
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
  }

  /** One day's slice through the partitioned layout. The `dt === day`
    * predicate is a partition filter: Spark prunes the other `dt=`
    * directories during planning (spec-asserted via inputFiles).
    */
  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("dt") === day)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed, co-located fact⨝fact joins — the storage-level answer to the
  * biggest shuffle in the suite (SURVEY §7.8 "bucketed joins"; §2.4 J1's
  * pre-sorted merge note). Both fact tables persist `bucketBy(N, key)` +
  * `sortBy(key)`: every bucket holds the same key slice on both sides, so
  * a join on the bucket key needs NO Exchange on either side (and with
  * one file per bucket, no re-sort either) — at 100 TB that deletes the
  * two largest shuffles of a fact-fact join and replaces them with
  * partition-local merge joins. The write pays one up-front shuffle per
  * table (the `repartition(N, key)` below, which also yields exactly one
  * file per bucket so Spark trusts the sorted property).
  *
  * Tables register in the session catalog with an explicit temp-dir
  * `path` (external tables — nothing lands in the repo's warehouse dir).
  */
object Bucketed {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  val NumBuckets = 16

  /** Build (once per JVM per sfDir) the bucketed lineitem/orders tables;
    * returns their catalog names.
    */
  def ensureBucketedTables(s: SparkSession, d: String): (String, String) =
    cache.computeIfAbsent(d, { _ =>
      val tag = java.lang.Integer.toHexString(d.hashCode).takeRight(6)
      val li = s"graft_li_b_$tag"
      val ord = s"graft_ord_b_$tag"
      val dir = java.nio.file.Files.createTempDirectory("graft_bucketed")
        .toString
      graft.Tables.lineitem(s, d)
        .repartition(NumBuckets, col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/$li").saveAsTable(li)
      graft.Tables.orders(s, d)
        .repartition(NumBuckets, col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/$ord").saveAsTable(ord)
      (li, ord)
    })

  /** The co-located join itself: revenue per order priority over
    * lineitem⨝orders, reading the bucketed tables — shuffle-free up to
    * the (tiny) final priority aggregation. Result is byte-identical to
    * the plain parquet join; the PLAN is the point (spec-asserted: no
    * Exchange under the join).
    */
  def bucketedJoinAgg(s: SparkSession, d: String): DataFrame = {
    val (li, ord) = ensureBucketedTables(s, d)
    s.table(li).join(s.table(ord),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }
}

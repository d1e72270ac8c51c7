package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained AGGREGATE VIEW over a [[Versioned]] table —
  * the materialized-view maintenance loop (classic delta-propagation
  * view maintenance, and what Snowflake/Databricks ship as incremental
  * MV refresh), driven by the table's change-data-feed instead of a
  * full recompute.
  *
  * The view materializes `GROUP BY groupCols -> (SUM(valueCol), COUNT(*),
  * COUNT(valueCol))` as its own [[Versioned]] table — the non-null value
  * count is what lets the fold reproduce SQL SUM's null semantics (a
  * group whose live values are all NULL shows sum NULL, not 0.0), and
  * AVG is derivable as sum_value / n_vals at query time. [[refresh]] reads ONLY the CDF delta
  * between the view's recorded upstream watermark and the source head
  * ([[Versioned.changesBetween]] — file-pruned, so an append/COW-upsert
  * delta scans just the new/rewritten files), folds it into the stored
  * aggregates (sum/count form an abelian group: inserts add, deletes
  * subtract, groups reaching count 0 drop), and commits the new view
  * content WITH the new watermark in one atomic manifest rename
  * ([[Versioned.replaceWithMark]]). A crash can never leave the data and
  * the watermark disagreeing, so refresh is exactly-once; re-running
  * against an unchanged source no-ops.
  *
  * Scale shape at 100 TB: the full recompute this replaces is a corpus
  * scan per refresh cadence; the incremental path is O(changed rows) +
  * O(view cardinality) per refresh — the view (group cardinality) is
  * small by construction, and the delta is batch-sized under streaming
  * ingest. One caveat inherited from CDF semantics: a pending EQUALITY
  * delete puts every older file back in scope (its mask is
  * content-defined), so keep churny sources compacted — the policy
  * [[Versioned.maintain]] already enforces.
  *
  * Floating-point note: the incrementally-folded SUM is the same abelian
  * fold Spark's own partial aggregation performs in a different order —
  * bit-exactness with a recompute is NOT guaranteed (it isn't between two
  * plain recomputes either); agreement is to double precision's ~1e-15
  * relative error.
  */
object IncrementalView {

  private val SumCol = "sum_value"
  private val CntCol = "n_rows"
  private val ValsCol = "n_vals"

  /** Output + internal names the fold owns; colliding user columns would
    * make the view self-ambiguous one refresh later (the merge()
    * reserved-name discipline).
    */
  private val Reserved =
    Set(SumCol, CntCol, ValsCol, "__dsum", "__dn", "__dvals", "_change_type")

  private def checkNames(groupCols: Seq[String], valueCol: String): Unit = {
    require(groupCols.nonEmpty, "empty group columns")
    val bad = (groupCols :+ valueCol).filter(Reserved.contains)
    require(bad.isEmpty,
      s"group/value columns collide with view columns: ${bad.mkString(",")}")
  }

  /** Materialize the view from the CURRENT source snapshot and record
    * that snapshot as the watermark. Returns the view's version.
    */
  def create(spark: SparkSession, source: String, viewPath: String,
      groupCols: Seq[String], valueCol: String): Int = {
    checkNames(groupCols, valueCol)
    val v = Versioned.currentVersion(source)
    require(v > 0, s"source $source has no snapshot")
    val df = aggregate(Versioned.read(spark, source, Some(v)),
      groupCols, valueCol)
    Versioned.replaceWithMark(df, viewPath, mark = v.toLong)
  }

  /** The source version the view currently reflects. */
  def syncedVersion(viewPath: String): Int =
    Versioned.markOf(viewPath).map(_.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"$viewPath is not an IncrementalView (no watermark)"))

  /** Fold the source's changes since the last refresh into the view.
    * Returns the view's (possibly unchanged) version.
    */
  def refresh(spark: SparkSession, source: String, viewPath: String,
      groupCols: Seq[String], valueCol: String): Int = {
    checkNames(groupCols, valueCol)
    val from = syncedVersion(viewPath)
    val to = Versioned.currentVersion(source)
    require(to >= from, s"source $source went backwards ($from -> $to); " +
      "recreate the view")
    if (to == from) return Versioned.currentVersion(viewPath)
    val cdf = Versioned.changesBetween(spark, source, from, to)
    val sign = when(col("_change_type") === "insert", lit(1))
      .otherwise(lit(-1))
    val delta = cdf.groupBy(groupCols.map(col): _*)
      .agg(sum(sign * col(valueCol)).as("__dsum"),
        sum(sign.cast("long")).as("__dn"),
        sum(when(col(valueCol).isNotNull, sign.cast("long"))
          .otherwise(lit(0L))).as("__dvals"))
    val old = Versioned.read(spark, viewPath)
    // null group values are real groups: join null-safely and coalesce
    // the key from whichever side has it
    val joined = old.alias("o").join(delta.alias("d"),
      groupCols.map(k => col(s"o.$k") <=> col(s"d.$k")).reduce(_ && _),
      "full_outer")
    val keys = groupCols.map(k =>
      coalesce(col(s"o.$k"), col(s"d.$k")).as(k))
    // the non-null count decides SUM's null, matching SQL: a group whose
    // live values are all NULL must show sum NULL, not the fold's 0.0
    // (a recompute — and any oracle — would say NULL)
    val nVals = coalesce(col(s"o.$ValsCol"), lit(0L)) +
      coalesce(col("d.__dvals"), lit(0L))
    val folded = joined.select(keys ++ Seq(
      when(nVals === 0L, lit(null))
        .otherwise(coalesce(col(s"o.$SumCol"), lit(0.0)) +
          coalesce(col("d.__dsum"), lit(0.0))).as(SumCol),
      (coalesce(col(s"o.$CntCol"), lit(0L)) +
        coalesce(col("d.__dn"), lit(0L))).as(CntCol),
      nVals.as(ValsCol)): _*)
      .filter(col(CntCol) > 0)
    Versioned.replaceWithMark(folded, viewPath, mark = to.toLong)
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(col(valueCol)).as(SumCol), count(lit(1)).as(CntCol),
        count(col(valueCol)).as(ValsCol))
}

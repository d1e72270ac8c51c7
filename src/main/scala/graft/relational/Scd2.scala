package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 dimension maintenance: [[build]] derives the full history
  * from a change log (q32's logic as a reusable, native-typed op), and
  * [[merge]] folds an APPEND-ONLY batch of new events into a PERSISTED
  * history without recomputing untouched users — the O(batch) incremental
  * face, completing the same build/append/search contract every index in
  * this repo follows (dedup index, ANN, PQ, BM25, DSIR).
  *
  * Persisted layout under `path`: `history` (user_id, state, valid_from,
  * valid_to, version, is_current — native timestamps) and `last`
  * (user_id, last_ts), the per-user high-watermark that makes the
  * append-only contract CHECKABLE: a batch event at or before its user's
  * last processed ts cannot be ordered against history that was already
  * collapsed, so it is dropped with a driver WARN + observed count (the
  * watermark convention of the streaming sinks, per-user instead of
  * per-batch).
  *
  * Scale shape: merge touches ONLY batch users — current rows arrive via
  * one left-semi join on the (small) batch-user set, the fold windows over
  * seed+batch rows (O(batch)), and the rewrite unions untouched history
  * through an anti-join. No full-log reprocessing anywhere; the full
  * rebuild exists once, at [[build]] time.
  */
object Scd2 {

  /** Full-history build: collapse each user's event stream to change
    * points, stamp validity intervals and versions. Both window passes
    * share one user_id Exchange (plan-checked in q32).
    */
  def build(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("_prev", lag(col("event_type"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("version"), col("valid_to").isNull.as("is_current"))
  }

  /** Write a fresh history + watermark table from a full change log. */
  def init(events: DataFrame, path: String): Unit = {
    build(events).write.mode("overwrite").parquet(s"$path/history")
    events.groupBy(col("user_id")).agg(max(col("ts")).as("last_ts"))
      .write.mode("overwrite").parquet(s"$path/last")
  }

  /** [[merge]] when the history exists, [[init]] otherwise — the form a
    * streaming sink's first micro-batch needs.
    */
  def mergeOrInit(spark: SparkSession, path: String,
      batch: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/history")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) merge(spark, path, batch) else init(batch, path)
  }

  /** Fold `batch` (new events, per-user later than the stored watermark)
    * into the persisted history. Equivalence contract: after merge, the
    * history equals [[build]] over the concatenated log (spec- and
    * oracle-pinned); stale rows (ts <= the user's last_ts) are dropped
    * with a WARN, never silently reordered into collapsed history.
    */
  def merge(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    val hist = spark.read.parquet(s"$path/history")
    val last = spark.read.parquet(s"$path/last")
    val users = batch.select(col("user_id")).distinct()
    // seed each touched user's fold with their stored current state: the
    // change-collapse then sees exactly the suffix the full rebuild would
    val cur = hist.filter(col("is_current"))
      .join(users, Seq("user_id"), "left_semi")
    // effective per-user watermark = max(last_ts, current valid_from):
    // last_ts alone is not crash-safe — a failure between the history
    // write and the last write leaves history AHEAD of the watermark,
    // and a watermark-only gate would fold the already-collapsed batch
    // back in as duplicate versions. Gating on the current row's own
    // valid_from too makes merge IDEMPOTENT under that torn state (the
    // replayed events at or before the current version are dropped; any
    // later no-change events refold against an equal seed state and emit
    // nothing) — normally valid_from <= last_ts and the extra gate is a
    // no-op.
    val gated = batch.join(last, Seq("user_id"), "left")
      .join(cur.select(col("user_id"), col("valid_from").as("_cvf")),
        Seq("user_id"), "left")
      .withColumn("_wm", greatest(
        coalesce(col("last_ts"), col("_cvf")),
        coalesce(col("_cvf"), col("last_ts"))))
    val stale = gated.filter(col("_wm").isNotNull &&
      col("ts") <= col("_wm")).count()
    if (stale > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"scd2 merge: dropped $stale stale event(s) at or before their " +
          "user's high-watermark — out-of-order arrivals cannot be " +
          "folded into collapsed history")
    val fresh = gated.filter(col("_wm").isNull ||
        col("ts") > col("_wm"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
    val seed = cur.select(col("user_id"), col("valid_from").as("ts"),
      lit(Long.MinValue).as("event_id"), col("state").as("event_type"),
      lit(0).as("_new"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val folded = seed.unionByName(fresh.withColumn("_new", lit(1)))
      .withColumn("_prev", lag(col("event_type"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("_k", row_number().over(w))
      .join(cur.select(col("user_id"), col("version").as("_base")),
        Seq("user_id"), "left")
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        // seed row keeps its stored version; appended rows extend it.
        // brand-new users have no base: versions start at 1 (= _k)
        when(col("_base").isNotNull, col("_base") + col("_k") - 1)
          .otherwise(col("_k")).cast("int").as("version"),
        col("valid_to").isNull.as("is_current"))
    // rewrite: untouched users + touched users' CLOSED rows pass through;
    // the fold re-emits each touched user's current row (possibly now
    // closed) and any new versions
    val untouched = hist.join(users, Seq("user_id"), "left_anti")
    val closedKept = hist.filter(!col("is_current"))
      .join(users, Seq("user_id"), "left_semi")
    val merged = untouched.unionByName(closedKept).unionByName(folded)
    val lastNew = fresh.groupBy(col("user_id"))
      .agg(max(col("ts")).as("_new_ts"))
    val lastMerged = last.join(lastNew, Seq("user_id"), "full")
      .select(col("user_id"),
        greatest(coalesce(col("last_ts"), col("_new_ts")),
          coalesce(col("_new_ts"), col("last_ts"))).as("last_ts"))
    // snapshot-before-write: both outputs read their own table
    val mergedOut = merged.localCheckpoint()
    val lastOut = lastMerged.localCheckpoint()
    mergedOut.write.mode("overwrite").parquet(s"$path/history")
    lastOut.write.mode("overwrite").parquet(s"$path/last")
  }
}

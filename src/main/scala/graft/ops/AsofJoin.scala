package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward (point-in-time) as-of join — the time-series join Spark's
  * built-in operators lack: for every left row, the single most recent
  * right row in the same key group with `right.ts <= left.ts`. The
  * standard primitive for "state as of event time" — price at trade
  * time, latest profile before a click, last metric before an alert.
  *
  * Deliberately NOT a range join: the naive `l JOIN r ON key AND r.ts <=
  * l.ts` explodes to the full per-key cross product before an argmax
  * prunes it — quadratic in group size, and the usual banding rewrite
  * trades that for tuning a band width. Instead this is the
  * union-tag-window plan: tag each input with a side marker, union them
  * into one timeline, and take a running `last(right-payload, ignoreNulls)`
  * window per key. ONE hash shuffle of |L|+|R| rows on the key + a
  * per-partition sort — the same cost shape as any windowed aggregation,
  * zero fan-out, no knobs. Key skew lands in the window sort, exactly
  * where a windowed aggregation over the same keys would put it.
  *
  * Tie semantics: at equal timestamps the right row sorts BEFORE the left
  * row (side tag is the secondary sort key), so a simultaneous right row
  * IS visible — the `>=` convention of DuckDB's ASOF JOIN and kdb's aj.
  * Left rows before the first right row keep nulls (left-join semantics).
  * Right rows must be unique per (keys, ts) for "the" match to be
  * well-defined — pre-aggregate (max_by) if they are not.
  */
object AsofJoin {

  /** @param payloadCols right-side columns carried to matched left rows,
    *                    emitted as `<outPrefix><name>`; the matched right
    *                    timestamp is always emitted as `<outPrefix><tsCol>`.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    val lrow = struct(left.columns.map(col).toIndexedSeq: _*)
    val rv = struct((tsCol +: payloadCols).map(col): _*)
    val lrowType = left.select(lrow).schema.head.dataType
    val rvType = right.select(rv).schema.head.dataType
    val l2 = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("_ts"), lit(1).as("_side"),
        lrow.as("_lrow"), lit(null).cast(rvType).as("_rv")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lrowType).as("_lrow"), rv.as("_rv")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l2.unionByName(r2)
      .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val outCols = left.columns.toIndexedSeq.map(c =>
      col("_lrow").getField(c).as(c)) ++
      (tsCol +: payloadCols).map(c =>
        col("_m").getField(c).as(s"$outPrefix$c"))
    merged.select(outCols: _*)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the same key group — "next state at or
    * after event time" (next scheduled maintenance after an alert, next
    * quote after an order). The mirror of [[asofBackward]]: same
    * union-tag-window plan, with the running window looking FORWARD
    * (`first(... ignoreNulls)` over currentRow..unboundedFollowing) and
    * the side tag flipped so a simultaneous right row sorts AFTER the
    * left row and is therefore inside its forward frame — `<=`-mirrored
    * `>=` semantics. Same single-shuffle cost shape and the same
    * unique-(keys, ts) right-side contract.
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    val lrow = struct(left.columns.map(col).toIndexedSeq: _*)
    val rv = struct((tsCol +: payloadCols).map(col): _*)
    val lrowType = left.select(lrow).schema.head.dataType
    val rvType = right.select(rv).schema.head.dataType
    val l2 = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("_ts"), lit(0).as("_side"),
        lrow.as("_lrow"), lit(null).cast(rvType).as("_rv")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("_ts"), lit(1).as("_side"),
        lit(null).cast(lrowType).as("_lrow"), rv.as("_rv")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val merged = l2.unionByName(r2)
      .withColumn("_m", first(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    val outCols = left.columns.toIndexedSeq.map(c =>
      col("_lrow").getField(c).as(c)) ++
      (tsCol +: payloadCols).map(c =>
        col("_m").getField(c).as(s"$outPrefix$c"))
    merged.select(outCols: _*)
  }

  /** Nearest as-of join: the single right row closest in time to each
    * left row, in either direction ("the reading nearest the event").
    * Composed from [[asofBackward]] and [[asofForward]] — two window
    * passes over the same key shuffle shape — picking the smaller
    * absolute time delta per row; exact ties prefer the BACKWARD
    * (at-or-before) match, the convention that never leaks the future
    * when both sides are equidistant. Null-safe: rows with a match in
    * only one direction take it; rows with none keep nulls.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    val bwd = asofBackward(left, right, keys, tsCol, payloadCols, "_bwd_")
    val fwd = asofForward(bwd, right, keys, tsCol, payloadCols, "_fwd_")
    // exact integer microsecond deltas — no float rounding near ties
    val dbwd = unix_micros(col(tsCol)) - unix_micros(col(s"_bwd_$tsCol"))
    val dfwd = unix_micros(col(s"_fwd_$tsCol")) - unix_micros(col(tsCol))
    val useBwd = col(s"_bwd_$tsCol").isNotNull &&
      (col(s"_fwd_$tsCol").isNull || dbwd <= dfwd)
    val outCols = left.columns.toIndexedSeq.map(col) ++
      (tsCol +: payloadCols).map(c =>
        when(useBwd, col(s"_bwd_$c")).otherwise(col(s"_fwd_$c"))
          .as(s"$outPrefix$c"))
    fwd.select(outCols: _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join — the inequality join Spark executes as a
  * broadcast-nested-loop (or worse, a cartesian) when written naively:
  * `points JOIN intervals ON key AND start <= ts AND ts <= end`. BNL is
  * O(|P|·|I|) per key and needs one side to fit in memory; at 100 TB
  * neither holds.
  *
  * The rewrite: quantize time into bands of `bandWidth` seconds. Each
  * interval explodes to the bands it overlaps (fan-out =
  * ceil(length/width) + 1, bounded and CHOSEN via the knob); each point
  * lands in exactly ONE band. The join becomes a hash equi-join on
  * (key, band) — shuffled, partitioned, AQE-skew-handled like any other —
  * followed by the exact residual predicate. No duplicate elimination is
  * needed: a point matches an interval in precisely the point's own band,
  * so each qualifying pair emerges exactly once.
  *
  * Pick `bandWidth` near the TYPICAL interval length: too small inflates
  * the interval fan-out (storage-side copies), too large inflates the
  * per-band candidate population the residual filter must discard. Both
  * degradations are linear and observable; there is no correctness knob.
  */
object RangeJoin {

  /** Join each `points` row (timestamp `tsCol`, seconds precision) to every
    * `intervals` row of the same `keys` whose `[startCol, endCol]` contains
    * it (inclusive ends). Interval columns are emitted prefixed with
    * `outPrefix` (every interval column except the keys).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      bandWidth: Long = 300L, outPrefix: String = "iv_"): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    def band(c: Column): Column = floor(unix_timestamp(c) / bandWidth)
    val ivCols = intervals.columns.toIndexedSeq.filterNot(keys.contains)
    val iv = intervals.select(
      keys.map(col) ++ ivCols.map(c => col(c).as(s"$outPrefix$c")) :+
        explode(sequence(band(col(startCol)),
          band(col(endCol)))).as("_band"): _*)
    points.withColumn("_band", band(col(tsCol)))
      .join(iv, keys :+ "_band")
      .filter(col(s"$outPrefix$startCol") <= col(tsCol) &&
        col(tsCol) <= col(s"$outPrefix$endCol"))
      .drop("_band")
  }
}

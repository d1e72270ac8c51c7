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
    *
    * Fan-out guard: an interval spanning more than `maxFanout` bands does
    * NOT explode — one degenerate year-long interval at bandWidth=300
    * would otherwise emit ~105k copies and skew its shuffle partition.
    * Over-long intervals instead take a broadcast residual join: they are
    * rare by the bandWidth-≈-typical-length contract, and each one matches
    * so many points that per-point band copies were never the right plan
    * for it anyway. The split is plan-level (no driver action); reversed
    * intervals (end < start) also land on the broadcast side, where the
    * residual predicate discards them without exploding a descending
    * band sequence. The broadcast side must stay driver-small — if MOST
    * intervals exceed maxFanout, bandWidth is mis-chosen (see above) and
    * the fix is a wider band, not a bigger cap.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      bandWidth: Long = 300L, outPrefix: String = "iv_",
      maxFanout: Int = 4096): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(maxFanout > 0, s"maxFanout must be positive, got $maxFanout")
    def band(c: Column): Column = floor(unix_timestamp(c) / bandWidth)
    val ivCols = intervals.columns.toIndexedSeq.filterNot(keys.contains)
    val prefixed = intervals.select(
      keys.map(col) ++ ivCols.map(c => col(c).as(s"$outPrefix$c")): _*)
    val nBands = band(col(s"$outPrefix$endCol")) -
      band(col(s"$outPrefix$startCol")) + 1
    val residual = (p: DataFrame) =>
      p.filter(col(s"$outPrefix$startCol") <= col(tsCol) &&
        col(tsCol) <= col(s"$outPrefix$endCol"))
    val iv = prefixed.filter(nBands.between(1, maxFanout))
      .withColumn("_band",
        explode(sequence(band(col(s"$outPrefix$startCol")),
          band(col(s"$outPrefix$endCol")))))
    val banded = residual(
      points.withColumn("_band", band(col(tsCol)))
        .join(iv, keys :+ "_band"))
      .drop("_band")
    val longIv = prefixed.filter(!nBands.between(1, maxFanout))
    val wide = residual(points.join(broadcast(longIv), keys))
    banded.unionByName(wide)
  }
}

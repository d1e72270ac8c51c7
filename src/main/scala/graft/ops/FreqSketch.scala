package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable heavy-hitters summaries (Misra–Gries), the FREQUENCY member
  * of the persisted-statistics family (q45/q46 cover cardinality via
  * HLL): a capacity-`m` summary holds at most `m` (key, counter) pairs,
  * any two summaries merge into another capacity-`m` summary (Agarwal et
  * al. 2012, "Mergeable Summaries", PODS), and the merged estimate for
  * every key is within n/(m+1) of its true count — so every key with
  * true frequency above n/(m+1) is guaranteed present. That bound is
  * what makes top-k over an UNBOUNDED key domain (tokens, URLs, user
  * agents) scale-safe: per-partition state is m entries regardless of
  * corpus size, where an exact groupBy-count carries the whole key
  * domain through the shuffle.
  *
  * Exact regime (the oracle gate's determinism argument, mirroring
  * q46's HLL coupon mode): while every partial summary's distinct-key
  * count stays ≤ m, no decrement ever fires, so each summary IS the
  * exact per-partition count map and merges are exact sums — the
  * registry's q55 row runs suppkey (≤ 1k distinct at every driver SF)
  * at m = 4096, deep inside that regime at any shard layout.
  *
  * The summary is a plain `map<string,bigint>` column: it persists to
  * parquet as data, so incremental maintenance is the house pattern —
  * a new data shard APPENDS one summary row; refreshing the top-k
  * re-reads summaries, never data ([[EventsStream.heavyHittersSink]]
  * is the per-trigger streaming face).
  */
object FreqSketch {

  type Summary = Map[String, Long]

  /** One MG update. Decrement-all is O(m) but fires at most n/(m+1)
    * times total, so the amortized per-row cost stays O(1).
    */
  private[ops] def addOne(b: Summary, k: String, m: Int): Summary =
    b.get(k) match {
      case Some(c) => b.updated(k, c + 1L)
      case None if b.size < m => b.updated(k, 1L)
      case None =>
        b.flatMap { case (key, c) =>
          if (c > 1L) Some(key -> (c - 1L)) else None
        }
    }

  /** Mergeable-summaries union: sum counters, then if over capacity
    * subtract the (m+1)-th largest counter from all and drop the
    * non-positive — the merged summary keeps the same n/(m+1) error
    * bound as a single-pass summary over the concatenated input.
    */
  private[ops] def mergeSummaries(a: Summary, b: Summary, m: Int): Summary = {
    val combined = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (combined.size <= m) combined
    else {
      val cut = combined.valuesIterator.toArray.sorted(
        Ordering[Long].reverse)(m)
      combined.flatMap { case (k, c) =>
        if (c > cut) Some(k -> (c - cut)) else None
      }
    }
  }

  private implicit val summaryEnc: Encoder[Summary] =
    ExpressionEncoder[Summary]()

  /** Build a summary from raw keys (null keys are skipped, matching
    * COUNT(key)'s null semantics).
    */
  private final class MgAgg(m: Int)
      extends Aggregator[String, Summary, Summary] {
    def zero: Summary = Map.empty
    def reduce(b: Summary, k: String): Summary =
      if (k == null) b else addOne(b, k, m)
    def merge(a: Summary, b: Summary): Summary = mergeSummaries(a, b, m)
    def finish(r: Summary): Summary = r
    def bufferEncoder: Encoder[Summary] = summaryEnc
    def outputEncoder: Encoder[Summary] = summaryEnc
  }

  /** Union already-built summaries (the read side of the persisted
    * layout; null rows — an all-null shard — contribute nothing).
    */
  private final class MgMergeAgg(m: Int)
      extends Aggregator[Summary, Summary, Summary] {
    def zero: Summary = Map.empty
    def reduce(b: Summary, s: Summary): Summary =
      if (s == null) b else mergeSummaries(b, s, m)
    def merge(a: Summary, b: Summary): Summary = mergeSummaries(a, b, m)
    def finish(r: Summary): Summary = r
    def bufferEncoder: Encoder[Summary] = summaryEnc
    def outputEncoder: Encoder[Summary] = summaryEnc
  }

  /** Aggregate raw string keys into a capacity-`m` MG summary column. */
  def misraGries(key: Column, m: Int): Column =
    udaf(new MgAgg(m)).apply(key)

  /** Union summary columns into one capacity-`m` summary. */
  def misraGriesMerge(summaries: Column, m: Int): Column =
    udaf(new MgMergeAgg(m)).apply(summaries)

  /** Explode a summary frame's `summaryCol` into ranked (key, est)
    * rows — deterministic cut: count desc, then key asc (ties at the
    * boundary resolve by key in engine and oracle alike).
    */
  def topK(summary: DataFrame, summaryCol: String, k: Int): DataFrame =
    summary.select(explode(map_entries(col(summaryCol))).as("e"))
      .select(col("e.key").as("key"), col("e.value").as("est"))
      .orderBy(col("est").desc, col("key"))
      .limit(k)
}

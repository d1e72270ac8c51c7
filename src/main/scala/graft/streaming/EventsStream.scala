package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingest path (SURVEY §2.10 extension — the reference
  * is strictly batch; this is the streaming face of the same event-table
  * operators, sharing semantics with the batch queries q12/q15 so results
  * can be cross-checked batch-vs-stream).
  */
object EventsStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionUpdate(user_id: Long, n_events: Long,
      start: java.sql.Timestamp, end: java.sql.Timestamp, closed: Boolean)

  /** Tumbling event-time windows with a watermark — the streaming twin of
    * q12_events_window. Late rows beyond 1 hour are dropped by the
    * watermark; state is bounded per (window, type).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming benchmark decontamination — the streaming face of
    * `ops.Curate.decontaminate`: incoming documents are flagged when they
    * share at least `minShared` distinct word-`shingleSize`-grams with the
    * STATIC eval gram set. The eval set is a benchmark (bounded by
    * construction), so it collects once at plan time and rides as a task
    * broadcast; the per-doc count is then row-local — a stateless map, so
    * the query runs in append mode with NO streaming aggregation state.
    * Output: (id, n_shared) for flagged docs, matching the batch
    * operator's schema (spec-pinned equivalence).
    */
  def decontaminateStream(docs: DataFrame, idCol: String, textCol: String,
      evalGrams: DataFrame, shingleSize: Int = 3,
      minShared: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = evalGrams.select(col("shingle").cast("string"))
      .as[String].collect().toSet
    val bc = spark.sparkContext.broadcast(grams)
    val n = shingleSize
    docs.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val w = text.split("\\s+")
        val seen = scala.collection.mutable.HashSet[String]()
        var i = 0
        while (i + n <= w.length) {
          val g = w.slice(i, i + n).mkString(" ")
          if (bc.value.contains(g)) seen += g
          i += 1
        }
        (id, seen.size.toLong)
      }
      .toDF("id", "n_shared")
      .filter(col("n_shared") >= minShared)
  }

  /** Streaming exact dedup — the streaming face of `ops.Dedup.exact`:
    * drop later copies of the same content hash, with a watermark bounding
    * the dedup state (`dropDuplicatesWithinWatermark`: state for a hash is
    * freed once its event time passes the watermark).
    */
  def dedupStream(docs: DataFrame, tsCol: String, contentCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", org.apache.spark.sql.functions.md5(col(contentCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Gap-based sessionization with custom state — the streaming twin of
    * q15_sessionize: a session closes once a later event arrives more than
    * `gapSeconds` after it. State is one (count, start, end) triple per user
    * (bounded); a production deployment adds an event-time timeout to flush
    * trailing sessions.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long, Long), SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[(Long, Long, Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var out = List.empty[SessionUpdate]
          var (n, start, end, _) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (n == 0) { n = 1; start = t; end = t }
            else if (t - end > gapSeconds * 1000) {
              out ::= SessionUpdate(userId, n, new java.sql.Timestamp(start),
                new java.sql.Timestamp(end), closed = true)
              n = 1; start = t; end = t
            } else { n += 1; end = math.max(end, t) }
          }
          state.update((n, start, end, 0L))
          out.reverseIterator
      }
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession

/** The streaming-ingest replay high-watermark that
  * `graft.streaming.DedupStream` persists alongside a built index
  * (`<indexPath>/stream_commit`, one max-committed batchId row).
  *
  * Rebuilding an index in place MUST remove the marker: a fresh streaming
  * query against the rebuilt index starts its batchIds back at 0, and a
  * stale marker would make every early batch look already-committed —
  * ANN/PQ batches dropped outright, dedup batches replayed read-only so
  * their signatures never append. The `build*Index` functions call
  * [[clear]] for exactly that reason (mirroring `Dedup.metaCache`
  * invalidation).
  *
  * Single-writer assumption: ONE streaming query owns an index path at a
  * time. Two queries sharing a path would clobber each other's marker
  * (last-writer-wins on the overwrite) and corrupt both replay guards.
  */
private[graft] object StreamCommitMarker {
  val DirName = "stream_commit"

  def path(indexPath: String): String =
    s"${indexPath.stripSuffix("/")}/$DirName"

  /** Delete the marker (no-op when absent). */
  def clear(spark: SparkSession, indexPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(indexPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}

package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.readStream.table("cat.ns.t")` — the STREAMING READ half of the
  * catalog table (the sink half is `writeStream.toTable`): a DSv2
  * [[MicroBatchStream]] whose offsets ARE the table's version numbers,
  * so a restart resumes from the engine checkpoint exactly where the
  * last batch committed and a batch's content replans deterministically
  * from the immutable manifests.
  *
  * Semantics are Delta's streaming-source contract (public prior art:
  * delta's DeltaSource): each APPEND commit's new files stream as one
  * batch of plain table rows — inserts only, at the scan's (pruned)
  * schema. A NON-append commit (COW rewrite, replace, delete — anything
  * that removes files or adds a delete mask) is not expressible as an
  * append stream: the stream REFUSES loudly at that version, unless
  * `.option("skipChangeCommits", true)` (Delta's option) tells it to
  * skip such commits' changes entirely. `.option("startingVersion", n)`
  * replays history from version n+1 (default: only commits after stream
  * start — the "new data only" contract; 0 = full replay). For a
  * row-level CDF stream (inserts AND deletes, `_change_type` tagged) use
  * `readStream.format("versioned-cdf")` instead
  * ([[graft.streaming.VersionedCdfSource]]).
  *
  * Scale shape: a trigger's planning cost is O(new files) from
  * driver-held manifests (zero file RPCs — sizes ride in the manifest),
  * and the read is Spark's own vectorized parquet over exactly the new
  * files ([[RowLevelBatch]]'s zero-RPC listing), so steady ingest
  * streams at O(delta) per trigger however large the table grows.
  */
private[sources] final class GraftMicroBatchStream(spark: SparkSession,
    table: String, req: StructType, tableSchema: StructType,
    options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private val skipChangeCommits: Boolean =
    options.getBoolean("skipChangeCommits", false)
  private val startingVersion: Option[Int] =
    Option(options.get("startingVersion")).map(_.toInt)

  override def initialOffset(): Offset =
    VersionOffset(startingVersion.getOrElse(
      Versioned.currentVersion(table)))

  override def latestOffset(): Offset =
    VersionOffset(Versioned.currentVersion(table))

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toInt)

  /** New data files of each version in (start, end], from manifests
    * alone; refuses (or skips) versions whose delta is not append-shaped.
    */
  private def newFiles(s: Int, e: Int): (Seq[String], Map[String, Long]) = {
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val sizes = scala.collection.mutable.Map.empty[String, Long]
    var prev: Option[(Set[String], Set[String])] = None // (files, deletes)
    for (v <- math.max(s, 0) to e; if v >= 1) {
      val snap = Versioned.streamSnapshot(spark, table, v)
      val (curFiles, curDeletes, curSizes) = snap
      prev match {
        case Some((pf, pd)) if v > s =>
          val removed = pf.diff(curFiles)
          val maskChanged = pd != curDeletes
          if (removed.nonEmpty || maskChanged) {
            if (!skipChangeCommits) throw new UnsupportedOperationException(
              s"readStream.table: version $v of $table is not an append " +
                "commit (files were rewritten/removed or a delete mask " +
                "changed). Streaming a mutating table needs either " +
                ".option(\"skipChangeCommits\", true) to ignore such " +
                "commits, or the row-level CDF stream " +
                "(readStream.format(\"versioned-cdf\"))")
            // skip this commit's changes entirely (Delta's
            // skipChangeCommits): nothing from v streams
          } else {
            val added = curFiles.diff(pf).toSeq.sorted
            files ++= added
            added.foreach(f => curSizes.get(f).foreach(sizes(f) = _))
          }
        case _ if v > s => // v == 1 with no predecessor: all files new
          val added = curFiles.toSeq.sorted
          files ++= added
          added.foreach(f => curSizes.get(f).foreach(sizes(f) = _))
        case _ => // v == s: baseline only
      }
      prev = Some((curFiles, curDeletes))
    }
    (files.toSeq, sizes.toMap)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    if (e <= s) return Array.empty
    val (files, sizes) = newFiles(s, e)
    if (files.isEmpty) return Array.empty
    new RowLevelBatch(spark, table, tableSchema,
      StructType(req.fields), wantsFile = false, sizes, files)
      .planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // partitions already carry their file; the factory only needs the
    // schema wiring — sizes were consumed at plan time
    new RowLevelBatch(spark, table, tableSchema,
      StructType(req.fields), wantsFile = false, Map.empty, Nil)
      .createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** A table version as a DSv2 stream offset. */
private[sources] final case class VersionOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

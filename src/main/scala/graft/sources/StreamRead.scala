package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
    options: CaseInsensitiveStringMap) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val skipChangeCommits: Boolean =
    options.getBoolean("skipChangeCommits", false)
  private val startingVersion: Option[Int] =
    Option(options.get("startingVersion")).map(_.toInt)
  /** ADMISSION CONTROL (the 100 TB catch-up story): a stream restarted
    * after downtime — or replaying history — must not plan its whole
    * backlog as ONE batch. `maxFilesPerTrigger` caps each batch by new
    * data files (Delta's option; surfaces through Spark's ReadMaxFiles
    * too), `maxVersionsPerTrigger` by commits. A batch always admits at
    * least one version, so progress is guaranteed.
    */
  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map(_.toInt)
  private val maxVersionsPerTrigger: Option[Int] =
    Option(options.get("maxVersionsPerTrigger")).map(_.toInt)

  /** Trigger.AvailableNow pins the catch-up TARGET at prepare time: the
    * run drains rate-limited batches up to this version, then stops —
    * commits landing mid-run wait for the next run.
    */
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(Versioned.currentVersion(table))

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset =
    VersionOffset(startingVersion.getOrElse(
      Versioned.currentVersion(table)))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def reportLatestOffset(): Offset =
    VersionOffset(Versioned.currentVersion(table))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].v
    val head = availableNowTarget
      .map(math.min(_, Versioned.currentVersion(table)))
      .getOrElse(Versioned.currentVersion(table))
    if (head <= s) return VersionOffset(s)
    val maxFiles = limit match {
      case mf: ReadMaxFiles => Some(mf.maxFiles)
      case _ => maxFilesPerTrigger
    }
    var e = s
    var files = 0
    var versions = 0
    var stop = false
    while (!stop && e < head) {
      val nNew = newFileCount(e + 1)
      // always admit the FIRST version (progress guarantee), then stop
      // once either budget is exhausted
      if (versions > 0 &&
          (maxFiles.exists(files + nNew > _) ||
            maxVersionsPerTrigger.exists(versions >= _))) stop = true
      else {
        e += 1; files += nNew; versions += 1
        if (maxFiles.exists(files >= _) ||
            maxVersionsPerTrigger.exists(versions >= _)) stop = true
      }
    }
    VersionOffset(e)
  }

  /** New data files version `v` added over `v-1` (manifest-only; the
    * parsed manifests cache, so rate-limit walks stay cheap).
    */
  private def newFileCount(v: Int): Int = {
    val (cur, _, _) = Versioned.streamSnapshot(spark, table, v)
    if (v == 1) cur.size
    else {
      val (prev, _, _) = Versioned.streamSnapshot(spark, table, v - 1)
      cur.diff(prev).size
    }
  }

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

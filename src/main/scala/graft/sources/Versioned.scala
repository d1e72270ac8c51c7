package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table with time travel — the Iceberg/Delta
  * core re-expressed minimally (public prior art: Iceberg's
  * manifest-per-snapshot design; Delta's transaction log): data files are
  * IMMUTABLE, each commit writes new files plus a new manifest listing
  * the snapshot's complete file set, and a reader pins a manifest — so
  * readers never see a half-written commit, time travel is "read an old
  * manifest", and compaction is just a new manifest over rewritten files
  * (old snapshots stay readable until expired).
  *
  * Scale shape: the manifest is O(files + committed batch ids), never
  * O(rows) — the only driver-side state is that list (the classic
  * index-read contract); data reads are ordinary distributed parquet
  * scans of the listed files. Commit atomicity is a single directory
  * rename of the manifest (write to `_tmp_v<N>`, rename to `v=<N>`); a
  * crash before the rename leaves the table at the previous snapshot,
  * and the torn data directory is cleared by the next writer (every
  * write path clears its target before writing — a half-written commit
  * can never brick subsequent commits).
  *
  * All manifest/commit/expire filesystem traffic goes through the Hadoop
  * `FileSystem` API resolved from the table path (the same idiom as
  * [[BloomIndex]] and `Maintenance.swapDir`), so the table runs wherever
  * Spark's Hadoop layer does. SUBSTRATE CONTRACT: rename-as-commit needs
  * a store with atomic directory rename under a single writer — local
  * FS and HDFS qualify; plain object stores (S3 without a rename layer)
  * would need a monotonic log-append commit instead and are out of
  * scope here.
  *
  * Exactly-once streaming ingest rides the same atomicity: committed
  * batch ids are ROWS IN THE MANIFEST (kind = "t"), so the dedup fact
  * commits in the same rename as the data it describes and is carried
  * forward by every later snapshot — including compaction, which
  * rewrites all file paths but preserves the txn set. (The earlier
  * design — a marker directory written after the rename — left a crash
  * window where a compaction before redelivery erased the evidence;
  * manifest-native txns have no such window.)
  *
  * Concurrent WRITERS are out of scope (single-writer, like a Delta
  * table without a lock service); concurrent READERS are always safe.
  */
object Versioned {

  private def manifestRoot(table: String) = s"$table/_manifests"
  private def manifestDir(table: String, v: Int) = s"${manifestRoot(table)}/v=$v"

  private def fsFor(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  private def listVersions(table: String, conf: Configuration): Seq[Int] = {
    val root = new Path(manifestRoot(table))
    val fs = fsFor(manifestRoot(table), conf)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt).sorted
  }

  /** Current snapshot number, or 0 if the table is empty. Resolves the
    * filesystem from the active session's Hadoop conf.
    */
  def currentVersion(table: String): Int =
    currentVersion(table, SparkSession.active.sparkContext.hadoopConfiguration)

  private def currentVersion(table: String, conf: Configuration): Int =
    listVersions(table, conf).lastOption.getOrElse(0)

  private def commitManifest(spark: SparkSession, table: String, v: Int,
      files: Seq[String], txns: Seq[Long]): Unit = {
    import spark.implicits._
    val tmp = s"${manifestRoot(table)}/_tmp_v$v"
    (files.map(("f", _)) ++ txns.map(t => ("t", t.toString)))
      .toDF("kind", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = fsFor(table, spark.sparkContext.hadoopConfiguration)
    val ok = fs.rename(new Path(tmp), new Path(manifestDir(table, v)))
    require(ok, s"manifest commit v$v failed (concurrent writer?)")
  }

  /** (data files sorted, committed batch ids) of snapshot `v`. */
  private def manifest(spark: SparkSession, table: String,
      v: Int): (Seq[String], Seq[Long]) = {
    import spark.implicits._
    val rows = spark.read.parquet(manifestDir(table, v))
      .as[(String, String)].collect()
    (rows.collect { case ("f", f) => f }.toSeq.sorted,
      rows.collect { case ("t", t) => t.toLong }.toSeq.sorted)
  }

  private def snapshotFiles(spark: SparkSession, table: String,
      v: Int): Seq[String] = manifest(spark, table, v)._1

  private def writeData(df: DataFrame, dataDir: String): Seq[String] = {
    // clear a torn prior attempt (data landed, manifest rename didn't) so
    // a crash can never permanently reject the version's data directory
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = fsFor(dataDir, conf)
    val p = new Path(dataDir)
    if (fs.exists(p)) fs.delete(p, true)
    df.write.mode("errorifexists").parquet(dataDir)
    df.sparkSession.read.parquet(dataDir).inputFiles.toSeq
  }

  /** Append `df` as a new snapshot; returns the new version number. */
  def append(df: DataFrame, table: String): Int = {
    val spark = df.sparkSession
    val v = currentVersion(table, spark.sparkContext.hadoopConfiguration) + 1
    val (prev, txns) = if (v == 1) (Seq.empty[String], Seq.empty[Long])
      else manifest(spark, table, v - 1)
    val added = writeData(df, s"$table/data/c=$v")
    commitManifest(spark, table, v, prev ++ added, txns)
    v
  }

  /** Exactly-once micro-batch append (the streaming face — see
    * `EventsStream.versionedSink`): a batch commits at most once, ever.
    * The committed-batch set rides IN the manifest, so the check and the
    * data share one atomic rename and survive compaction's path rewrite;
    * a torn prior attempt (data written, no manifest) is cleared and
    * rewritten. Returns the new version, or None if already committed.
    */
  def appendBatch(df: DataFrame, table: String, batchId: Long): Option[Int] = {
    val spark = df.sparkSession
    val v = currentVersion(table, spark.sparkContext.hadoopConfiguration)
    val (prev, txns) = if (v == 0) (Seq.empty[String], Seq.empty[Long])
      else manifest(spark, table, v)
    if (txns.contains(batchId)) return None
    val added = writeData(df, s"$table/data/b=$batchId")
    commitManifest(spark, table, v + 1, prev ++ added, txns :+ batchId)
    Some(v + 1)
  }

  /** Read snapshot `version` (default: latest). A snapshot whose manifest
    * lists zero data files reads as an EMPTY frame (no schema — the
    * manifest stores paths, not schemas), not an error.
    */
  def read(spark: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val v = version.getOrElse(currentVersion(table, conf))
    require(listVersions(table, conf).contains(v), s"no snapshot v=$v at $table")
    val files = snapshotFiles(spark, table, v)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Overwrite commit (Iceberg's REPLACE): the new snapshot's content is
    * EXACTLY `df` — no carry-forward of previous data files (txn ids do
    * carry, preserving streaming replay facts). Previous snapshots stay
    * readable until expired; this is the "full re-release" shape a
    * periodically re-curated corpus publishes, where [[append]] is the
    * incremental-release shape. Returns the new version.
    */
  def replace(df: DataFrame, table: String): Int = {
    val spark = df.sparkSession
    val cur = currentVersion(table, spark.sparkContext.hadoopConfiguration)
    val txns = if (cur == 0) Seq.empty[Long] else manifest(spark, table, cur)._2
    val v = cur + 1
    val added = writeData(df, s"$table/data/r=$v")
    commitManifest(spark, table, v, added, txns)
    v
  }

  /** Copy-on-write UPSERT (the Delta/Iceberg `MERGE INTO` shape): rows of
    * `updates` REPLACE current rows sharing their `keyCol` value; unseen
    * keys insert. Only the data files that CONTAIN a matched key are
    * rewritten — every other file carries forward into the new manifest
    * by reference, byte-untouched (file-level pruning, the manifest
    * analogue of zone-map skipping; pair it with key-clustered appends so
    * a key batch touches few files). Old snapshots still read the old
    * files: an upsert is just a new manifest like any other commit.
    *
    * Scale shape: one snapshot scan joined against the (broadcast)
    * update keys finds the touched files — a bounded driver list; the
    * rewrite reads ONLY those files. `updates` is assumed batch-sized
    * (the CDC/merge contract); a corpus-sized update is a rebuild, not a
    * merge. Returns the new version.
    */
  def upsert(updates: DataFrame, table: String, keyCol: String): Int = {
    import org.apache.spark.sql.functions._
    val spark = updates.sparkSession
    val cur = currentVersion(table, spark.sparkContext.hadoopConfiguration)
    if (cur == 0) return append(updates, table)
    val (files, txns) = manifest(spark, table, cur)
    val keys = updates.select(col(keyCol)).distinct()
    val touched = spark.read.parquet(files: _*)
      .select(col(keyCol), input_file_name().as("__f"))
      .join(broadcast(keys), Seq(keyCol))
      .select(col("__f")).distinct()
      .collect().map(_.getString(0)).toSet
    val carried = files.filterNot(touched)
    val v = cur + 1
    val survivors =
      if (touched.isEmpty) updates
      else spark.read.parquet(touched.toSeq: _*)
        .join(broadcast(keys), Seq(keyCol), "left_anti")
        .unionByName(updates)
    val added = writeData(survivors, s"$table/data/u=$v")
    commitManifest(spark, table, v, carried ++ added, txns)
    v
  }

  /** Copy-on-write DELETE: drop rows matching `pred`; only files holding
    * a matching row are rewritten, the rest carry forward by reference
    * (same machinery as [[upsert]]). Returns the new version — a no-op
    * commit is skipped (returns the current version) when nothing
    * matches.
    */
  def delete(spark: SparkSession, table: String,
      pred: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions._
    val cur = currentVersion(table, spark.sparkContext.hadoopConfiguration)
    require(cur > 0, s"no snapshot to delete from at $table")
    val (files, txns) = manifest(spark, table, cur)
    val touched = spark.read.parquet(files: _*)
      .filter(pred)
      .select(input_file_name().as("__f")).distinct()
      .collect().map(_.getString(0)).toSet
    if (touched.isEmpty) return cur
    val carried = files.filterNot(touched)
    val v = cur + 1
    // NULL-pred rows are NOT matches: keep them (coalesce, so the
    // survivor filter is the exact complement of the touch filter)
    val survivors = spark.read.parquet(touched.toSeq: _*)
      .filter(!coalesce(pred, lit(false)))
    val added = writeData(survivors, s"$table/data/u=$v")
    commitManifest(spark, table, v, carried ++ added, txns)
    v
  }

  /** Rewrite the CURRENT snapshot into `numFiles` files as a new snapshot
    * — content-invisible (committed batch ids carried forward); old
    * snapshots keep reading the old files. No-op (returns 0) on an empty
    * table.
    */
  def compact(spark: SparkSession, table: String, numFiles: Int): Int = {
    val cur = currentVersion(table, spark.sparkContext.hadoopConfiguration)
    if (cur == 0) return 0
    val txns = manifest(spark, table, cur)._2
    val v = cur + 1
    val added = writeData(read(spark, table).repartition(numFiles),
      s"$table/data/c=$v")
    commitManifest(spark, table, v, added, txns)
    v
  }

  /** Drop all snapshots but the last `keepLast`, then delete every data
    * file no surviving manifest references.
    */
  def expire(spark: SparkSession, table: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"keepLast=$keepLast")
    val conf = spark.sparkContext.hadoopConfiguration
    val vs = listVersions(table, conf)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepLast))
    if (drop.isEmpty) return
    val live = keep.flatMap(snapshotFiles(spark, table, _)).toSet
    val fs = fsFor(table, conf)
    drop.foreach { v =>
      val dead = snapshotFiles(spark, table, v).filterNot(live)
      dead.foreach(f => fs.delete(new Path(f), false))
      fs.delete(new Path(manifestDir(table, v)), true)
    }
  }
}

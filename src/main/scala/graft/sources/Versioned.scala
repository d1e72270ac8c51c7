package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet table with time travel — the Iceberg/Delta
  * core re-expressed minimally (public prior art: Iceberg's
  * manifest-per-snapshot design; Delta's transaction log): data files are
  * IMMUTABLE, each commit writes new files plus a new manifest listing
  * the snapshot's complete file set, and a reader pins a manifest — so
  * readers never see a half-written commit, time travel is "read an old
  * manifest", and compaction is just a new manifest over rewritten files
  * (old snapshots stay readable until expired).
  *
  * Scale shape: the manifest is O(files), never O(rows) — the only
  * driver-side state is the file list (the classic index-read contract);
  * data reads are ordinary distributed parquet scans of the listed
  * files. Commit atomicity is a single directory rename of the manifest
  * (write to `_tmp_v<N>`, rename to `v=<N>`); a crash before the rename
  * leaves the table at the previous snapshot.
  *
  * Concurrent WRITERS are out of scope (single-writer, like a Delta
  * table without a lock service); concurrent READERS are always safe.
  */
object Versioned {

  private def manifestRoot(table: String) = s"$table/_manifests"
  private def manifestDir(table: String, v: Int) = s"${manifestRoot(table)}/v=$v"

  private def listVersions(table: String): Seq[Int] = {
    val root = new java.io.File(manifestRoot(table))
    if (!root.isDirectory) Seq.empty
    else root.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toInt).sorted
  }

  /** Current snapshot number, or 0 if the table is empty. */
  def currentVersion(table: String): Int =
    listVersions(table).lastOption.getOrElse(0)

  private def commitManifest(spark: SparkSession, table: String, v: Int,
      files: Seq[String]): Unit = {
    import spark.implicits._
    val tmp = s"${manifestRoot(table)}/_tmp_v$v"
    files.toDF("file").coalesce(1).write.mode("overwrite").parquet(tmp)
    val ok = new java.io.File(tmp).renameTo(new java.io.File(manifestDir(table, v)))
    require(ok, s"manifest commit v$v failed (concurrent writer?)")
  }

  private def snapshotFiles(spark: SparkSession, table: String,
      v: Int): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(manifestDir(table, v)).as[String].collect().toSeq.sorted
  }

  /** Append `df` as a new snapshot; returns the new version number. */
  def append(df: DataFrame, table: String): Int = {
    val spark = df.sparkSession
    val v = currentVersion(table) + 1
    val dataDir = s"$table/data/c=$v"
    df.write.mode("errorifexists").parquet(dataDir)
    val added = spark.read.parquet(dataDir).inputFiles.toSeq
    val prev = if (v == 1) Seq.empty
      else snapshotFiles(spark, table, v - 1)
    commitManifest(spark, table, v, prev ++ added)
    v
  }

  private def txnDir(table: String, batchId: Long) =
    s"$table/_txns/b=$batchId"

  /** Exactly-once micro-batch append (the streaming face — see
    * `EventsStream.versionedSink`): a batch commits at most once, ever.
    * Dedup is two-layered: a `_txns/b=<id>` marker written AFTER the
    * manifest rename (survives compaction, which rewrites file paths),
    * and a current-manifest containment check on the batch's own data
    * directory (closes the crash window between rename and marker —
    * nothing can compact in between because the writer died). A torn
    * prior attempt (data written, no manifest) is cleared and rewritten.
    * Returns the new version, or None if the batch was already in.
    */
  def appendBatch(df: DataFrame, table: String, batchId: Long): Option[Int] = {
    val spark = df.sparkSession
    val v = currentVersion(table)
    val prev = if (v == 0) Seq.empty[String] else snapshotFiles(spark, table, v)
    if (new java.io.File(txnDir(table, batchId)).exists() ||
        prev.exists(_.contains(s"/b=$batchId/"))) return None
    val dataDir = s"$table/data/b=$batchId"
    deleteRecursively(new java.io.File(dataDir))
    df.write.mode("errorifexists").parquet(dataDir)
    val added = spark.read.parquet(dataDir).inputFiles.toSeq
    commitManifest(spark, table, v + 1, prev ++ added)
    new java.io.File(txnDir(table, batchId)).mkdirs()
    Some(v + 1)
  }

  /** Read snapshot `version` (default: latest). */
  def read(spark: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(table))
    require(listVersions(table).contains(v), s"no snapshot v=$v at $table")
    spark.read.parquet(snapshotFiles(spark, table, v): _*)
  }

  /** Rewrite the CURRENT snapshot into `numFiles` files as a new snapshot
    * — content-invisible; old snapshots keep reading the old files.
    */
  def compact(spark: SparkSession, table: String, numFiles: Int): Int = {
    val v = currentVersion(table) + 1
    val cur = read(spark, table)
    val dataDir = s"$table/data/c=$v"
    cur.repartition(numFiles).write.mode("errorifexists").parquet(dataDir)
    commitManifest(spark, table, v,
      spark.read.parquet(dataDir).inputFiles.toSeq)
    v
  }

  /** Drop all snapshots but the last `keepLast`, then delete every data
    * file no surviving manifest references.
    */
  def expire(spark: SparkSession, table: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"keepLast=$keepLast")
    val vs = listVersions(table)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepLast))
    if (drop.isEmpty) return
    val live = keep.flatMap(snapshotFiles(spark, table, _)).toSet
    drop.foreach { v =>
      val dead = snapshotFiles(spark, table, v).filterNot(live)
      dead.foreach(f =>
        new java.io.File(new java.net.URI(f).getPath).delete())
      deleteRecursively(new java.io.File(manifestDir(table, v)))
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generalized per-file min/max (zone-map) sidecar for RANGE predicates —
  * the most common data-skipping primitive in lakehouse engines (public
  * prior art: Netezza zone maps; ORC/Parquet footer stats; Delta/Iceberg
  * file-level column stats). [[BloomIndex]] buys equality locality,
  * [[ZOrder]] buys 2-D box locality; this buys 1-D range locality on any
  * set of numeric columns: a `BETWEEN` probe opens only the files whose
  * [min, max] interval intersects the probe interval. (The reference's
  * analogue is its sorted k-mer table enabling the merge skip,
  * `src/sra/comparekmertables.cpp:473-582` — sort so that a range touches
  * a contiguous, identifiable slice of the storage.)
  *
  * Everything is plain SQL expressions — no UDF:
  *   - build: rows are RANGE-partitioned on the leading stat column
  *     (disjoint per-file ranges — without clustering, every file spans
  *     the whole domain and a zone map prunes nothing), then ONE
  *     map-side-combined aggregation computes per-(file, column) min/max.
  *     Stats are stored as DOUBLE (exact for longs up to 2^53 — the
  *     driver corpus keys — and for all floats; a wider-than-life bound
  *     would still only cost I/O, never rows). The stat-column set rides
  *     as ROWS of the sidecar, and the sidecar lands via rename-swap:
  *     stats and column set commit in ONE atomic move.
  *   - probe: a file is a candidate unless `max < lo || min > hi`
  *     (null stats — all-null or uncovered column — never prune). The
  *     sidecar is O(files × stat cols) — a TABLE, scanned distributed;
  *     the driver sees only matched file names (the index-read contract).
  *   - read: only candidate files are opened, with the exact range
  *     predicate re-applied — false positives cost I/O, never
  *     correctness.
  *
  * Crash window (append's data landed, sidecar rows not yet appended) is
  * closed on the READ side exactly like [[BloomIndex]]: any table file
  * the sidecar does not cover is an unconditional candidate — a torn
  * append degrades to extra I/O, never to a missed row. Single-writer,
  * like the other persisted indexes.
  */
object ZoneMap {

  private def sidecarPath(table: String) = table.stripSuffix("/") + "_zonemap"

  /** Per-(file, column) min/max rows for `files` restricted to `statCols`. */
  private def statsOf(spark: SparkSession, files: Seq[String],
      statCols: Seq[String]): DataFrame = {
    val base = spark.read.parquet(files: _*)
      .select(input_file_name().as("f") +:
        statCols.map(c => col(c).cast("double").as(c)): _*)
    statCols.map { c =>
      base.groupBy(col("f"))
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .select(col("f"), lit(c).as("c"), col("lo"), col("hi"))
    }.reduce(_ unionAll _)
  }

  /** Rewrite `df` range-clustered on `statCols.head` into `nFiles` files
    * at `tablePath` and build the per-file min/max sidecar over all
    * `statCols` (numeric columns).
    */
  def build(df: DataFrame, statCols: Seq[String], tablePath: String,
      nFiles: Int = 16): Unit = {
    require(statCols.nonEmpty, "need at least one stat column")
    val spark = df.sparkSession
    df.repartitionByRange(nFiles, col(statCols.head))
      .write.mode("overwrite").parquet(tablePath)
    val files = spark.read.parquet(tablePath).inputFiles.toSeq
    val tmp = sidecarPath(tablePath) + "__new"
    statsOf(spark, files, statCols)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(sidecarPath(tablePath))
    if (fs.exists(target))
      graft.ops.Maintenance.swapParquetDir(spark, sidecarPath(tablePath), tmp)
    else
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), target),
        s"sidecar commit failed at $target")
  }

  /** Build the sidecar over an EXISTING table layout WITHOUT rewriting
    * the data — the "index what's already there" path: stats reflect
    * whatever clustering the layout has (hash, range, Z-order, none).
    * Pair with [[graft.sources.ZOrder]]: a Morton-clustered layout gives
    * every file a tight bounding box in BOTH dims, so the 2-D
    * [[readBox]] probe below prunes like the classic
    * cluster-plus-stats lakehouse pairing. Same rename-commit as
    * [[build]].
    */
  def buildStatsOnly(spark: SparkSession, tablePath: String,
      statCols: Seq[String]): Unit = {
    require(statCols.nonEmpty, "need at least one stat column")
    val files = spark.read.parquet(tablePath).inputFiles.toSeq
    val tmp = sidecarPath(tablePath) + "__new"
    statsOf(spark, files, statCols)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(sidecarPath(tablePath))
    if (fs.exists(target))
      graft.ops.Maintenance.swapParquetDir(spark, sidecarPath(tablePath), tmp)
    else
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), target),
        s"sidecar commit failed at $target")
  }

  /** Recompute the sidecar over the table's LIVE files at the PINNED
    * column set — the maintenance pass that purges stale rows (replayed
    * streaming batches leave rows for replaced part names; they are
    * read-safe but accumulate bytes). Rename-swapped like every sidecar
    * commit; probes before/after are identical by construction.
    */
  def rebuildStats(spark: SparkSession, tablePath: String): Unit = {
    import spark.implicits._
    val pinned = spark.read.parquet(sidecarPath(tablePath))
      .select(col("c")).distinct().as[String].collect().toSeq.sorted
    buildStatsOnly(spark, tablePath, pinned)
  }

  /** Files that may contain a row inside EVERY interval of `box` — the
    * N-dimensional probe: a file is admitted iff each dimension's stats
    * are missing/null OR intersect that dimension's interval.
    * Per-dimension sidecar probes; the candidate sets intersect on the
    * driver (file lists, bounded). Uncovered files are in every
    * dimension's set, so the fallback survives the intersection.
    */
  def candidateFilesBox(spark: SparkSession, tablePath: String,
      box: Seq[(String, Double, Double)]): Seq[String] = {
    require(box.nonEmpty, "empty box")
    box.map { case (c, lo, hi) => candidateFiles(spark, tablePath, c, lo, hi) }
      .map(_.toSet).reduce(_ intersect _).toSeq.sorted
  }

  /** Box read through the index: open only files admitted by every
    * dimension, re-apply the exact conjunctive range predicate.
    */
  def readBox(spark: SparkSession, tablePath: String,
      box: Seq[(String, Double, Double)]): DataFrame = {
    val files = candidateFilesBox(spark, tablePath, box)
    val base =
      if (files.isEmpty) spark.read.parquet(tablePath).limit(0)
      else spark.read.parquet(files: _*)
    box.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.filter(rangePred(base, c, lo, hi))
    }
  }

  /** Append a batch: new range-clustered files plus their stats rows at
    * the PINNED stat-column set (read from the sidecar — an append can
    * never fork the column set). Per-file ranges of different commits may
    * overlap (each commit clusters only its own rows); probes stay exact
    * because stats are per-file.
    */
  def append(df: DataFrame, tablePath: String, nFiles: Int = 4): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val statCols = spark.read.parquet(sidecarPath(tablePath))
      .select(col("c")).distinct().as[String].collect().toSeq.sorted
    val before = spark.read.parquet(tablePath).inputFiles.toSet
    df.repartitionByRange(nFiles, col(statCols.head))
      .write.mode("append").parquet(tablePath)
    val newFiles = spark.read.parquet(tablePath).inputFiles.toSet -- before
    if (newFiles.isEmpty) return // empty batch: nothing to index, no-op
    statsOf(spark, newFiles.toSeq, statCols)
      .write.mode("append").parquet(sidecarPath(tablePath))
  }

  /** Files that may contain rows with `c` in [lo, hi] (exact w.r.t. the
    * table: every true container returned; false positives possible).
    * Null stats never prune; files the sidecar does not cover — a torn
    * append's crash window — are unconditional candidates. STALE sidecar
    * rows (files a redelivered [[appendBatch]] replaced — new part names,
    * old rows left behind) are dropped by intersecting with the table's
    * LIVE file set, so they cost sidecar bytes, never a failed read.
    */
  def candidateFiles(spark: SparkSession, tablePath: String,
      c: String, lo: Double, hi: Double): Seq[String] = {
    import spark.implicits._
    val live = spark.read.parquet(tablePath).inputFiles.toSet
    val sidecar = spark.read.parquet(sidecarPath(tablePath))
    val matched = sidecar.filter(col("c") === c)
      .filter(!(col("hi") < lit(lo) || col("lo") > lit(hi)) ||
        col("lo").isNull || col("hi").isNull)
      .select(col("f")).distinct().as[String].collect().toSet
      .intersect(live)
    val coveredByCol = sidecar.filter(col("c") === c)
      .select(col("f")).distinct().as[String].collect().toSet
    val uncovered = live.filterNot(coveredByCol).toSeq
    (matched ++ uncovered).toSeq.distinct.sorted
  }

  /** Micro-batch append into a DETERMINISTIC per-batch directory — the
    * streaming face (see `EventsStream.zonemapSink`). A redelivered batch
    * CLEARS its own directory first and rewrites, so data rows commit
    * exactly once per batch id; the replaced files' sidecar rows go stale
    * (new part names) and are neutralized on the read side
    * ([[candidateFiles]]'s live-set intersection). Crash windows: data
    * landed / stats missing → uncovered-file fallback (extra I/O, exact
    * results); stats landed / marker missing → the sink redelivers, which
    * lands here again — clear + rewrite, still exactly once on data.
    * Bootstraps the sidecar (pinning `statCols`) when this is the
    * table's first commit; otherwise the pinned column set wins.
    */
  def appendBatch(df: DataFrame, tablePath: String, batchId: Long,
      statCols: Seq[String], nFiles: Int = 4): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val side = new org.apache.hadoop.fs.Path(sidecarPath(tablePath))
    val fs = root.getFileSystem(conf)
    val pinned =
      if (fs.exists(side))
        spark.read.parquet(sidecarPath(tablePath))
          .select(col("c")).distinct().as[String].collect().toSeq.sorted
      else statCols
    require(pinned.nonEmpty, "need at least one stat column")
    // redelivery / torn prior attempt: remove this batch's staged dir and
    // any already-moved `b<id>_` files, then rewrite — data rows commit
    // exactly once per batch id (the table stays FLAT: batch part files
    // are renamed in with a deterministic prefix, never nested dirs that
    // partition discovery would misread as a column)
    val prefix = s"b${batchId}_"
    val stage = new org.apache.hadoop.fs.Path(
      s"${tablePath.stripSuffix("/")}__stage_b$batchId")
    if (fs.exists(stage)) fs.delete(stage, true)
    if (fs.exists(root))
      fs.listStatus(root).filter(_.getPath.getName.startsWith(prefix))
        .foreach(s => fs.delete(s.getPath, false))
    else fs.mkdirs(root)
    df.repartitionByRange(nFiles, col(pinned.head))
      .write.mode("errorifexists").parquet(stage.toString)
    val moved = fs.listStatus(stage)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val dst = new org.apache.hadoop.fs.Path(root,
          prefix + s.getPath.getName)
        require(fs.rename(s.getPath, dst), s"could not move ${s.getPath}")
        dst.toString
      }.toSeq
    fs.delete(stage, true)
    if (moved.isEmpty) return
    // read the moved files back so sidecar `f` values match
    // input_file_name()'s URI form exactly
    val finalFiles = spark.read.parquet(moved: _*).inputFiles.toSeq
    if (fs.exists(side))
      statsOf(spark, finalFiles, pinned)
        .write.mode("append").parquet(sidecarPath(tablePath))
    else {
      // first commit: sidecar lands whole via rename (the build idiom)
      val tmp = sidecarPath(tablePath) + "__new"
      statsOf(spark, finalFiles, pinned)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), side),
        s"sidecar commit failed at $side")
    }
  }

  /** The residual range predicate in the COLUMN'S NATIVE type where the
    * double bounds are losslessly expressible — a naive
    * `cast(col AS double) BETWEEN lo AND hi` blocks parquet predicate
    * pushdown (Catalyst does not unwrap long→double casts), silently
    * losing row-group skipping inside the candidate files. Integral
    * columns tighten to [ceil(lo), floor(hi)] (the identical row set for
    * |values| < 2^53 — the sidecar's own exactness domain); double
    * columns compare directly; anything else keeps the cast (correct,
    * scan-filtered above the scan).
    */
  private def rangePred(df: DataFrame, c: String, lo: Double,
      hi: Double): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        col(c) >= math.ceil(lo).toLong && col(c) <= math.floor(hi).toLong
      case DoubleType => col(c) >= lo && col(c) <= hi
      case _ => col(c).cast("double").between(lo, hi)
    }
  }

  /** Range read through the index: open only candidate files, re-apply
    * the exact BETWEEN filter (pushed into the scan — see [[rangePred]]).
    * Content-identical to the full-scan filter by construction.
    */
  def readRange(spark: SparkSession, tablePath: String,
      c: String, lo: Double, hi: Double): DataFrame = {
    val files = candidateFiles(spark, tablePath, c, lo, hi)
    if (files.isEmpty)
      spark.read.parquet(tablePath).limit(0)
    else {
      val base = spark.read.parquet(files: _*)
      base.filter(rangePred(base, c, lo, hi))
    }
  }
}

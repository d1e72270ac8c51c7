package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionSpec, PartitionedFile, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.{Filter => VFilter}
import org.apache.spark.sql.{sources => vf}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** SQL `UPDATE` / `MERGE INTO` / arbitrary-predicate `DELETE FROM` for
  * [[Versioned]] tables through Spark's OWN row-level operation seam
  * (`SupportsRowLevelOperations` — the DSv2 integration Iceberg publishes;
  * Spark 4's `RewriteUpdateTable`/`RewriteMergeIntoTable`/
  * `RewriteDeleteFromTable` turn the statement into a group-based
  * `ReplaceData` plan): the engine plans ONE distributed query producing
  * the affected groups' replacement rows, and the connector supplies
  *
  *  - the GROUP-GRANULAR scan ([[GraftRowLevelOperation.newScanBuilder]]):
  *    the statement's condition arrives as pushed V1 filters which are
  *    used ONLY to prune whole files via the snapshot's manifest stats
  *    (the [[ManifestFileIndex]] may-match admission — never to drop
  *    individual rows, which would corrupt a group replacement); rows of
  *    admitted files stream through Spark's own vectorized V2 parquet
  *    batch over a ZERO-RPC file index synthesized from manifest-recorded
  *    lengths;
  *  - the distributed V2 write ([[GraftBatchWrite]]): executors write
  *    replacement parquet task files straight into the staged commit
  *    directory (speculative/retried attempts prune by commit message),
  *    and the driver-side commit swaps affected files for replacement
  *    files in ONE optimistic manifest commit with the house
  *    copy-on-write validation ([[Versioned.commitReplaceGroups]] — same
  *    rebase/abort rules as the API `merge`).
  *
  * Scale shape: rewrite cost is O(may-match files) for UPDATE/DELETE
  * (the condition prunes at plan time from driver-held stats) and
  * O(table) for MERGE (no static condition; runtime group filtering is
  * a documented follow-up), never a driver-side row loop; the write is
  * executor-parallel with no driver materialization. Translatable DELETE
  * predicates never reach this path at all — Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` routes them back to
  * [[VersionedSparkTable.deleteWhere]]'s stats-proven metadata tier.
  *
  * Contract notes: requires a delete-free snapshot (pending MOR masks
  * cannot be applied inside a file-granular scan — `compact` first;
  * refusal is loud at planning) and commits at basis+1 with the standard
  * validate-then-retry (concurrent appends rebase; a concurrent rewrite
  * of an affected file aborts).
  */
private[sources] final class GraftRowLevelOperation(table: String,
    basisVersion: Int, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** Files the operation's scan admitted (full manifest spellings) —
    * the GROUPS the write replaces. Set when the scan builds; read by
    * [[GraftBatchWrite.commit]].
    */
  @volatile private[sources] var affectedFiles: Option[Seq[String]] = None

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-versioned $cmd (copy-on-write group replacement)"

  /** The affected-group identity column, Iceberg-style: the rewrite
    * plan carries each row's source file so (a) the engine's runtime
    * group filtering can narrow the rewrite to files that actually hold
    * matching rows, and (b) Spark's DataAndMetadataWritingSparkTask
    * applies the row/metadata projections before rows reach the writer.
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(RowLevelFile.Name))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns {
      private def spark = SparkSession.active
      private val (files, stats, sizes, tableSchema, nDeletes) =
        Versioned.rowLevelSnapshot(spark, table, basisVersion)
      private var req: StructType = tableSchema
      private var pushed: Array[VFilter] = Array.empty

      /** The statement condition, recorded for GROUP pruning only; every
        * filter returns as residual — a row-level scan must yield every
        * row of every admitted file (non-matching rows of an affected
        * file are the copied-over half of the group replacement).
        */
      override def pushFilters(filters: Array[VFilter]): Array[VFilter] = {
        pushed = filters
        filters
      }
      override def pushedFilters(): Array[VFilter] = pushed
      override def pruneColumns(r: StructType): Unit = { req = r }

      override def build(): Scan = {
        require(Versioned.columnMapping(spark, table,
          Some(basisVersion)).isEmpty,
          s"SQL $cmd on $table: a column rename is pending (the " +
            "file-granular rewrite scan has no name-epoch coalesce) — " +
            "run Versioned.compact first to materialize it")
        // pending MOR masks apply INSIDE the group scan (bounded driver
        // collection — the rewrite then retires them for the affected
        // files, whose replacements jump past every pending sequence);
        // only an over-cap mask still demands a compact first
        val masks: Option[Versioned.DeleteMasks] =
          if (nDeletes == 0) None
          else Versioned.collectMasks(spark, table, basisVersion) match {
            case Some(mk) => if (mk.isEmpty) None else Some(mk)
            case None => throw new UnsupportedOperationException(
              s"SQL $cmd on $table: the pending merge-on-read delete " +
                "mask exceeds graft.versioned.maxBroadcastKeys rows — " +
                "run Versioned.compact first")
          }
        val statAdmitted = RowLevelFilters.admittedFiles(spark, table,
          files, stats, sizes, pushed.toSeq, tableSchema)
        affectedFiles = Some(statAdmitted)
        new RowLevelScan(GraftRowLevelOperation.this, spark, table,
          tableSchema, req, sizes, files.size, statAdmitted, masks)
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def description(): String =
          s"graft-versioned $cmd group-replace write"
        override def toBatch: BatchWrite =
          new GraftBatchWrite(table, basisVersion,
            GraftRowLevelOperation.this, info.schema())
      }
    }
}

/** The `_file` metadata column ([[VersionedSparkTable.metadataColumns]]):
  * each row's source data file, spelled exactly as the manifest records
  * it. The row-level rewrite requires it; plain SQL can also select it.
  */
private[sources] object RowLevelFile {
  val Name = "_file"
}

/** The row-level operation's scan: reads EVERY row of the admitted files
  * (one input partition per file) through Spark's own V2 parquet reader
  * over a zero-RPC listing, appending the `_file` metadata column as a
  * per-partition constant (columnar when the inner reader is columnar —
  * a [[ConstantColumnVector]], the engine's own metadata-column shape).
  * Implements the engine's runtime group filtering
  * ([[SupportsRuntimeV2Filtering]] on `_file`): the optimizer runs the
  * statement's condition as a separate pruned scan, collects the
  * matching files, and narrows THIS scan — and with it the affected
  * group set the write replaces — to files that truly hold matching
  * rows. MERGE (no static condition) prunes this way too.
  */
private[sources] final class RowLevelScan(op: GraftRowLevelOperation,
    spark: SparkSession, table: String, tableSchema: StructType,
    req: StructType, sizes: Map[String, Long], totalFiles: Int,
    statAdmitted: Seq[String],
    masks: Option[Versioned.DeleteMasks] = None)
    extends Scan with SupportsRuntimeV2Filtering {

  @volatile private var admitted: Seq[String] = statAdmitted

  /** Data columns requested, in request order, `_file` handled apart. */
  private val dataReq: StructType =
    StructType(req.fields.filter(_.name != RowLevelFile.Name))
  private val wantsFile: Boolean =
    req.fields.exists(_.name == RowLevelFile.Name)
  require(!wantsFile || req.fields.last.name == RowLevelFile.Name,
    s"row-level scan expects ${RowLevelFile.Name} as the LAST requested " +
      s"column, got ${req.fieldNames.mkString(",")}")

  override def readSchema(): StructType = req

  override def description(): String =
    s"graft-rowlevel-scan ${op.command()} ${admitted.size}/$totalFiles files"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(RowLevelFile.Name))

  /** Runtime group filtering: the engine hands IN/= predicates over
    * `_file` collected from the matching-rows subquery. Comparison is by
    * the house /data/ suffix so URI-spelling drift between the probe
    * scan's `_file` values and the manifest's cannot widen or lose
    * groups; an unrecognized predicate shape narrows nothing
    * (conservative — extra groups rewrite to identical content).
    */
  override def filter(predicates: Array[Predicate]): Unit = {
    val parsed = predicates.toSeq.flatMap(RowLevelFilters.fileSet)
    if (parsed.nonEmpty) {
      val keep = parsed.map(_.map(Versioned.dataSuffix).toSet)
        .reduce(_ intersect _)
      admitted = admitted.filter(f => keep(Versioned.dataSuffix(f)))
      op.affectedFiles = Some(admitted)
    }
  }

  override def toBatch: Batch = {
    val current = admitted
    if (current.isEmpty) RowLevelEmptyBatch
    else new RowLevelBatch(spark, table, tableSchema, dataReq, wantsFile,
      sizes, current, masks = masks)
  }
}

/** The PLAIN catalog read as a true DSv2 BATCH scan (delete-free
  * snapshots — the common, compaction-maintained case; MOR-masked
  * snapshots keep the V1 anti-join bridge): manifest-stats file
  * admission from the pushed predicates at plan time, Spark's own
  * vectorized V2 parquet reader over a zero-RPC listing with the
  * residual predicates pushed into row-group/page pruning, `_file`
  * metadata rows on request, and — the reason this path exists as V2 —
  * working join-planning statistics: `SupportsReportStatistics` is
  * invisible through the `V1ScanWrapper` bridge, so only a native batch
  * scan lets a small versioned dimension auto-broadcast.
  */
private[sources] class VersionedBatchScan(spark: SparkSession,
    table: String, version: Int, req: StructType,
    pushed: Array[VFilter], files: Seq[String], stats: Seq[ZoneMap.Stat],
    sizes: Map[String, Long], tableSchema: StructType,
    masks: Option[Versioned.DeleteMasks] = None)
    extends Scan with SupportsReportStatistics {

  private val admitted: Seq[String] = RowLevelFilters.admittedFiles(
    spark, table, files, stats, sizes, pushed.toSeq, tableSchema)

  private val dataReq: StructType =
    StructType(req.fields.filter(_.name != RowLevelFile.Name))
  private val wantsFile: Boolean =
    req.fields.exists(_.name == RowLevelFile.Name)
  require(!wantsFile || req.fields.last.name == RowLevelFile.Name,
    s"expected ${RowLevelFile.Name} as the LAST requested column, got " +
      req.fieldNames.mkString(","))

  override def readSchema(): StructType = req

  override def description(): String =
    s"graft-versioned-scan v=$version ${admitted.size}/${files.size} " +
      s"files, PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch =
    if (admitted.isEmpty) RowLevelEmptyBatch
    else new RowLevelBatch(spark, table, tableSchema, dataReq, wantsFile,
      sizes, admitted,
      // position masks need a skip-free sequential read — withhold the
      // parquet-level row pruning then (manifest admission already cut
      // the files; the engine re-applies the residual predicate anyway)
      rowFilters = if (masks.exists(_.hasPos)) Array.empty else pushed,
      masks = masks)

  /** Manifest-derived size/row estimates ([[Versioned.snapshotStats]]):
    * facets the manifest cannot answer soundly report empty — never an
    * undercount (which could broadcast a huge table).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val (bytes, rows) = Versioned.snapshotStats(spark, table, version)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        bytes.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty)
      override def numRows(): java.util.OptionalLong =
        rows.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty)
    }
  }
}

/** One input partition per admitted file (the copy-on-write rewrite
  * granularity — a group is a file; for PLAIN reads it is also the
  * natural task unit of a size-bounded lake layout), reader factory
  * delegated to the V2 parquet stack and wrapped with the `_file`
  * constant append.
  *
  * `rowFilters` push into the inner parquet builder for ROW-GROUP/page
  * pruning — legal ONLY for plain reads (the engine re-applies the full
  * residual above); a row-level operation's scan must pass none (group
  * semantics forbid dropping rows).
  */
private[sources] final class RowLevelBatch(spark: SparkSession,
    table: String, tableSchema: StructType, dataReq: StructType,
    wantsFile: Boolean, sizes: Map[String, Long], admitted: Seq[String],
    rowFilters: Array[VFilter] = Array.empty,
    masks: Option[Versioned.DeleteMasks] = None)
    extends Batch {

  private def statusOf(f: String): FileStatus = {
    val p = new Path(f)
    sizes.get(f)
      .map(len => new FileStatus(len, false, 1, 128L << 20, 0L, p))
      .getOrElse(p.getFileSystem(
        spark.sparkContext.hadoopConfiguration).getFileStatus(p))
  }

  override def planInputPartitions(): Array[InputPartition] =
    admitted.zipWithIndex.map { case (f, i) =>
      val st = statusOf(f)
      FilePartition(i, Array(PartitionedFile(InternalRow.empty,
        SparkPath.fromPathString(f), 0L, st.getLen, Array.empty,
        st.getModificationTime, st.getLen,
        Map.empty))): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val statuses = admitted.map(statusOf)
    val idx = new ListedFileIndex(spark, statuses)
    // asNullable: the manifest schema can carry non-null fields (e.g. a
    // column born from literals), but files from BEFORE an additive
    // evolution lack the column entirely — the reader must null-fill,
    // not demand it (spark.read coerces user schemas the same way)
    def nullable(s: StructType): StructType =
      StructType(s.fields.map(_.copy(nullable = true)))
    val readerSchema = nullable(tableSchema)
    // pending MOR masks apply INSIDE the scan: the inner read widens to
    // cover every mask key column (appended at the END so data ordinals
    // stay stable), the masking wrapper filters and projects back
    val extraKeys = masks.map(_.eqKeyCols).getOrElse(Nil)
      .filterNot(dataReq.fieldNames.contains)
    val missing = extraKeys.filterNot(tableSchema.fieldNames.contains)
    require(missing.isEmpty,
      s"delete-mask key column(s) not in $table's schema: " +
        missing.mkString(", "))
    val innerReq = nullable(StructType(
      dataReq.fields ++ extraKeys.map(tableSchema(_))))
    val sb = ParquetScanBuilder(spark, idx, readerSchema, readerSchema,
      CaseInsensitiveStringMap.empty())
    // POSITION masks identify rows by file row index, which only a
    // skip-free sequential read preserves — callers already withhold
    // rowFilters when position masks exist; this is the backstop
    require(rowFilters.isEmpty || !masks.exists(_.hasPos),
      "row filters cannot combine with position-delete masks")
    if (rowFilters.nonEmpty)
      sb.pushFilters(
        rowFilters.toSeq.flatMap(RowLevelFilters.toCatalyst(_, readerSchema)))
    sb.pruneColumns(innerReq)
    val raw = sb.build().toBatch.createReaderFactory()
    val inner = masks match {
      case Some(mk) if !mk.isEmpty =>
        new MaskingReaderFactory(raw, mk, innerReq, dataReq.size)
      case _ => raw
    }
    if (!wantsFile) inner
    else new FileTaggingReaderFactory(inner, dataReq.size)
  }
}

/** A scan over zero admitted files (the condition provably matches no
  * file): no partitions, so no groups are affected and the commit
  * no-ops.
  */
private[sources] object RowLevelEmptyBatch extends Batch {
  override def planInputPartitions(): Array[InputPartition] = Array.empty
  override def createReaderFactory(): PartitionReaderFactory =
    (_: InputPartition) => throw new IllegalStateException(
      "empty row-level scan has no partitions to read")
}

/** Applies pending merge-on-read delete masks INSIDE the V2 scan
  * ([[Versioned.DeleteMasks]], collected bounded on the driver): per
  * partition (one file), the applicable masks are those with a LATER
  * commit sequence than the file ([[Versioned.seqOfPath]] — the MOR
  * ordering rule); equality masks drop rows whose key tuple is in the
  * collected set (a NULL key component matches nothing — SQL equality),
  * position masks drop rows by their sequential index in the file
  * (exact because the read is skip-free and single-file per partition).
  * Surviving rows project back to the requested data columns (mask key
  * columns ride as TRAILING extras in the inner read). Row-path only —
  * the masked read is the degraded between-compactions state; compact
  * returns the table to the vectorized path.
  */
private[sources] final class MaskingReaderFactory(
    inner: PartitionReaderFactory, masks: Versioned.DeleteMasks,
    innerSchema: StructType, nDataCols: Int)
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition match {
      case fp: FilePartition =>
        require(fp.files.length == 1,
          s"masked partitions are single-file; got ${fp.files.length}")
        fp.files.head.filePath.toString
      case other => throw new IllegalStateException(
        s"unexpected partition type ${other.getClass.getName}")
    }
    val seq = Versioned.seqOfPath(file)
    val suffix = Versioned.dataSuffix(file)
    // applicable = committed AFTER this file (strict — a commit's own
    // delete file must not mask its own data files)
    val eqApp = masks.eq.filter(_.seq > seq).map { m =>
      (m.keyCols.map(innerSchema.fieldIndex).toArray, m.keys)
    }
    val posApp: java.util.HashSet[Long] = {
      val s = new java.util.HashSet[Long]()
      masks.pos.filter(_.seq > seq)
        .flatMap(_.positions.get(suffix)).flatten.foreach(s.add)
      s
    }
    val types = innerSchema.fields.map(_.dataType)
    val in = inner.createReader(partition)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      private var rowIdx: Long = -1L
      private val out = new GenericInternalRow(nDataCols)

      private def masked(r: InternalRow, idx: Long): Boolean = {
        if (!posApp.isEmpty && posApp.contains(idx)) return true
        eqApp.exists { case (ords, keys) =>
          var i = 0
          var nullKey = false
          val tuple = new Array[Any](ords.length)
          while (i < ords.length && !nullKey) {
            if (r.isNullAt(ords(i))) nullKey = true
            else tuple(i) = Versioned.maskKeyComponent(
              r.get(ords(i), types(ords(i))))
            i += 1
          }
          !nullKey && keys.contains(tuple.toSeq)
        }
      }

      override def next(): Boolean = {
        while (in.next()) {
          val r = in.get()
          rowIdx += 1
          if (!masked(r, rowIdx)) { cur = r; return true }
        }
        false
      }

      override def get(): InternalRow = {
        var i = 0
        while (i < nDataCols) {
          out.update(i,
            if (cur.isNullAt(i)) null else cur.get(i, types(i)))
          i += 1
        }
        out
      }

      override def close(): Unit = in.close()
    }
  }
}

/** Appends the partition's file path as a trailing constant `_file`
  * column — [[ConstantColumnVector]] on the columnar path (keeping the
  * vectorized parquet reader), a reused [[JoinedRow]] on the row path.
  * Partitions are single-file by construction, so the constant is exact.
  */
private[sources] final class FileTaggingReaderFactory(
    inner: PartitionReaderFactory, nDataCols: Int)
    extends PartitionReaderFactory {

  private def fileOf(partition: InputPartition): UTF8String =
    partition match {
      case fp: FilePartition =>
        require(fp.files.length == 1,
          s"row-level partitions are single-file; got ${fp.files.length}")
        UTF8String.fromString(fp.files.head.filePath.toString)
      case other => throw new IllegalStateException(
        s"unexpected partition type ${other.getClass.getName}")
    }

  override def supportColumnarReads(partition: InputPartition): Boolean =
    inner.supportColumnarReads(partition)

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val in = inner.createReader(partition)
    val fileRow =
      new GenericInternalRow(Array[Any](fileOf(partition)))
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      override def next(): Boolean = in.next()
      override def get(): InternalRow = joined(in.get(), fileRow)
      override def close(): Unit = in.close()
    }
  }

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val in = inner.createColumnarReader(partition)
    val path = fileOf(partition)
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = in.next()
      override def get(): ColumnarBatch = {
        val b = in.get()
        val fileCol = new ConstantColumnVector(b.numRows(), StringType)
        fileCol.setUtf8String(path)
        val cols = (0 until nDataCols).map(b.column).toArray :+
          (fileCol: ColumnVector)
        new ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = in.close()
    }
  }
}

/** The distributed replacement write: each task writes one parquet file
  * into the staged commit directory via Spark's own
  * [[ParquetWriteSupport]] (the exact writer `df.write.parquet` uses, so
  * byte-level format conventions match the rest of the table); the
  * driver commit prunes uncommitted attempt debris, then swaps the
  * affected files for the replacements through
  * [[Versioned.commitReplaceGroups]].
  */
private[sources] final class GraftBatchWrite(table: String,
    basisVersion: Int, op: GraftRowLevelOperation, writeSchema: StructType)
    extends BatchWrite {

  private def spark = SparkSession.active
  private val uid = Versioned.rowLevelUid()
  private val stagingDir =
    Versioned.rowLevelStagingDir(table, uid, basisVersion + 1)

  private def hadoopConf = spark.sparkContext.hadoopConfiguration

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new RowLevelWriterFactory(stagingDir,
      new SerializableHadoopConf(
        RowLevelWriteSupport.writerConf(spark, writeSchema)))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.toSeq
      .collect { case RowLevelCommitMessage(Some(p)) => p }
    val affected = op.affectedFiles.getOrElse(
      throw new IllegalStateException(
        "row-level write committed before its scan planned"))
    val fs = new Path(stagingDir).getFileSystem(hadoopConf)
    val staging = new Path(stagingDir)
    if (fs.exists(staging)) {
      // speculative / retried task attempts leave extra files; only the
      // ones named by commit messages belong to the snapshot
      val keep = committed.map(p => new Path(p).getName).toSet
      fs.listStatus(staging)
        .filter(s => s.isFile && !keep(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    }
    if (affected.isEmpty && committed.isEmpty) {
      // condition matched no file and produced no rows: mint no version
      fs.delete(staging, true)
      return
    }
    Versioned.commitReplaceGroups(spark, table, basisVersion, affected,
      uid, committed, what = s"sql-${op.command()}")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val staging = new Path(stagingDir)
    val fs = staging.getFileSystem(hadoopConf)
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

/** Executor-writer configuration shared by the batch (row-level) and
  * streaming sinks: Spark's own [[ParquetWriteSupport]], with the keys
  * its `init`/`SparkToParquetSchemaConverter` read bare (no default)
  * mirrored from the session — exactly what prepareWrite does.
  */
private[sources] object RowLevelWriteSupport {
  def writerConf(spark: SparkSession,
      writeSchema: StructType): Configuration = {
    val conf = spark.sessionState.newHadoopConf()
    conf.set("parquet.write.support.class",
      classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(writeSchema, conf)
    val sc = spark.sessionState.conf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sc.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sc.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sc.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sc.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    conf.set("parquet.compression",
      spark.conf.get("spark.sql.parquet.compression.codec", "snappy"))
    conf
  }
}

/** DYNAMIC partition overwrite as a true V2 batch write (Spark's
  * `OverwritePartitionsDynamic` has NO V1 fallback seam): executors
  * write task parquet files into the staged commit directory — the
  * [[GraftBatchWrite]] machinery — and the driver commit swaps exactly
  * the partitions present in the written data
  * ([[Versioned.commitDynamicOverwrite]]). An empty write replaces no
  * partitions and mints no version (dynamic-mode semantics).
  */
private[sources] final class GraftDynamicOverwriteWrite(table: String,
    basisVersion: Int, writeSchema: StructType) extends BatchWrite {

  private def spark = SparkSession.active
  private val uid = Versioned.rowLevelUid()
  private val stagingDir =
    Versioned.rowLevelStagingDir(table, uid, basisVersion + 1)
  private def hadoopConf = spark.sparkContext.hadoopConfiguration

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new RowLevelWriterFactory(stagingDir,
      new SerializableHadoopConf(
        RowLevelWriteSupport.writerConf(spark, writeSchema)))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.toSeq
      .collect { case RowLevelCommitMessage(Some(p)) => p }
    val staging = new Path(stagingDir)
    val fs = staging.getFileSystem(hadoopConf)
    if (fs.exists(staging)) {
      // prune speculative / retried attempt debris before adoption
      val keep = committed.map(p => new Path(p).getName).toSet
      fs.listStatus(staging)
        .filter(s => s.isFile && !keep(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    }
    if (committed.isEmpty) { // nothing written: no partitions replaced
      if (fs.exists(staging)) fs.delete(staging, true)
      return
    }
    Versioned.commitDynamicOverwrite(spark, table, basisVersion, uid,
      committed, writeSchema)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val staging = new Path(stagingDir)
    val fs = staging.getFileSystem(hadoopConf)
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

/** The STREAMING sink half of the catalog table (`df.writeStream
  * .toTable("cat.ns.t")`): each trigger's executors write parquet task
  * files into an epoch-scoped staging directory, and the driver commit
  * adopts them as ONE exactly-once snapshot
  * ([[Versioned.commitStreamEpoch]] — the epoch id rides the manifest
  * txn list, so a redelivered epoch no-ops and reclaims its staging;
  * an empty epoch mints no version). Append output mode only — the
  * versioned table IS the changelog, Complete-mode truncation is
  * `replace` territory.
  */
private[sources] final class GraftStreamingWrite(table: String,
    writeSchema: StructType, queryId: String) extends
    org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private def spark = SparkSession.active
  private val uid = Versioned.rowLevelUid()

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory =
    new RowLevelStreamingWriterFactory(table, uid,
      new SerializableHadoopConf(
        RowLevelWriteSupport.writerConf(spark, writeSchema)))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.toSeq
      .collect { case RowLevelCommitMessage(Some(p)) => p }
    // speculative / zombie task attempts leave extra files; only the
    // ones commit messages name belong to the snapshot (the batch
    // write's pruning discipline — adoption then canonicalizes against
    // the cleaned listing)
    val staging = new Path(Versioned.streamStagingDir(table, uid, epochId))
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(staging)) {
      val keep = committed.map(p => new Path(p).getName).toSet
      fs.listStatus(staging)
        .filter(s => s.isFile && !keep(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    }
    Versioned.commitStreamEpoch(spark, table, uid, queryId, epochId,
      committed, writeSchema)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val staging = new Path(Versioned.streamStagingDir(table, uid, epochId))
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

private[sources] final class RowLevelStreamingWriterFactory(table: String,
    uid: String, conf: SerializableHadoopConf) extends
    org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new RowLevelDataWriter(
      Versioned.streamStagingDir(table, uid, epochId),
      partitionId, taskId, conf.value)
}

private[sources] final case class RowLevelCommitMessage(path: Option[String])
    extends WriterCommitMessage

private[sources] final class RowLevelWriterFactory(stagingDir: String,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new RowLevelDataWriter(stagingDir, partitionId, taskId, conf.value)
}

/** One task's parquet writer, opened LAZILY on the first row so empty
  * partitions emit no file at all (a group replacement that deletes
  * every row of the affected files then commits zero files — the
  * metadata-drop shape).
  */
private[sources] final class RowLevelDataWriter(dir: String, pid: Int,
    tid: Long, conf: Configuration) extends DataWriter[InternalRow] {

  private var writer: ParquetOutputWriter = _
  private var path: String = _

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      path = f"$dir/part-$pid%05d-$tid.parquet"
      val attempt = new TaskAttemptID(
        new TaskID(new JobID("graft-rowlevel", 0), TaskType.MAP, pid),
        (tid % Int.MaxValue).toInt)
      writer = new ParquetOutputWriter(path,
        new TaskAttemptContextImpl(conf, attempt))
    }
    writer.write(row)
  }

  /** Metadata-bearing write (the group-replace task shape): the `_file`
    * metadata identifies the row's SOURCE group, which the driver-side
    * commit already tracks wholesale — the data row is all that lands.
    */
  override def write(metadata: InternalRow, row: InternalRow): Unit =
    write(row)

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    RowLevelCommitMessage(Option(path))
  }

  override def abort(): Unit = if (writer != null) {
    writer.close()
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, false)
  }

  override def close(): Unit = ()
}

/** Hadoop `Configuration` is not Serializable; ship it Writable-style
  * (the standard Spark idiom) to the executor-side writers.
  */
private[sources] final class SerializableHadoopConf(
    @transient private var conf: Configuration) extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** V1 `sources.Filter` → catalyst expression for MANIFEST-STATS FILE
  * ADMISSION only (never row evaluation): the result feeds
  * [[SkipIndexBase]]'s conservative may-match translation, so dropping
  * an untranslatable shape is always safe — it only admits more files.
  * AND keeps whichever side translates (intersection semantics); OR
  * needs both sides or nothing (a one-sided OR would under-admit).
  */
private[sources] object RowLevelFilters {

  /** Manifest-stats may-match admission shared by the row-level
    * operation scan and the plain [[VersionedBatchScan]] — ONE
    * translation site, so rewrites and reads can never prune
    * differently. Untranslatable conjuncts admit everything they touch
    * (the conservative house contract).
    */
  def admittedFiles(spark: SparkSession, table: String,
      files: Seq[String], stats: Seq[ZoneMap.Stat],
      sizes: Map[String, Long], pushed: Seq[VFilter],
      schema: StructType): Seq[String] = {
    val exprs = pushed.flatMap(toCatalyst(_, schema))
    if (files.isEmpty) Nil
    else if (exprs.isEmpty) files
    else {
      val idx = new ManifestFileIndex(spark, table, files, stats, sizes)
      val ok = idx.listFiles(Nil, exprs).flatMap(_.files)
        .map(st => Versioned.dataSuffix(st.getPath.toString)).toSet
      files.filter(f => ok(Versioned.dataSuffix(f)))
    }
  }

  /** The file set a runtime `_file` group-filter predicate names:
    * `Some(files)` when the predicate is EXACTLY "_file ∈ files" (IN or
    * equality over string literals — possibly EMPTY: a condition that
    * matched no row at all narrows the rewrite to zero groups, turning
    * an unprunable no-match statement into a version-free no-op);
    * `Some(Nil)` for ALWAYS_FALSE; `None` for any other shape — the
    * caller must not narrow on what it cannot read exactly.
    */
  def fileSet(p: Predicate): Option[Seq[String]] = {
    val kids = p.children().toSeq
    val (refs, rest) = kids.partition(_.isInstanceOf[NamedReference])
    val refsFile = refs.exists {
      case r: NamedReference =>
        r.fieldNames.sameElements(Array(RowLevelFile.Name))
      case _ => false
    }
    p.name() match {
      case "ALWAYS_FALSE" => Some(Nil)
      case "IN" | "=" if refsFile && refs.size == 1 =>
        val lits = rest.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.dataType == StringType && l.value != null =>
            l.value.toString
        }
        if (lits.size == rest.size) Some(lits) else None
      case _ => None
    }
  }

  private def attr(name: String,
      schema: StructType): Option[ce.AttributeReference] =
    if (name.contains(".") || name.contains("`")) None
    else schema.find(_.name == name)
      .map(f => ce.AttributeReference(f.name, f.dataType, nullable = true)())

  private def lit(v: Any): Option[ce.Literal] =
    scala.util.Try(ce.Literal(v)).toOption

  def toCatalyst(f: VFilter, schema: StructType): Option[ce.Expression] = {
    def bin(a: String, v: Any,
        mk: (ce.Expression, ce.Expression) => ce.Expression) =
      for (ar <- attr(a, schema); l <- lit(v)) yield mk(ar, l)
    f match {
      case vf.EqualTo(a, v) => bin(a, v, ce.EqualTo(_, _))
      case vf.EqualNullSafe(a, v) if v != null =>
        bin(a, v, ce.EqualNullSafe(_, _))
      case vf.GreaterThan(a, v) => bin(a, v, ce.GreaterThan(_, _))
      case vf.GreaterThanOrEqual(a, v) =>
        bin(a, v, ce.GreaterThanOrEqual(_, _))
      case vf.LessThan(a, v) => bin(a, v, ce.LessThan(_, _))
      case vf.LessThanOrEqual(a, v) => bin(a, v, ce.LessThanOrEqual(_, _))
      case vf.In(a, vs) =>
        val lits = vs.toSeq.map(lit)
        if (lits.exists(_.isEmpty)) None
        else attr(a, schema).map(ar => ce.In(ar, lits.map(_.get)))
      case vf.IsNull(a) => attr(a, schema).map(ce.IsNull)
      case vf.IsNotNull(a) => attr(a, schema).map(ce.IsNotNull)
      case vf.StringStartsWith(a, p) =>
        for (ar <- attr(a, schema); l <- lit(p))
          yield ce.StartsWith(ar, l)
      case vf.And(l, r) =>
        (toCatalyst(l, schema), toCatalyst(r, schema)) match {
          case (Some(le), Some(re)) => Some(ce.And(le, re))
          case (Some(le), None) => Some(le)
          case (None, Some(re)) => Some(re)
          case _ => None
        }
      case vf.Or(l, r) =>
        for (le <- toCatalyst(l, schema); re <- toCatalyst(r, schema))
          yield ce.Or(le, re)
      case _ => None
    }
  }
}

/** A [[PartitioningAwareFileIndex]] whose listing IS the given statuses —
  * the row-level scan synthesizes them from manifest-recorded byte
  * lengths, so planning the inner parquet batch costs ZERO filesystem
  * RPCs (the [[ManifestFileIndex]] contract, carried into the V2 scan
  * stack). `allFiles()` resolves root paths against
  * `leafDirToChildrenFiles` by QUALIFIED path, so every status is
  * qualified up front and the roots are the files' parent directories.
  */
private[sources] final class ListedFileIndex(spark: SparkSession,
    statuses0: Seq[FileStatus])
    extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  private val statuses: Seq[FileStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    statuses0.map { s =>
      val q = s.getPath.getFileSystem(conf).makeQualified(s.getPath)
      new FileStatus(s.getLen, false, s.getReplication, s.getBlockSize,
        s.getModificationTime, q)
    }
  }

  override def rootPaths: Seq[Path] =
    statuses.map(_.getPath.getParent).distinct

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override protected def leafFiles
      : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m.put(s.getPath, s))
    m
  }
  override protected def leafDirToChildrenFiles
      : Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).map { case (d, fs) =>
      d -> fs.toArray }
  override def refresh(): Unit = ()
}

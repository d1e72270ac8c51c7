package graft.sources

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** [[Versioned]] tables as a Spark SQL CATALOG (DataSource V2
  * TableCatalog — the same integration seam Iceberg and Delta publish):
  * register once per session,
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.lake.warehouse", "/data/lake")
  * }}}
  *
  * and every table under the warehouse root is plain SQL:
  * `CREATE TABLE lake.ns.t (…)`, `INSERT INTO lake.ns.t SELECT …`,
  * `INSERT OVERWRITE`, `DELETE FROM lake.ns.t WHERE …`, `SELECT … FROM
  * lake.ns.t VERSION AS OF 3` (numbers, or TAG names from
  * [[Versioned.tag]]) and `TIMESTAMP AS OF …` — each statement mapping
  * onto the corresponding commit/read primitive, so SQL writers get the
  * same optimistic commit-retry, manifest atomicity, and time-travel
  * guarantees as API writers, and SQL readers get manifest-stats file
  * skipping ([[Versioned.readForScan]]) with zero plan-time stat RPCs.
  *
  * Execution bridges through the V1 fallback seam (`V1Scan` /
  * `V1Write` — the JDBC connector's pattern): the scan hands Spark a
  * relation whose inner plan IS the pruning snapshot read with the
  * pushed predicates applied (so [[ManifestFileIndex]] admission fires
  * at plan time), while the engine re-applies the full residual
  * predicate above it — pushdown stays pure I/O savings. Writes reject
  * on a time-travel load; DELETE refuses (loudly, via `canDeleteWhere`)
  * any predicate [[SqlBridge]] cannot translate EXACTLY.
  *
  * Namespaces are directories under the warehouse root; a table is any
  * directory holding a `_manifests` child. ALTER TABLE is out of scope
  * (schema evolution happens additively at commit time instead —
  * [[Versioned]]'s mergeSchemas contract).
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with StagingTableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var initWarehouse: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initWarehouse = Option(options.get("warehouse"))
    require(initWarehouse.isDefined || spark.conf
      .getOption(s"spark.sql.catalog.$name.warehouse").isDefined,
      s"catalog $name requires spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** The warehouse root, re-read from the SESSION conf on every call
    * (falling back to the init-time option): Spark caches one catalog
    * instance per name for the session's lifetime, so resolving the
    * root lazily keeps `spark.conf.set(...warehouse, newDir)` honest
    * instead of silently pinning the first value forever.
    */
  private def warehouse: String =
    spark.conf.getOption(s"spark.sql.catalog.$catalogName.warehouse")
      .orElse(initWarehouse)
      .getOrElse(throw new IllegalStateException(
        s"catalog $catalogName has no warehouse configured"))

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirOf(parts: Seq[String]): Path =
    new Path((warehouse +: parts).mkString("/"))

  private def tablePath(ident: Identifier): String =
    dirOf(ident.namespace.toSeq :+ ident.name).toString

  private def isTable(p: Path): Boolean = {
    val f = fs(p)
    f.exists(new Path(p, "_manifests"))
  }

  // ---- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace.toSeq)
    val f = fs(dir)
    if (!f.exists(dir)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && isTable(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .sortBy(_.name).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(new Path(tablePath(ident)))

  override def loadTable(ident: Identifier): Table = {
    if (tableExists(ident)) {
      // pin the CURRENT snapshot at load (the Iceberg/Delta contract):
      // the scan then reads the version the statement was analyzed
      // against — a concurrent commit between analysis and execution
      // (or between a self-join's two scans) cannot split one query
      // across two table states. Writes/deletes still run against the
      // head via the commit loop; only explicit time travel is readOnly.
      val table = tablePath(ident)
      return new VersionedSparkTable(table,
        s"$catalogName.${(ident.namespace :+ ident.name).mkString(".")}",
        Some(Versioned.currentVersion(table)), readOnly = false)
    }
    metadataTable(ident).getOrElse(throw new NoSuchTableException(ident))
  }

  /** Iceberg-style METADATA tables — one extra name part after a real
    * table: `SELECT * FROM cat.ns.t.history` (commit log: version,
    * commit time, file/byte/delete/txn counts — [[Versioned.history]]),
    * `….t.files` (the current manifest's data files with recorded byte
    * lengths), `….t.tags` (named refs → pinned versions). Driver-held
    * metadata only; no data I/O.
    */
  private def metadataTable(ident: Identifier): Option[Table] = {
    import org.apache.spark.sql.types._
    if (ident.namespace.isEmpty) return None
    val base = Identifier.of(ident.namespace.init, ident.namespace.last)
    if (!tableExists(base)) return None
    val table = tablePath(base)
    val fullName =
      s"$catalogName.${(ident.namespace :+ ident.name).mkString(".")}"
    ident.name match {
      case "history" => Some(new MetadataSparkTable(fullName,
        StructType(Seq(StructField("version", IntegerType),
          StructField("committed_at", TimestampType),
          StructField("n_files", IntegerType),
          StructField("bytes", LongType),
          StructField("n_delete_files", IntegerType),
          StructField("n_txns", IntegerType))),
        s => Versioned.history(s, table)))
      case "files" => Some(new MetadataSparkTable(fullName,
        StructType(Seq(StructField("path", StringType),
          StructField("bytes", LongType))),
        { s =>
          import s.implicits._
          // resolve the head ONCE: independent resolutions could straddle
          // a concurrent commit and pair v(n+1) paths with v(n) bytes
          val v = Some(Versioned.currentVersion(table))
          val sizes = Versioned.dataFileSizes(s, table, v)
          Versioned.listDataFiles(s, table, v)
            .map(f => (f, sizes.get(f)))
            .toDF("path", "bytes").orderBy("path")
        }))
      case "partitions" => Some(new MetadataSparkTable(fullName,
        StructType(Seq(StructField("partition", StringType),
          StructField("n_files", IntegerType),
          StructField("bytes", LongType),
          StructField("rows", LongType))),
        s => Versioned.partitionSummary(s, table)))
      case "tags" => Some(new MetadataSparkTable(fullName,
        StructType(Seq(StructField("tag", StringType),
          StructField("version", IntegerType))),
        { s =>
          import s.implicits._
          Versioned.tags(table).toSeq.toDF("tag", "version").orderBy("tag")
        }))
      case _ => None
    }
  }

  /** `VERSION AS OF x`: a snapshot number, or a tag name
    * ([[Versioned.tag]] — Iceberg's ref syntax).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val table = tablePath(ident)
    val v = version.toIntOption.getOrElse(
      Versioned.tags(table).getOrElse(version,
        throw new IllegalArgumentException(
          s"VERSION AS OF '$version' is neither a snapshot number nor a " +
            s"tag of $table")))
    new VersionedSparkTable(table, s"${ident.name}@v$v", Some(v),
      readOnly = true)
  }

  /** `TIMESTAMP AS OF x`: Spark hands epoch MICROseconds; commit times
    * resolve at millisecond granularity ([[Versioned.versionAsOf]]).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val table = tablePath(ident)
    val v = Versioned.versionAsOf(table, timestamp / 1000L)
    new VersionedSparkTable(table, s"${ident.name}@v$v", Some(v),
      readOnly = true)
  }

  /** `PARTITIONED BY (col, …)` — IDENTITY transforms over top-level
    * columns only (the layout+pruning contract: [[Versioned]] lays data
    * under partition directories while keeping files self-contained, and
    * identity stats make manifest admission an exact partition pruner —
    * see [[Versioned.createEmpty]]'s partitioned overload). Bucket/
    * truncate/temporal transforms reject loudly: their pruning semantics
    * need transform-aware admission, which manifest min/max stats cannot
    * express — cluster with ZOrder/key-ranged appends instead.
    */
  private def identityCols(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map { t =>
      val refs = t.references()
      if (t.name() != "identity" || refs.length != 1 ||
          refs(0).fieldNames().length != 1)
        throw new UnsupportedOperationException(
          s"only identity partition transforms over top-level columns " +
            s"are supported, got: $t (bucket/truncate/days need " +
            "transform-aware pruning — cluster with ZOrder instead)")
      refs(0).fieldNames()(0)
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    Versioned.createEmpty(spark, tablePath(ident), schema,
      identityCols(partitions))
    loadTable(ident)
  }

  /** `ALTER TABLE … ADD COLUMNS / DROP COLUMN(S) / RENAME COLUMN` —
    * all PURE METADATA commits over the manifest's per-snapshot schemas
    * ([[Versioned.addColumns]]/[[Versioned.dropColumns]]/
    * [[Versioned.renameColumn]]): adds null-fill old files at read,
    * drops stop requesting the column, renames coalesce over name
    * epochs until the next compaction materializes them, and
    * `ALTER COLUMN … TYPE` commits VALUE-PRESERVING widenings
    * ([[Versioned.widenColumn]] — Spark's parquet readers promote old
    * files' narrow physical type natively). Old snapshots keep their
    * schemas (time travel across the change reads the old names and
    * types). Lossy retypes reject — those are a rebuild.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    if (drops.nonEmpty) {
      require(drops.size == changes.size,
        "mixed ALTER TABLE change lists are unsupported")
      val names = drops.map { d =>
        require(d.fieldNames.length == 1,
          s"nested DROP COLUMN is out of scope: " +
            d.fieldNames.mkString("."))
        d.fieldNames.head
      }
      Versioned.dropColumns(spark, tablePath(ident), names)
      return loadTable(ident)
    }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    if (renames.nonEmpty) {
      require(renames.size == changes.size,
        "mixed ALTER TABLE change lists are unsupported")
      renames.foreach { r =>
        require(r.fieldNames.length == 1,
          s"nested RENAME COLUMN is out of scope: " +
            r.fieldNames.mkString("."))
        Versioned.renameColumn(spark, tablePath(ident),
          r.fieldNames.head, r.newName)
      }
      return loadTable(ident)
    }
    val retypes = changes.collect { case u: TableChange.UpdateColumnType => u }
    if (retypes.nonEmpty) {
      require(retypes.size == changes.size,
        "mixed ALTER TABLE change lists are unsupported")
      retypes.foreach { u =>
        require(u.fieldNames.length == 1,
          s"nested ALTER COLUMN TYPE is out of scope: " +
            u.fieldNames.mkString("."))
        Versioned.widenColumn(spark, tablePath(ident),
          u.fieldNames.head, u.newDataType)
      }
      return loadTable(ident)
    }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.size != changes.size)
      throw new UnsupportedOperationException(
        "only ALTER TABLE ADD COLUMNS / DROP COLUMN / RENAME COLUMN / " +
          "ALTER COLUMN TYPE (widening) are supported")
    val fields = adds.map { a =>
      if (a.fieldNames.length != 1)
        throw new UnsupportedOperationException(
          s"nested ADD COLUMN is out of scope: ${a.fieldNames.mkString(".")}")
      // silently honoring neither would lie: FIRST/AFTER cannot reorder
      // parquet footers, and NOT NULL cannot hold when every old file
      // null-fills the column — refuse loudly, like the other edges
      if (a.position() != null)
        throw new UnsupportedOperationException(
          "ADD COLUMNS ... FIRST/AFTER is out of scope: columns append " +
            "at the END of the schema")
      if (!a.isNullable)
        throw new UnsupportedOperationException(
          "ADD COLUMNS ... NOT NULL is out of scope: files from before " +
            "the evolution null-fill the new column, so the constraint " +
            "cannot hold")
      StructField(a.fieldNames.head, a.dataType, nullable = true)
    }
    Versioned.addColumns(spark, tablePath(ident), fields)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(tablePath(ident))
    isTable(p) && fs(p).delete(p, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val from = new Path(tablePath(oldIdent))
    val to = new Path(tablePath(newIdent))
    require(fs(from).rename(from, to), s"rename failed: $from -> $to")
  }

  // ---- staged (atomic) CTAS / RTAS -------------------------------------

  /** Atomic `CREATE [OR REPLACE] TABLE … AS SELECT` — the
    * `StagingTableCatalog` seam, where the versioned table's manifest
    * rename IS the atomic commit: the staged write lands data files
    * first and publishes the snapshot in ONE rename-CAS at the very end
    * ([[Versioned.replace]]/append), so readers never observe a partial
    * replacement and a failed query leaves the previous table — and its
    * whole history — untouched. `REPLACE … AS SELECT` keeps earlier
    * snapshots readable through `VERSION AS OF` (a replace is a
    * re-release, not a purge).
    */
  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    new StagedVersionedTable(tablePath(ident), fullName(ident), schema,
      existedBefore = false, pcols = identityCols(partitions))
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new StagedVersionedTable(tablePath(ident), fullName(ident), schema,
      existedBefore = true, pcols = identityCols(partitions))
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    new StagedVersionedTable(tablePath(ident), fullName(ident), schema,
      existedBefore = tableExists(ident), pcols = identityCols(partitions))
  }

  private def fullName(ident: Identifier): String =
    s"$catalogName.${(ident.namespace :+ ident.name).mkString(".")}"

  // ---- functions ------------------------------------------------------

  /** Engine scalar functions as catalog SQL ([[GraftFunctions]] — the
    * DSv2 FunctionCatalog seam): `SELECT <cat>.<ns>.kmer_encode(seq)`;
    * available in every existing namespace.
    */
  override def listFunctions(
      namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    GraftFunctions.names.map(Identifier.of(namespace, _)).toArray
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    // same namespace universe as listFunctions — the two entry points
    // must not disagree about which namespaces exist
    if (ident.namespace.nonEmpty && !namespaceExists(ident.namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    GraftFunctions.load(ident.name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident))
  }

  // ---- procedures -----------------------------------------------------

  /** Maintenance procedures under the `system` namespace (the Iceberg
    * `CALL` convention — [[GraftProcedures]]): compact, compact_small,
    * expire, expire_older_than, vacuum, maintain, tag, drop_tag,
    * publish, rollback. Table arguments are catalog-relative strings
    * (`'ns.t'`).
    */
  override def listProcedures(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftProcedures.names.map(Identifier.of(namespace, _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure = {
    def notFound = throw new RuntimeException(
      s"no procedure $catalogName.${ident.namespace.mkString(".")}" +
        s".${ident.name} (procedures live under $catalogName.system; " +
        s"available: ${GraftProcedures.names.mkString(", ")})")
    if (!ident.namespace.sameElements(Array("system"))) notFound
    GraftProcedures.load(ident.name,
      ref => dirOf(ref.split("\\.").toSeq).toString).getOrElse(notFound)
  }

  // ---- namespaces -----------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = dirOf(Nil)
    val f = fs(root)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && !isTable(s.getPath) &&
        !s.getPath.getName.startsWith("_"))
      .map(s => Array(s.getPath.getName)).sortBy(_.head).toArray
  }

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = dirOf(namespace.toSeq)
    val f = fs(dir)
    // a TABLE path is not a namespace: without this, SHOW NAMESPACES IN
    // cat.ns.t would leak the table's internal layout (data/, _manifests
    // siblings) as namespaces while namespaceExists says false
    if (!f.exists(dir) || isTable(dir))
      throw new NoSuchNamespaceException(namespace)
    f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && !isTable(s.getPath) &&
        !s.getPath.getName.startsWith("_"))
      .map(s => namespace :+ s.getPath.getName).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val dir = dirOf(namespace.toSeq)
    namespace.isEmpty || (fs(dir).exists(dir) && !isTable(dir))
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val dir = dirOf(namespace.toSeq)
    fs(dir).mkdirs(dir)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "namespace properties are out of scope")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = dirOf(namespace.toSeq)
    val f = fs(dir)
    if (!f.exists(dir)) false
    else {
      if (!cascade && f.listStatus(dir).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty")
      f.delete(dir, true)
    }
  }
}

/** One catalog table, pinned to a snapshot for time-travel loads (`pinned`
  * = Some(v)) or tracking the head (None). Reads bridge through
  * [[V1Scan]] into [[SqlBridge.scan]]; writes through [[V1Write]] into
  * the commit API; row-level DELETE through the exact predicate
  * translation. A pinned table is read-only — writes and deletes against
  * history reject loudly.
  */
private[sources] final class VersionedSparkTable(table: String,
    ident: String, pinned: Option[Int], readOnly: Boolean)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns
    with TruncatableTable {

  /** `TRUNCATE TABLE …` — a new EMPTY snapshot at the table's schema
    * ([[Versioned.replace]] of nothing): history stays readable (time
    * travel to the pre-truncate version works until expire), exactly
    * the INSERT OVERWRITE-of-nothing shape.
    */
  override def truncateTable(): Boolean = {
    require(!readOnly, s"cannot truncate time-travel read $ident")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Versioned.replace(empty, table)
    true
  }

  private def spark: SparkSession = SparkSession.active

  override def name(): String = ident

  override lazy val schema: StructType =
    Versioned.schemaAt(spark, table, pinned)

  /** Declared identity partitioning (PARTITIONED BY at create) — shown
    * by DESCRIBE and consumed by the engine's distribution planning.
    * Immutable for the table's lifetime, so the head's manifest answers.
    */
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    Versioned.partitionColumns(spark, table)
      .map(org.apache.spark.sql.connector.expressions.Expressions.identity)
      .toArray

  /** `_file` — each row's source data file (Iceberg's metadata column):
    * selectable in plain SQL and REQUIRED by the row-level rewrite plan
    * (the group identity [[GraftRowLevelOperation]] replaces by).
    */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = RowLevelFile.Name
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment(): String = "data file path holding the row"
    })

  // BATCH_WRITE rides alongside V1_BATCH_WRITE: the analyzer's
  // TableCapabilityCheck demands it for OverwritePartitionsDynamic
  // (which has no V1 fallback — builds a true V2 batch write), while
  // the physical planner routes each statement by the WRITE OBJECT's
  // type (V1Write vs Write), so appends/overwrites keep the V1 seam
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns
        with SupportsPushDownAggregates {
      private var required: StructType = schema
      private var pushed: Array[Filter] = Array.empty
      private var aggResult: Option[(StructType, Seq[Any])] = None
      private var aggPushed = false

      /** Snapshot facets once per builder (the parsed manifest itself is
        * cached, but decodeStat over every stats row is not free at
        * 10^5 files × several offer/build calls per statement).
        */
      private lazy val snapshotV: Int =
        pinned.getOrElse(Versioned.currentVersion(table))
      private lazy val snapshot
          : (Seq[String], Seq[ZoneMap.Stat], Map[String, Long],
            StructType, Int) =
        Versioned.rowLevelSnapshot(spark, table, snapshotV)

      /** Record what translates (for the inner scan's plan-time file
        * admission + EXPLAIN's PushedFilters), but return EVERY filter
        * as residual — the engine re-applies the full predicate above
        * the scan, so the translation can only ever reduce I/O.
        */
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(f => SqlBridge.toColumn(f).isDefined)
        filters
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      /** Metadata-only COUNT/MIN/MAX ([[AggPushdown]] — the Iceberg
        * `SELECT COUNT(*)` shape): answered entirely from manifest
        * stats when sound, refused otherwise. The engine only offers
        * aggregates when no residual filter survives, so an accepted
        * push is always a WHOLE-snapshot aggregate.
        */
      override def supportCompletePushDown(agg: Aggregation): Boolean = {
        // recompute per offer (probing and pushing may not carry the
        // same Aggregation object); the facets themselves are cached
        val (files, stats, _, tableSchema, nDeletes) = snapshot
        aggResult =
          AggPushdown.compute(agg, stats, files, nDeletes, tableSchema)
        aggResult.isDefined
      }

      /** Partial pushdown is refused (complete-or-nothing: partial
        * results would still scan every file, buying nothing).
        */
      override def pushAggregation(agg: Aggregation): Boolean = {
        aggPushed = supportCompletePushDown(agg)
        aggPushed
      }

      /** `spark.readStream.table(…)` lands here through either branch:
        * version-offset micro-batches over append commits
        * ([[GraftMicroBatchStream]] — Delta's streaming-source
        * contract). Streams follow the HEAD; a time-travel load cannot
        * stream (its pin is the whole point).
        */
      private def microBatch(checkpointLocation: String, req: StructType)
          : org.apache.spark.sql.connector.read.streaming
            .MicroBatchStream = {
        require(!readOnly,
          s"cannot stream a time-travel read of $ident")
        require(Versioned.columnMapping(spark, table).isEmpty,
          s"readStream.table on $ident needs materialized column " +
            "names (a rename is pending) — run Versioned.compact first")
        val (_, _, _, tableSchema, _) = snapshot
        new GraftMicroBatchStream(spark, table,
          StructType(req.fields.filter(_.name != RowLevelFile.Name)),
          tableSchema, options)
      }

      override def build(): Scan = aggResult.filter(_ => aggPushed) match {
        case Some((aggSchema, values)) =>
          new V1Scan {
            override def readSchema(): StructType = aggSchema
            override def description(): String =
              s"graft-metadata-agg ${aggSchema.fieldNames.mkString(",")}"
            override def toV1TableScan[T <: BaseRelation with TableScan](
                context: SQLContext): T =
              new MetadataAggScan(context, aggSchema, values)
                .asInstanceOf[T]
          }
        case None =>
          val req = required
          val (files, stats, sizes, tableSchema, nDeletes) = snapshot
          // pending MOR masks apply INSIDE the V2 scan when they
          // collect under the broadcast guard — keeping join-planning
          // statistics (a small dimension with one pending delete file
          // still auto-broadcasts) and `SELECT _file` alive between
          // compactions; only an over-cap mask degrades to the V1
          // anti-join bridge below
          val masks: Option[Option[Versioned.DeleteMasks]] =
            if (Versioned.columnMapping(spark, table,
              Some(snapshotV)).nonEmpty)
              None // pending rename: only the coalescing V1 read serves
            else if (nDeletes == 0) Some(None)
            else Versioned.collectMasks(spark, table, snapshotV)
              .map(mk => if (mk.isEmpty) None else Some(mk))
          masks match {
            case Some(mk) =>
              new VersionedBatchScan(spark, table, snapshotV, req, pushed,
                files, stats, sizes, tableSchema, mk) {
                override def toMicroBatchStream(
                    checkpointLocation: String)
                    : org.apache.spark.sql.connector.read.streaming
                      .MicroBatchStream =
                  microBatch(checkpointLocation, req)
              }
            case None =>
              // over-cap mask: the anti-join read (readWithDeletes) —
              // only expressible through the V1 DataFrame bridge;
              // compact returns the table to the vectorized path
              val cols = pushed.toSeq.flatMap(SqlBridge.toColumn)
              new V1Scan {
                override def readSchema(): StructType = req
                override def toV1TableScan[
                    T <: BaseRelation with TableScan](
                    context: SQLContext): T =
                  new VersionedV1TableScan(context, table, pinned,
                    req).withFilters(cols).asInstanceOf[T]
                override def toMicroBatchStream(
                    checkpointLocation: String)
                    : org.apache.spark.sql.connector.read.streaming
                      .MicroBatchStream =
                  microBatch(checkpointLocation, req)
              }
          }
      }
    }

  /** INSERT INTO appends; INSERT OVERWRITE replaces — the WHOLE table
    * for an unfiltered overwrite, or exactly the predicate's region for
    * `INSERT OVERWRITE … PARTITION (p = v)` / a static-mode filtered
    * overwrite ([[Versioned.replaceWhere]] — whole-partition drops are
    * pure metadata on an identity-partitioned table). Dynamic partition
    * overwrite mode replaces exactly the partitions present in the data
    * ([[Versioned.replacePartitions]]). An untranslatable overwrite
    * filter rejects loudly rather than overwriting the wrong region.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate with SupportsOverwrite
        with SupportsDynamicOverwrite {
      private var overwrite = false
      private var dynamic = false
      private var overwriteBy: Option[org.apache.spark.sql.Column] = None
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        if (filters.isEmpty || filters.forall(
            _.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
          overwrite = true
        else overwriteBy = Some(SqlBridge.conjunction(filters.toSeq)
          .getOrElse(throw new UnsupportedOperationException(
            s"untranslatable overwrite predicate: " +
              filters.mkString(", "))))
        this
      }
      override def overwriteDynamicPartitions(): WriteBuilder = {
        dynamic = true; this
      }
      override def build(): Write = if (dynamic) {
        // OverwritePartitionsDynamic has no V1 fallback: a true V2
        // batch write (executor task files + one adopting commit)
        require(!readOnly, s"cannot write to time-travel read $ident")
        new Write with PartitionClusteredWrite {
          override def clusteringCols: Seq[String] =
            Versioned.partitionColumns(spark, table)
          override def description(): String =
            s"graft-dynamic-overwrite $ident"
          override def toBatch: org.apache.spark.sql.connector.write
              .BatchWrite =
            new GraftDynamicOverwriteWrite(table,
              pinned.getOrElse(Versioned.currentVersion(table)),
              info.schema())
        }
      } else new V1Write with PartitionClusteredWrite {
        override def clusteringCols: Seq[String] =
          Versioned.partitionColumns(spark, table)
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ov: Boolean): Unit = {
              require(!readOnly,
                s"cannot write to time-travel read $ident")
              // dynamic never reaches here: build() returned the V2
              // batch write above (OverwritePartitionsDynamic has no
              // V1 fallback)
              overwriteBy match {
                case Some(pred) =>
                  Versioned.replaceWhere(data, table, pred)
                case None =>
                  if (overwrite || ov) Versioned.replace(data, table)
                  else Versioned.append(data, table)
              }
            }
          }

        /** `df.writeStream.toTable(…)` — exactly-once epoch appends
          * ([[GraftStreamingWrite]]). Append mode only: a versioned
          * table IS the changelog; Complete-mode truncation per
          * trigger is a batch `replace`, not a stream.
          */
        override def toStreaming: org.apache.spark.sql.connector.write
            .streaming.StreamingWrite = {
          require(!readOnly,
            s"cannot stream into time-travel read $ident")
          require(!overwrite,
            "streaming into a versioned table is append-only " +
              "(Complete/Truncate output modes are unsupported)")
          new GraftStreamingWrite(table, info.schema(), info.queryId())
        }
      }
    }

  /** `DELETE FROM … WHERE …` — accepted only when every conjunct
    * translates EXACTLY ([[SqlBridge.conjunction]]); Spark surfaces the
    * refusal as an analysis error instead of this table deleting the
    * wrong rows. The delete itself is [[Versioned.delete]]: stats-proven
    * whole-file drops as pure metadata, partial files rewritten.
    */
  /** SQL `UPDATE` / `MERGE INTO` / untranslatable-`DELETE` — Spark's
    * group-based rewrite over [[GraftRowLevelOperation]] (copy-on-write
    * group replacement with manifest-stats group pruning). Translatable
    * DELETE predicates never reach it: `OptimizeMetadataOnlyDeleteFromTable`
    * routes them back to [[deleteWhere]]'s metadata tier below.
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(!readOnly,
      s"cannot ${info.command} a time-travel read of $ident")
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new GraftRowLevelOperation(table,
          pinned.getOrElse(Versioned.currentVersion(table)), info.command)
    }
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    !readOnly && SqlBridge.conjunction(filters.toSeq).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(!readOnly, s"cannot delete from time-travel read $ident")
    val pred = SqlBridge.conjunction(filters.toSeq).getOrElse(
      throw new UnsupportedOperationException(
        s"untranslatable DELETE predicate: ${filters.mkString(", ")}"))
    Versioned.delete(spark, table, pred)
  }
}

/** PARTITION-CLUSTERED write distribution (Spark's own
  * `RequiresDistributionAndOrdering` seam — the Iceberg write-
  * distribution-mode=hash shape): a write into an identity-partitioned
  * table asks the engine to CLUSTER incoming rows by the partition
  * columns first, so one commit lands ~one file per partition instead
  * of one file per partition PER TASK — without this, a 200-task
  * insert into a 365-day table mints up to 73k files per commit, the
  * small-file death spiral at 100 TB. NON-STRICT on purpose: Spark
  * plans it as a RebalancePartitions node, which AQE both COALESCES
  * (small partitions merge) and SPLITS (one hot day fans back out to
  * many tasks) — a strict clustered distribution would serialize a
  * skewed partition through one task. Unpartitioned tables report
  * unspecified — their plans are untouched.
  *
  * Honored by Spark for the TRUE V2 writes (dynamic partition
  * overwrite, the streaming sink). The V1 batch exec
  * (`AppendDataExecV1`) re-plans the ANALYZED query and so drops the
  * injected rebalance — those paths are backstopped by the same
  * clustering applied engine-side in [[Versioned]]'s staged write
  * (writeData's REBALANCE hint, `spark.graft.write.distribution`).
  */
private[sources] trait PartitionClusteredWrite
    extends org.apache.spark.sql.connector.write
      .RequiresDistributionAndOrdering {
  def clusteringCols: Seq[String]

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution = {
    import org.apache.spark.sql.connector.distributions.Distributions
    if (clusteringCols.isEmpty) Distributions.unspecified()
    else Distributions.clustered(clusteringCols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(c)
        : org.apache.spark.sql.connector.expressions.Expression).toArray)
  }
  override def distributionStrictlyRequired(): Boolean = false
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array.empty
}

/** One staged CTAS/RTAS target ([[GraftCatalog.stageCreate]] family):
  * the AS-SELECT write replaces/creates the table content in ONE
  * manifest commit at the end of the job (true atomicity — the staged
  * data directory is invisible until the rename-CAS), so
  * `commitStagedChanges` has nothing left to do and `abortStagedChanges`
  * only reclaims a never-published table directory. An AS-SELECT-less
  * staged create publishes the declared schema as an empty v1 at
  * commit.
  */
private[sources] final class StagedVersionedTable(table: String,
    ident: String, declared: StructType, existedBefore: Boolean,
    pcols: Seq[String] = Nil)
    extends StagedTable with SupportsWrite {

  private def spark: SparkSession = SparkSession.active
  @volatile private var written = false

  /** Whether the target DIRECTORY predates staging: a failed CTAS must
    * reclaim only what IT minted — a stray non-table directory at the
    * path is not ours to delete.
    */
  private val dirExistedBefore: Boolean = {
    val p = new Path(table)
    p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
      .exists(p)
  }

  override def name(): String = ident
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // CTAS/RTAS both arrive as the staged table's one write; the
      // replace-vs-append distinction is table existence, not the mode
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write with PartitionClusteredWrite {
        override def clusteringCols: Seq[String] = pcols
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ov: Boolean): Unit = {
              // explicit pcols: a brand-new table has no manifest to
              // discover them from, and an RTAS's PARTITIONED BY clause
              // re-declares the layout
              if (existedBefore) Versioned.replacePcols(data, table,
                None, pcols)
              else Versioned.appendImpl(data, table, pcols)
              written = true
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    // a staged CREATE with no AS-SELECT write still owes the schema
    if (!written && !existedBefore)
      Versioned.createEmpty(spark, table, declared, pcols)
    // a write-less REPLACE of an EXISTING table (plain `REPLACE TABLE t
    // (cols)` / `CREATE OR REPLACE TABLE t (cols)` — Spark's
    // AtomicReplaceTableExec stages, never writes, then commits) owes an
    // EMPTY snapshot at the declared schema: without this the statement
    // reports success while the old data and schema survive
    else if (!written && existedBefore) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared)
      Versioned.replacePcols(empty, table, None, pcols)
    }
  }

  override def abortStagedChanges(): Unit = {
    // the write never published (manifest CAS is the last step), so the
    // only debris is a table dir WE minted; a pre-existing table keeps
    // everything (torn staging is vacuumOrphans' jurisdiction), and a
    // pre-existing NON-table directory at the path is not ours either
    if (!existedBefore && !dirExistedBefore) {
      val p = new Path(table)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}

/** The one-row relation a completely-pushed aggregate returns: values
  * were computed on the DRIVER from manifest stats; the scan ships them
  * as a single-row RDD — zero data-file I/O by construction.
  */
private[sources] final class MetadataAggScan(
    @transient override val sqlContext: SQLContext,
    override val schema: StructType, values: Seq[Any])
    extends BaseRelation with TableScan {
  override def buildScan()
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    sqlContext.sparkContext.parallelize(
      Seq(org.apache.spark.sql.Row.fromSeq(values)), 1)
}

/** A read-only, driver-computed metadata table (`history`/`files`/
  * `tags`): fixed schema, rows from `producer` at scan time through the
  * same V1 bridge as data reads. These are O(commits)/O(files) frames —
  * no pushdown machinery needed.
  */
private[sources] final class MetadataSparkTable(ident: String,
    override val schema: StructType,
    producer: SparkSession => DataFrame)
    extends Table with SupportsRead {

  override def name(): String = ident

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = () => new V1Scan {
    override def readSchema(): StructType = schema
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val rel: BaseRelation with TableScan = new BaseRelation
          with TableScan {
        override val sqlContext: SQLContext = context
        override val schema: StructType = MetadataSparkTable.this.schema
        override def buildScan()
            : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
          val s = sqlContext.sparkSession
          import org.apache.spark.sql.functions.col
          producer(s)
            .select(schema.fieldNames.toSeq.map(n => col(s"`$n`")): _*).rdd
        }
      }
      rel.asInstanceOf[T]
    }
  }
}

/** The `BaseRelation with TableScan` the V1 bridge hands back: schema is
  * the PRUNED read schema, rows come from [[SqlBridge.scan]] over the
  * pinned snapshot with the translated predicates inside the plan.
  */
private[sources] final class VersionedV1TableScan(
    @transient override val sqlContext: SQLContext, table: String,
    version: Option[Int], override val schema: StructType)
    extends BaseRelation with TableScan {

  private var pushed: Seq[org.apache.spark.sql.Column] = Nil

  def withFilters(cols: Seq[org.apache.spark.sql.Column]): this.type = {
    pushed = cols; this
  }

  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    SqlBridge.scan(sqlContext.sparkSession, table, version,
      schema.fieldNames.toSeq, pushed)
}

package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** The V1 `sources.Filter` → `Column` translation shared by every SQL
  * face of the versioned table ([[GraftVersionedProvider]]'s
  * PrunedFilteredScan, [[GraftCatalog]]'s V1Scan bridge and DELETE
  * support). Translation is EXACT, never approximate: a translated
  * column evaluates to precisely the filter's documented semantics
  * (standard SQL three-valued logic — a NULL predicate result selects
  * nothing), so callers may use it both for pruning (where re-applying
  * the full predicate afterwards makes exactness optional) and for
  * row-level DELETE (where it is load-bearing). A shape with no exact
  * `Column` equivalent returns None and the caller must degrade (skip
  * the pushdown / refuse the delete) rather than guess.
  */
private[sources] object SqlBridge {

  /** TOP-LEVEL column reference for a V1 filter attribute — None for
    * nested-field names: DSv2 pushes nested predicates with DOTTED
    * attribute names (`s.x` for struct field x), and backtick-quoting
    * the whole name would reference a nonexistent top-level column —
    * crashing a valid query, or for DELETE silently evaluating against
    * the WRONG column if a literal "s.x" column also existed. Refusing
    * here makes nested predicates residual-only (scans stay correct,
    * just unpruned) and makes DELETE reject them via canDeleteWhere.
    */
  private def c(attr: String): Option[Column] =
    if (attr.contains(".") || attr.contains("`")) None
    else Some(col(s"`$attr`"))

  /** Exact Column equivalent of `f`, or None when no exact form exists.
    * `In` needs care: the V1 filter contract is "attribute is equal to
    * one of the values" where a NULL in `values` matches nothing
    * definite — `isin` implements exactly that (NULL yields NULL, which
    * filters out).
    */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => c(a).map(_ === lit(v))
    case EqualNullSafe(a, v) => c(a).map(_ <=> lit(v))
    case GreaterThan(a, v) => c(a).map(_ > lit(v))
    case GreaterThanOrEqual(a, v) => c(a).map(_ >= lit(v))
    case LessThan(a, v) => c(a).map(_ < lit(v))
    case LessThanOrEqual(a, v) => c(a).map(_ <= lit(v))
    case In(a, vs) => c(a).map(_.isin(vs.toSeq.map(lit): _*))
    case IsNull(a) => c(a).map(_.isNull)
    case IsNotNull(a) => c(a).map(_.isNotNull)
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(x) => toColumn(x).map(not)
    case StringStartsWith(a, p) => c(a).map(_.startsWith(p))
    case StringEndsWith(a, p) => c(a).map(_.endsWith(p))
    case StringContains(a, p) => c(a).map(_.contains(p))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  /** The conjunction of `filters` as one exact Column — None when ANY
    * conjunct fails to translate (a partial conjunction would be a
    * WEAKER predicate, which for DELETE means deleting too much).
    * An empty array is SQL's missing WHERE: everything.
    */
  def conjunction(filters: Seq[Filter]): Option[Column] =
    filters.foldLeft(Option(lit(true))) { (acc, f) =>
      for (a <- acc; fc <- toColumn(f)) yield a && fc
    }

  /** The scan every SQL face runs: the pruning snapshot read with the
    * translated predicates applied INSIDE the inner plan — that is what
    * lets [[ManifestFileIndex]] see them as pushed data filters and cut
    * files at plan time — projected to `required` in order. The engine
    * re-applies the full residual predicate on top (both V1
    * PrunedFilteredScan and the V1Scan bridge declare every filter
    * residual), so the pushdown is pure I/O savings, never a
    * correctness surface.
    */
  def scan(spark: SparkSession, table: String, version: Option[Int],
      required: Seq[String], pushed: Seq[Column]): RDD[Row] = {
    val base = Versioned.readForScan(spark, table, version)
    val filtered = pushed.foldLeft(base)(_ filter _)
    // `_file` is the table's metadata column (RowLevelFile): surface the
    // scan's own per-file constant. Spelling can differ from the
    // manifest's (URI qualification); group-filter consumers compare by
    // /data/ suffix, never raw equality. A MOR-masked snapshot cannot
    // attribute rows to files (readWithDeletes is an anti-join/union
    // plan — _metadata does not survive it, and input_file_name() above
    // a join is nondeterministic): refuse LOUDLY instead of surfacing a
    // confusing unresolved-column error.
    if (required.contains(RowLevelFile.Name) &&
        Versioned.hasDeleteFiles(spark, table, version))
      throw new UnsupportedOperationException(
        s"SELECT ${RowLevelFile.Name} needs a delete-free snapshot of " +
          s"$table: pending merge-on-read delete files make row→file " +
          "attribution undefined — run Versioned.compact first")
    val cols = required.map {
      case RowLevelFile.Name =>
        col("_metadata.file_path").as(RowLevelFile.Name)
      case n => col(s"`$n`")
    }
    filtered.select(cols: _*).rdd
  }
}

/** `spark.read.format("graft-versioned")` / `df.write.format(
  * "graft-versioned")` — the V1 DataSource face of [[Versioned]]
  * (public prior art: delta-core's pre-DSv2 RelationProvider face).
  * Read options: `path` (the table root), `versionAsOf` (a snapshot
  * number or a tag name — [[Versioned.tag]]), `timestampAsOf` (epoch
  * millis, resolved by commit time like [[Versioned.readAsOf]]).
  * Writes map SaveMode onto the commit API: Append → [[Versioned
  * .append]], Overwrite → [[Versioned.replace]] (a full re-release —
  * previous snapshots stay readable), ErrorIfExists / Ignore honor
  * their contracts against table existence. Scans go through
  * [[SqlBridge.scan]], so a filtered read prunes data files from the
  * manifest stats at plan time.
  */
final class GraftVersionedProvider extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-versioned requires a path (load(path) or option(\"path\", …))"))

  /** `versionAsOf` resolves a number, then a tag; `timestampAsOf`
    * resolves by commit time. Naming both is ambiguous and rejects.
    */
  private def versionOf(table: String,
      parameters: Map[String, String]): Option[Int] = {
    val byV = parameters.get("versionAsOf").map { v =>
      v.toIntOption.getOrElse(Versioned.tags(table).getOrElse(v,
        throw new IllegalArgumentException(
          s"versionAsOf '$v' is neither a snapshot number nor a tag of " +
            table)))
    }
    val byTs = parameters.get("timestampAsOf")
      .map(ts => Versioned.versionAsOf(table, ts.toLong))
    require(byV.isEmpty || byTs.isEmpty,
      "set versionAsOf or timestampAsOf, not both")
    byV.orElse(byTs)
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val table = pathOf(parameters)
    new VersionedRelation(sqlContext, table, versionOf(table, parameters))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val table = pathOf(parameters)
    val exists = Versioned.currentVersion(table) > 0
    mode match {
      case SaveMode.Append => Versioned.append(data, table)
      case SaveMode.Overwrite => Versioned.replace(data, table)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft-versioned table already exists at $table (mode " +
            "ErrorIfExists)")
        Versioned.append(data, table)
      case SaveMode.Ignore => if (!exists) Versioned.append(data, table)
    }
    new VersionedRelation(sqlContext, table, None)
  }
}

/** The V1 relation over one pinned (or head) snapshot: column-pruned,
  * filter-pushed scans via [[SqlBridge.scan]], inserts via the commit
  * API. `unhandledFilters` keeps the BaseRelation default — every
  * filter is re-applied by the engine above the scan — so the pushed
  * translation only ever REDUCES I/O.
  */
private[sources] final class VersionedRelation(
    @transient override val sqlContext: SQLContext, table: String,
    version: Option[Int])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** The snapshot every scan of this relation reads, PINNED at load —
    * schema and rows must come from one version even when a concurrent
    * commit lands between load() and the action (or between a
    * self-join's two scans).
    */
  private val scanVersion: Option[Int] =
    Some(version.getOrElse(Versioned.currentVersion(table)))

  override val schema: StructType =
    Versioned.schemaAt(sqlContext.sparkSession, table, scanVersion)

  /** Manifest-derived size (same contract as the catalog face's
    * `SupportsReportStatistics`): lets joins over format reads broadcast
    * a small versioned side. Any size-less legacy file falls back to
    * Spark's assume-huge default — never an undercount.
    */
  override def sizeInBytes: Long =
    Versioned.snapshotStats(sqlContext.sparkSession, table,
      scanVersion.get)._1.getOrElse(super.sizeInBytes)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    SqlBridge.scan(sqlContext.sparkSession, table, scanVersion,
      requiredColumns.toSeq, filters.toSeq.flatMap(SqlBridge.toColumn))

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(version.isEmpty,
      s"cannot write to a time-travel read of $table (v=${version.get})")
    if (overwrite) Versioned.replace(data, table)
    else Versioned.append(data, table)
  }
}

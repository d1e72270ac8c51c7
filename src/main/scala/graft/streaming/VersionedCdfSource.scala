package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShim, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}

import graft.sources.Versioned

/** A [[graft.sources.Versioned]] table as a STRUCTURED STREAMING SOURCE
  * (Delta's "table as a stream" / CDF streaming read): every committed
  * snapshot becomes one micro-batch of change rows — the table's own
  * version numbers ARE the stream offsets, so the checkpoint story is
  * inherited from the engine and a restart resumes exactly where the
  * last batch committed. Each emitted row carries `_change_type`
  * ("insert" | "delete" — an update is a delete+insert pair, the
  * [[Versioned.changesBetween]] contract) and `_commit_version` (the
  * snapshot that produced it), so downstream pipelines can fold CDC
  * per-commit (e.g. into an [[graft.sources.IncrementalView]]) without
  * polling loops.
  *
  * Usage:
  * {{{
  * spark.readStream.format("versioned-cdf")
  *   .option("path", table)
  *   .option("startingVersion", "0")   // 0 = replay history from v1;
  *   .load()                           // default = only NEW commits
  * }}}
  *
  * The base version and the stream's pinned schema persist in the
  * query's own checkpoint (`metadataPath`) at FIRST start — the
  * Kafka-source idiom — so a RESTART reuses them: the default
  * "only new commits" base cannot silently re-pin to a later version
  * (which would withhold downtime commits and crash replay of an
  * uncommitted first batch), and an additive evolution between runs
  * cannot change the stream's arity mid-checkpoint.
  *
  * Scale shape: a batch's cost is its commits' CDF — file-pruned for
  * appends/COW rewrites (only new/rewritten files scanned), so steady
  * ingest streams at O(delta) per trigger. Batches spanning several
  * versions (catch-up after downtime) plan with ONE manifest read per
  * version ([[Versioned.changesPerCommit]]) and preserve exact
  * `_commit_version` attribution. Columns added to the table after
  * stream start are dropped from this stream; restart with a fresh
  * checkpoint to pick them up.
  */
class VersionedCdfProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "versioned-cdf"

  /** Table reference: a raw directory (`path`) or a CATALOG-relative
    * name (`table`, `cat.ns….t`) resolved against the same
    * `spark.sql.catalog.<cat>.warehouse` root [[graft.sources
    * .GraftCatalog]] lays tables under — the row-level CDF stream of a
    * SQL-managed table then needs no path plumbing:
    * `readStream.format("versioned-cdf").option("table", "lake.ns.t")`.
    */
  private def pathOf(parameters: Map[String, String]): String =
    parameters.get("path")
      .orElse(parameters.get("table").map { ref =>
        val parts = ref.split('.')
        require(parts.length >= 3,
          s"versioned-cdf table reference must be " +
            s"<catalog>.<namespace…>.<name>, got '$ref'")
        val cat = parts.head
        val wh = org.apache.spark.sql.SparkSession.active.conf
          .getOption(s"spark.sql.catalog.$cat.warehouse")
          .getOrElse(throw new IllegalArgumentException(
            s"versioned-cdf: catalog '$cat' has no " +
              s"spark.sql.catalog.$cat.warehouse configured"))
        (wh +: parts.tail.toSeq).mkString("/")
      })
      .getOrElse(throw new IllegalArgumentException(
        "versioned-cdf needs .option(\"path\", <dir>) or " +
          ".option(\"table\", <catalog table>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), VersionedCdfSource.cdfSchema(sqlContext, pathOf(parameters)))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val table = pathOf(parameters)
    val (starting, pinned) = VersionedCdfSource.loadOrInitInfo(sqlContext,
      metadataPath, table, parameters.get("startingVersion").map(_.toInt))
    new VersionedCdfSource(sqlContext, table, starting, Some(pinned))
  }
}

object VersionedCdfSource {
  private[streaming] val MetaCols = Seq("_change_type", "_commit_version")

  /** Table schema + the two CDF metadata columns. */
  private[streaming] def cdfSchema(sqlContext: SQLContext,
      table: String): StructType = {
    val cur = Versioned.currentVersion(table)
    require(cur > 0, s"versioned-cdf: no snapshot at $table yet")
    val base = Versioned.read(sqlContext.sparkSession, table, Some(cur))
      .schema
    val clash = base.fieldNames.filter(MetaCols.contains)
    require(clash.isEmpty, // a silent overwrite would corrupt every row
      s"versioned-cdf: table carries reserved column(s) " +
        clash.mkString(","))
    StructType(base.fields.toSeq :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
  }

  /** The stream's (base version, pinned schema), persisted in the
    * query checkpoint at first start (create-no-overwrite CAS; a losing
    * racer re-reads the winner's file) and REUSED on every restart.
    */
  private[streaming] def loadOrInitInfo(sqlContext: SQLContext,
      metadataPath: String, table: String,
      startingOpt: Option[Int]): (Int, StructType) = {
    val conf = sqlContext.sparkSession.sparkContext.hadoopConfiguration
    val dir = new Path(metadataPath)
    val fs = dir.getFileSystem(conf)
    val p = new Path(dir, "graft-cdf-init")
    def readIt(): (Int, StructType) = {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val i = txt.indexOf('\n')
      (txt.take(i).trim.toInt,
        DataType.fromJson(txt.drop(i + 1)).asInstanceOf[StructType])
    }
    if (fs.exists(p)) return readIt()
    val starting = startingOpt.getOrElse(Versioned.currentVersion(table))
    val schema = cdfSchema(sqlContext, table)
    fs.mkdirs(dir)
    val tmp = new Path(dir,
      s"_tmp_init_${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write(s"$starting\n${schema.json}".getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
    try { fc.rename(tmp, p); (starting, schema) }
    catch {
      case _: java.io.IOException => // lost the init race: use the winner
        fs.delete(tmp, false)
        readIt()
    }
  }
}

class VersionedCdfSource(sqlContext: SQLContext, table: String,
    starting: Int, pinnedSchema: Option[StructType] = None) extends Source {

  private val spark = sqlContext.sparkSession

  override val schema: StructType = pinnedSchema.getOrElse(
    VersionedCdfSource.cdfSchema(sqlContext, table))

  private def ver(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case s: SerializedOffset => LongOffset(s).offset.toInt
    case other => other.json().trim.toInt
  }

  override def getOffset: Option[Offset] = {
    val cur = Versioned.currentVersion(table)
    if (cur <= starting) None else Some(LongOffset(cur.toLong))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    GraftShim.asMicroBatch(
      batchFrame(start.map(ver).getOrElse(starting), ver(end)))

  /** The (batch-executable) change frame for versions in (s, e] — what
    * [[getBatch]] wraps as a micro-batch; exposed for direct testing.
    * One per-commit diff per version, each tagged `_commit_version`,
    * planned with shared manifest reads.
    */
  private[streaming] def batchFrame(s: Int, e: Int): DataFrame = {
    if (e <= s) // replayed no-op span (defensive; offsets are monotonic)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Versioned.changesPerCommit(spark, table, s, e)
      .map { case (v, d) =>
        conform(d.withColumn("_commit_version", lit(v.toLong)))
      }
      .reduce(_ unionAll _)
  }

  /** Project a per-commit diff onto the PINNED stream schema: columns
    * the diff predates (additive evolution mid-span) null-fill, columns
    * added to the table after stream start drop.
    */
  private def conform(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    val withAll = schema.fields.foldLeft(df)((d, f) =>
      if (have(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType)))
    withAll.select(schema.fieldNames.map(col).toSeq: _*)
  }

  override def stop(): Unit = ()
}

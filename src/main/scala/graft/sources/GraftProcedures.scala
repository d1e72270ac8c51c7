package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance as SQL STORED PROCEDURES (Spark 4's `ProcedureCatalog`
  * seam — the `CALL` integration Iceberg publishes as
  * `system.rewrite_data_files` etc.): every [[Versioned]] maintenance
  * primitive is callable without leaving SQL,
  *
  * {{{
  * CALL cat.system.compact(table => 'ns.t', num_files => 8)
  * CALL cat.system.compact_small(table => 'ns.t', small_bytes => 33554432)
  * CALL cat.system.compact_where(table => 'ns.t', where => "day = 'd1'")
  * CALL cat.system.expire(table => 'ns.t', keep_last => 7)
  * CALL cat.system.vacuum(table => 'ns.t')         -- grace defaults on
  * CALL cat.system.maintain(table => 'ns.t')       -- the policy loop
  * CALL cat.system.tag(table => 'ns.t', name => 'release-1')
  * CALL cat.system.publish(table => 'ns.t')        -- WAP pointer
  * CALL cat.system.rollback(table => 'ns.t', to_version => 3)
  * }}}
  *
  * Each CALL returns a one-row result (the committed version / counts),
  * so orchestration SQL can assert on the outcome. Table references are
  * catalog-relative (`'ns.t'`), resolved against the warehouse root the
  * catalog was registered with. Procedures are driver-side commands
  * delegating to the SAME commit primitives the API exposes — identical
  * optimistic-retry and conflict rules.
  */
private[sources] object GraftProcedures {

  /** One procedure: name, parameters, result schema, and the body. */
  private final case class Proc(name: String,
      params: Seq[ProcedureParameter], result: StructType,
      body: (SparkSession, String => String, InternalRow) => InternalRow)

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDef(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)
  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)

  private val procs: Seq[Proc] = Seq(
    Proc("compact",
      Seq(in("table", StringType), inDef("num_files", IntegerType, "16")),
      StructType(Seq(StructField("version", IntegerType))),
      (spark, path, args) => row(Int.box(Versioned.compact(spark,
        path(args.getUTF8String(0).toString), args.getInt(1))))),
    Proc("compact_small",
      Seq(in("table", StringType),
        inDef("small_bytes", LongType, (32L << 20).toString),
        inDef("target_files", IntegerType, "0")),
      StructType(Seq(StructField("version", IntegerType))),
      (spark, path, args) => row(Int.box(Versioned.compactSmall(spark,
        path(args.getUTF8String(0).toString), args.getLong(1),
        args.getInt(2))))),
    Proc("compact_where",
      Seq(in("table", StringType), in("where", StringType),
        inDef("small_bytes", LongType, "0"),
        inDef("target_files", IntegerType, "0")),
      StructType(Seq(StructField("version", IntegerType))),
      (spark, path, args) => row(Int.box(Versioned.compactWhere(spark,
        path(args.getUTF8String(0).toString),
        org.apache.spark.sql.functions.expr(args.getUTF8String(1).toString),
        args.getLong(2), args.getInt(3))))),
    Proc("expire",
      Seq(in("table", StringType), in("keep_last", IntegerType)),
      StructType(Seq(StructField("current_version", IntegerType))),
      (spark, path, args) => {
        val t = path(args.getUTF8String(0).toString)
        Versioned.expire(spark, t, args.getInt(1))
        row(Int.box(Versioned.currentVersion(t)))
      }),
    Proc("expire_older_than",
      Seq(in("table", StringType), in("max_age_ms", LongType),
        inDef("keep_last", IntegerType, "1")),
      StructType(Seq(StructField("current_version", IntegerType))),
      (spark, path, args) => {
        val t = path(args.getUTF8String(0).toString)
        Versioned.expireOlderThan(spark, t, args.getLong(1), args.getInt(2))
        row(Int.box(Versioned.currentVersion(t)))
      }),
    Proc("vacuum",
      Seq(in("table", StringType),
        inDef("grace_ms", LongType, Versioned.DefaultVacuumGraceMs.toString)),
      StructType(Seq(StructField("deleted_files", IntegerType))),
      (spark, path, args) => row(Int.box(Versioned.vacuumOrphans(spark,
        path(args.getUTF8String(0).toString), args.getLong(1)).size))),
    Proc("maintain",
      Seq(in("table", StringType),
        inDef("max_pending_delete_keys", LongType, "100000"),
        inDef("small_bytes", LongType, (32L << 20).toString),
        inDef("compact_files", IntegerType, "32"),
        inDef("grace_ms", LongType, Versioned.DefaultVacuumGraceMs.toString)),
      StructType(Seq(StructField("compacted", BooleanType),
        StructField("packed", BooleanType),
        StructField("vacuumed", IntegerType),
        StructField("version", IntegerType))),
      (spark, path, args) => {
        val m = Versioned.maintain(spark,
          path(args.getUTF8String(0).toString), args.getLong(1),
          args.getLong(2), args.getInt(3), args.getLong(4))
        row(Boolean.box(m.compacted), Boolean.box(m.packed),
          Int.box(m.vacuumed), Int.box(m.version))
      }),
    Proc("tag",
      Seq(in("table", StringType), in("name", StringType),
        inDef("version", IntegerType, "NULL")),
      StructType(Seq(StructField("pinned_version", IntegerType))),
      (spark, path, args) => row(Int.box(Versioned.tag(
        path(args.getUTF8String(0).toString),
        args.getUTF8String(1).toString,
        if (args.isNullAt(2)) None else Some(args.getInt(2)))))),
    Proc("drop_tag",
      Seq(in("table", StringType), in("name", StringType)),
      StructType(Seq(StructField("dropped", BooleanType))),
      (spark, path, args) => {
        Versioned.dropTag(path(args.getUTF8String(0).toString),
          args.getUTF8String(1).toString)
        row(Boolean.box(true))
      }),
    Proc("publish",
      Seq(in("table", StringType),
        inDef("version", IntegerType, "NULL")),
      StructType(Seq(StructField("published_version", IntegerType))),
      (spark, path, args) => row(Int.box(Versioned.publish(
        path(args.getUTF8String(0).toString),
        if (args.isNullAt(1)) None else Some(args.getInt(1)))))),
    Proc("rollback",
      Seq(in("table", StringType), in("to_version", IntegerType)),
      StructType(Seq(StructField("version", IntegerType))),
      (spark, path, args) => row(Int.box(Versioned.rollback(spark,
        path(args.getUTF8String(0).toString), args.getInt(1))))))

  def names: Seq[String] = procs.map(_.name)

  /** The unbound procedure for `name`, with `tablePath` resolving a
    * catalog-relative `'ns.t'` string to the table directory.
    */
  def load(name: String,
      tablePath: String => String): Option[UnboundProcedure] =
    procs.find(_.name == name).map { p =>
      new UnboundProcedure {
        override def name(): String = p.name
        override def description(): String =
          s"graft maintenance procedure ${p.name}"
        override def bind(inputType: StructType): BoundProcedure =
          new BoundProcedure {
            override def name(): String = p.name
            override def description(): String =
              s"graft maintenance procedure ${p.name}"
            override def parameters(): Array[ProcedureParameter] =
              p.params.toArray
            override def isDeterministic: Boolean = false
            override def call(input: InternalRow): JIterator[Scan] = {
              val spark = SparkSession.active
              val out = p.body(spark, tablePath, input)
              Collections.singletonList(new LocalScan {
                override def rows(): Array[InternalRow] = Array(out)
                override def readSchema(): StructType = p.result
              }: Scan).iterator()
            }
          }
      }
    }
}

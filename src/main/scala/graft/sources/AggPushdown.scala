package graft.sources

import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.types._

/** Metadata-only aggregate answers from a snapshot's manifest stats —
  * Iceberg's `SELECT COUNT(*)` parity: a global COUNT / COUNT(col) /
  * MIN / MAX over a versioned table resolves from driver-held per-file
  * stats with ZERO data I/O (at 100 TB that is the difference between
  * milliseconds and a full corpus scan). Used by
  * [[VersionedSparkTable]]'s ScanBuilder through Spark's own
  * `SupportsPushDownAggregates` seam, so plain `SELECT COUNT(*) FROM t`
  * — including over TIME TRAVEL — never touches parquet.
  *
  * Soundness rules (refusal = `None` = Spark runs the ordinary scan;
  * never a wrong answer):
  *  - no grouping, no pending MOR delete masks (masked rows are
  *    invisible to stats), every live file stats-covered with row
  *    counts (legacy snapshots refuse);
  *  - COUNT(*) = Σ rows; COUNT(col) = Σ (rows − nullCount), both
  *    demand recorded counts in EVERY file;
  *  - MIN/MAX only on types whose stats are EXACT values: integrals
  *    with |bound| < 2^52 (bounds ride as doubles — the
  *    metadata-delete exactness domain), float, double. Strings refuse
  *    (bounds are Iceberg-truncated), decimals refuse (double-rounded);
  *  - a file whose column is all-null contributes nothing to MIN/MAX;
  *    a file with no recorded bound but non-null rows refuses.
  */
private[sources] object AggPushdown {

  private val TwoTo52 = 4503599627370496.0 // 2^52

  /** (output schema, one result row as external values) when every
    * aggregate resolves exactly from the stats; None refuses.
    */
  def compute(agg: Aggregation, stats: Seq[ZoneMap.Stat],
      files: Seq[String], nDeletes: Int,
      schema: StructType): Option[(StructType, Seq[Any])] = {
    if (agg.groupByExpressions.nonEmpty || nDeletes > 0) return None
    val live = files.toSet
    val byFile: Map[String, Seq[ZoneMap.Stat]] =
      stats.filter(s => live(s.f)).groupBy(_.f)
    // every live file must carry stats with a row count
    val rowsByFile: Option[Map[String, Long]] =
      if (files.exists(f => !byFile.contains(f))) None
      else {
        val m = byFile.map { case (f, ss) =>
          f -> ss.flatMap(_.rows).headOption
        }
        if (m.values.exists(_.isEmpty)) None
        else Some(m.map { case (f, r) => f -> r.get })
      }

    def colName(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }

    // per-column once: (stats, covered-file set) — the per-aggregate
    // coverage check is then O(files) set lookups, not O(files × stats)
    // list scans (real money at 10^5 files on the PLANNING path)
    val liveStats = stats.filter(s => live(s.f))
    val byCol: Map[String, (Seq[ZoneMap.Stat], Set[String])] =
      liveStats.groupBy(_.c).map { case (c, ss) =>
        c -> (ss, ss.map(_.f).toSet)
      }

    def statsOf(c: String): Seq[ZoneMap.Stat] =
      byCol.get(c).map(_._1).getOrElse(Nil)

    def covers(c: String): Boolean = {
      val covered = byCol.get(c).map(_._2).getOrElse(Set.empty)
      files.forall(covered)
    }

    def exactType(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType => true
      case _ => false
    }

    def fromDouble(v: Double, dt: DataType): Any = dt match {
      case ByteType => v.toByte
      case ShortType => v.toShort
      case IntegerType => v.toInt
      case LongType => v.toLong
      case FloatType => v.toFloat
      case DoubleType => v
      case _ => throw new IllegalStateException(s"unreachable: $dt")
    }

    /** Exact extreme of `c`, or None=refuse; Some(null) = all rows null
      * (SQL MIN/MAX of nothing).
      */
    def extreme(c: String, isMin: Boolean): Option[Any] = {
      val dt = schema.find(_.name == c).map(_.dataType).getOrElse(
        return None)
      if (!exactType(dt)) return None
      if (!covers(c)) return None
      val ss = statsOf(c)
      val bounds = ss.flatMap { st =>
        (st.rows, st.nulls) match {
          case (Some(r), Some(n)) if n == r => None // all-null file
          case _ =>
            val b = if (isMin) st.lo else st.hi
            // a bound-less file with (possibly) non-null rows: unknown
            if (b.isEmpty) return None
            val integral = dt != FloatType && dt != DoubleType
            if (integral && math.abs(b.get) >= TwoTo52) return None
            Some(b.get)
        }
      }
      if (bounds.isEmpty) Some(null)
      else Some(fromDouble(if (isMin) bounds.min else bounds.max, dt))
    }

    val out = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        rowsByFile.map(m => (LongType: DataType, m.values.sum: Any))
          .getOrElse(return None)
      case c: Count if !c.isDistinct =>
        val col = colName(c.column).getOrElse(return None)
        if (!covers(col)) return None
        val ss = statsOf(col)
        val nonNull = ss.map { st =>
          (st.rows, st.nulls) match {
            case (Some(r), Some(n)) => r - n
            case _ => return None
          }
        }.sum
        (LongType: DataType, nonNull: Any)
      case m: Min =>
        val col = colName(m.column).getOrElse(return None)
        val v = extreme(col, isMin = true).getOrElse(return None)
        (schema(col).dataType, v)
      case m: Max =>
        val col = colName(m.column).getOrElse(return None)
        val v = extreme(col, isMin = false).getOrElse(return None)
        (schema(col).dataType, v)
      case _ => return None
    }
    val outSchema = StructType(out.zipWithIndex.map { case ((dt, _), i) =>
      StructField(s"agg_func_$i", dt, nullable = true)
    })
    Some((outSchema, out.map(_._2)))
  }
}

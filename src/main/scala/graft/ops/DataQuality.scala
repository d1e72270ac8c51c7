package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the "unit tests for data" gate a
  * training pipeline runs before a corpus snapshot is allowed downstream
  * (public prior art: Amazon Deequ, Schelter et al., VLDB 2018; Great
  * Expectations). A battery of rules compiles into the FEWEST jobs the rule
  * mix allows:
  *
  *   - Every ROW-LOCAL rule (not-null, range, set membership, regex) becomes
  *     one conditional-sum column of a SINGLE aggregation over the table —
  *     the whole battery costs one scan + one 1-row shuffle no matter how
  *     many rules it holds, and the partials are algebraic (map-side
  *     combine), so the shape is corpus-size-FLAT at 100 TB.
  *   - A UNIQUE rule costs one key-axis aggregation (map-side combined
  *     (key, cnt) partials — the shuffle carries the key domain, not rows).
  *   - A FOREIGN-KEY rule first aggregates the fact side down to its
  *     DISTINCT key domain (map-side combine again), then anti-joins that
  *     key table against the dimension's key column — the join touches two
  *     key-domain-sized tables, never the fact rows.
  *
  * Each rule carries a violation budget (`maxViolFrac`, default 0): the
  * check passes when violations/rows stays within it — the "99.9% of rows
  * conform" contract real pipelines enforce, with exact counts reported
  * either way.
  *
  * Reference analogy: the reference engine's hard input gates — the
  * empty-header abort (`src/sra/convert2sradb.cpp:113-116`) and the
  * prefilter-hit invariant (`src/sra/blockalign.cpp:290-298`) — are
  * member rules here (not-null / foreign-key) generalized to a declarative,
  * metric-reporting battery.
  */
object DataQuality {

  sealed trait Rule {
    /** Violation budget: passed ⇔ n_violations / n_rows <= maxViolFrac. */
    def maxViolFrac: Double
  }

  /** Column must be non-null. */
  final case class NotNull(column: String, maxViolFrac: Double = 0.0)
      extends Rule

  /** Non-null values must fall in [lo, hi]. Nulls are NotNull's business. */
  final case class InRange(column: String, lo: Double, hi: Double,
      maxViolFrac: Double = 0.0) extends Rule

  /** Non-null values must be members of `allowed`. */
  final case class InSet(column: String, allowed: Seq[String],
      maxViolFrac: Double = 0.0) extends Rule

  /** Non-null values must match the (Java/RE2-common subset) regex. Keep
    * patterns in the engine-portable subset: char classes, anchors,
    * quantifiers — no lookaround (DuckDB RE2 lacks it).
    */
  final case class MatchesRegex(column: String, pattern: String,
      maxViolFrac: Double = 0.0) extends Rule

  /** The column tuple must be a key: every group of size > 1 counts all its
    * rows as violations (Deequ's uniqueness, violation-counted).
    */
  final case class Unique(columns: Seq[String], maxViolFrac: Double = 0.0)
      extends Rule

  /** Non-null values must exist in `ref`'s `refColumn` (orphan detection).
    * `refName` labels the target in the report.
    */
  final case class ForeignKey(column: String, ref: DataFrame,
      refColumn: String, refName: String, maxViolFrac: Double = 0.0)
      extends Rule

  private def ruleName(r: Rule): String = r match {
    case _: NotNull      => "not_null"
    case _: InRange      => "in_range"
    case _: InSet        => "in_set"
    case _: MatchesRegex => "matches"
    case _: Unique       => "unique"
    case _: ForeignKey   => "foreign_key"
  }

  private def target(r: Rule): String = r match {
    case NotNull(c, _)          => c
    case InRange(c, _, _, _)    => c
    case InSet(c, _, _)         => c
    case MatchesRegex(c, _, _)  => c
    case Unique(cs, _)          => cs.mkString(",")
    case ForeignKey(c, _, rc, rn, _) => s"$c->$rn.$rc"
  }

  /** Violation predicate of a row-local rule. */
  private def violation(r: Rule): Column = r match {
    case NotNull(c, _)       => col(c).isNull
    case InRange(c, lo, hi, _) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case InSet(c, allowed, _) =>
      col(c).isNotNull && !col(c).isin(allowed: _*)
    case MatchesRegex(c, p, _) =>
      col(c).isNotNull && !col(c).rlike(p)
    case _ => throw new IllegalArgumentException(s"not row-local: $r")
  }

  /** Per-row violation tag column over the ROW-LOCAL rules of `rules`
    * (Unique/ForeignKey are table-level facts — they don't name a single
    * guilty row, so they can't route rows; validate() reports them). The
    * tag is the comma-joined sorted `rule:target` list of violated rules
    * ('' = clean) — a deterministic, engine-portable string, so a
    * quarantine channel can be hash-gated cross-engine.
    */
  def violationTags(rules: Seq[Rule]): Column = {
    val rowLocal = rules.filter {
      case _: Unique | _: ForeignKey => false
      case _                         => true
    }
    require(rowLocal.nonEmpty, "no row-local rules to tag with")
    array_join(array_sort(array_compact(array(rowLocal.map { r =>
      when(violation(r), lit(s"${ruleName(r)}:${target(r)}"))
        .otherwise(lit(null))
    }: _*))), ",")
  }

  /** Route `df` into (clean, quarantined) on the row-local rules — the
    * reference's hard input aborts (`convert2sradb.cpp:113-116`)
    * generalized to a quarantine channel: bad rows are diverted WITH
    * their violation tags (`dq_fail` column on the quarantine side), not
    * crashed on, so one malformed shard can't kill a 100 TB ingest. Both
    * frames share the scan; the predicate is a row-local projection
    * (codegen'd, no shuffle).
    */
  def route(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    require(!df.columns.contains("dq_fail"),
      "input already carries a dq_fail column — routing would silently " +
        "overwrite it (drop or rename the old tags first)")
    val tagged = df.withColumn("dq_fail", violationTags(rules))
    (tagged.filter(col("dq_fail") === "").drop("dq_fail"),
      tagged.filter(col("dq_fail") =!= ""))
  }

  /** Report schema: (rule, target, n_rows, n_violations, frac_ok, passed),
    * one row per rule, totally ordered. frac_ok is rounded to 6dp for the
    * cross-engine hash; `passed` compares the UNROUNDED exact fraction
    * against the budget (choose budgets away from attainable fractions —
    * they are k/n rationals).
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule battery")
    val rowLocal = rules.filter {
      case _: Unique | _: ForeignKey => false
      case _                         => true
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    if (rowLocal.nonEmpty) {
      val aggs = count(lit(1)).as("n") +: rowLocal.zipWithIndex.map {
        case (r, i) =>
          sum(when(violation(r), 1L).otherwise(0L)).as(s"v$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val rows = rowLocal.zipWithIndex.map { case (r, i) =>
        struct(lit(ruleName(r)).as("rule"), lit(target(r)).as("target"),
          col("n").as("n_rows"), col(s"v$i").as("n_violations"),
          lit(r.maxViolFrac).as("budget"))
      }
      frames += one.select(explode(array(rows: _*)).as("m")).select("m.*")
    }

    rules.foreach {
      case u @ Unique(cs, budget) =>
        val g = df.groupBy(cs.map(col): _*).agg(count(lit(1)).as("cnt"))
        frames += g.agg(
          lit(ruleName(u)).as("rule"), lit(target(u)).as("target"),
          sum(col("cnt")).as("n_rows"),
          sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
            .as("n_violations"),
          lit(budget).as("budget"))
      case f @ ForeignKey(c, ref, rc, _, budget) =>
        // Fact rows collapse to their distinct key domain FIRST (map-side
        // combined counts); the anti-join then runs key-domain vs
        // key-domain. Null keys are excluded (NotNull's rule if wanted).
        val keys = df.filter(col(c).isNotNull)
          .groupBy(col(c).as("k")).agg(count(lit(1)).as("cnt"))
        val orphans = keys.join(ref.select(col(rc).as("k")).distinct(),
          Seq("k"), "left_anti")
        val nAll = df.agg(count(lit(1)).as("n"))
        frames += nAll.crossJoin(
          orphans.agg(coalesce(sum(col("cnt")), lit(0L)).as("v")))
          .select(lit(ruleName(f)).as("rule"), lit(target(f)).as("target"),
            col("n").as("n_rows"), col("v").as("n_violations"),
            lit(budget).as("budget"))
      case _ => ()
    }

    // Zero-row inputs must yield a VERDICT, not NULLs: sums over no rows
    // are NULL (and Unique's n_rows too), and NULL/0 would leave `passed`
    // neither true nor false — a gate doing filter(!passed).isEmpty would
    // then release an unvalidated snapshot. An empty table has no
    // violating row, so every rule passes vacuously with frac_ok = 1.
    val n = coalesce(col("n_rows"), lit(0L))
    val v = coalesce(col("n_violations"), lit(0L))
    frames.reduce(_ unionAll _)
      .select(col("rule"), col("target"), n.as("n_rows"),
        v.as("n_violations"),
        when(n === 0, 1.0).otherwise(
          round(lit(1.0) - v.cast("double") / n, 6)).as("frac_ok"),
        when(n === 0, true).otherwise(
          v.cast("double") / n <= col("budget")).as("passed"))
      .orderBy(col("rule"), col("target"))
  }
}

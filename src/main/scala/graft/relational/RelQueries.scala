package graft.relational

import graft.{Q, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The generalized relational operator surface (SURVEY §2 mappings exercised
  * on the driver's TPC-H-ish corpus; see FIXTURES.md §3).
  *
  * Every query:
  *  - is a declarative DataFrame plan (Catalyst owns pushdown/pruning/join
  *    strategy; dimension joins are explicitly `broadcast`-hinted because at
  *    100 TB the fact side is huge and the dims stay small);
  *  - rounds floating aggregates so the DuckDB hash-compare is stable;
  *  - ends in a total ORDER BY (row-order-proof compare).
  */
object RelQueries {

  /** A4/A5 global aggregation — pricing summary (map-side partial agg). */
  val q1Agg = Q(
    "q1_agg",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
            .as("sum_disc_price"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             ROUND(SUM(l_quantity), 2)                          AS sum_qty,
             ROUND(SUM(l_extendedprice), 2)                     AS sum_price,
             ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             CAST(COUNT(*) AS BIGINT)                           AS cnt
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** J1/J4 fact⨝fact⨝broadcast-dims — revenue per nation. */
  val q2JoinAgg = Q(
    "q2_join_agg",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val o = T.orders(s, d)
      val c = T.customer(s, d)
      val n = T.nation(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy($"n_name")
        .agg(
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },
    Some("""
      SELECT n_name,
             ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             CAST(COUNT(*) AS BIGINT)                            AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1"""))

  /** A1 argmax dedup (`max_by` with full tie-break) — latest order per
    * customer; the reference's unique-k-mer representative pattern
    * (createkmertable.cpp:142-190) on generic data.
    */
  val q3Argmax = Q(
    "q3_argmax",
    (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy($"o_custkey")
        .agg(
          max_by(
            $"o_orderkey",
            struct($"o_orderdate", (-$"o_orderkey").as("neg")))
            .as("latest_orderkey"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_custkey")
    },
    Some("""
      WITH r AS (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
        FROM orders)
      SELECT o_custkey, o_orderkey AS latest_orderkey,
             CAST(cnt AS BIGINT) AS n_orders
      FROM r WHERE rn = 1 ORDER BY 1"""))

  /** A2 group-count-having — the prefilter's `count > requiredKmerMatches`
    * gate (comparekmertables.cpp:46-67) on generic keys.
    */
  val q4Having = Q(
    "q4_having",
    (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter($"n_orders" > 2)
        .orderBy($"o_custkey")
    },
    Some("""
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1 HAVING COUNT(*) > 2 ORDER BY 1"""))

  /** A3 per-group ordered collect — the align stage's hit gathering
    * (blockalign.cpp:279) as a sorted list, stringified for a stable compare.
    */
  val q5Collect = Q(
    "q5_collect",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(
          array_join(
            sort_array(collect_list($"l_linenumber".cast("string"))),
            ",").as("linenumbers"))
        .orderBy($"l_orderkey")
    },
    Some("""
      SELECT l_orderkey,
             STRING_AGG(CAST(l_linenumber AS VARCHAR), ','
                        ORDER BY CAST(l_linenumber AS VARCHAR)) AS linenumbers
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** A6 window-lag minimum gap — the min-diagonal-distance gate
    * (blockalign.cpp:61-69) generalized to order dates per customer.
    */
  val q6WindowLag = Q(
    "q6_window_lag",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      T.orders(s, d)
        .withColumn("prev", lag($"o_orderdate", 1).over(w))
        .withColumn("gap", datediff($"o_orderdate", $"prev"))
        .groupBy($"o_custkey")
        .agg(min($"gap").as("min_gap_days"))
        .filter($"min_gap_days".isNotNull)
        .orderBy($"o_custkey")
    },
    Some("""
      WITH g AS (
        SELECT o_custkey,
               DATE_DIFF('day',
                 LAG(o_orderdate) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS gap
        FROM orders)
      SELECT o_custkey, CAST(MIN(gap) AS INT) AS min_gap_days
      FROM g GROUP BY 1 HAVING MIN(gap) IS NOT NULL ORDER BY 1"""))

  /** U1 union-all concat of per-partition results (petasearch.sh:61-65). */
  val q7Union = Q(
    "q7_union",
    (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val hi = o.filter($"o_totalprice" > 400000)
        .select($"o_orderkey", lit("high_value").as("tag"))
      val urgent = o.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", lit("urgent").as("tag"))
      hi.unionAll(urgent).orderBy($"tag", $"o_orderkey")
    },
    Some("""
      SELECT * FROM (
        SELECT o_orderkey, 'high_value' AS tag FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT o_orderkey, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT')
      ORDER BY tag, o_orderkey"""))

  /** P9-style semi/anti join — customers with no orders (left_anti). */
  val q8Anti = Q(
    "q8_anti_join",
    (s, d) => {
      import s.implicits._
      val c = T.customer(s, d)
      val urgent = T.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  /** O6-style total-order + LIMIT top-k (strengthened vs the reference's
    * per-thread-only order, SURVEY §2.12.4).
    */
  val q9TopK = Q(
    "q9_topk",
    (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .select($"o_orderkey", round($"o_totalprice", 2).as("total"))
        .orderBy($"total".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""
      SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
      FROM orders ORDER BY total DESC, o_orderkey LIMIT 10"""))

  /** P1/P2/C13 scalar string surface — translate, regexp extraction,
    * printf-style formatting (the m8 row formatter family).
    */
  val q10Scalar = Q(
    "q10_scalar_fns",
    (s, d) => {
      import s.implicits._
      T.part(s, d)
        .select(
          $"p_partkey",
          translate($"p_name", " ", "_").as("name_u"),
          regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"),
          format_string("%s|%05d|%.2f", $"p_type", $"p_size", $"p_retailprice")
            .as("packed"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
             TRANSLATE(p_name, ' ', '_')            AS name_u,
             REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
             PRINTF('%s|%05d|%.2f', p_type, p_size, p_retailprice) AS packed
      FROM part ORDER BY p_partkey"""))

  /** O2-style multi-key window rank — suppliers ranked within nation. */
  val q11Rank = Q(
    "q11_window_rank",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"s_nationkey")
        .orderBy($"s_acctbal".desc, $"s_suppkey")
      T.supplier(s, d)
        .withColumn("rk", row_number().over(w))
        .select($"s_nationkey", $"s_suppkey", round($"s_acctbal", 2).as("bal"), $"rk")
        .orderBy($"s_nationkey", $"rk")
    },
    Some("""
      SELECT s_nationkey, s_suppkey, ROUND(s_acctbal, 2) AS bal,
             CAST(ROW_NUMBER() OVER
               (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
               AS INT) AS rk
      FROM supplier ORDER BY s_nationkey, rk"""))

  /** §2.10-extension batch shape of the streaming ingest: tumbling 1-hour
    * event-time windows per type (same plan Structured Streaming runs).
    */
  val q12EventsWindow = Q(
    "q12_events_window",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(
          date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm").as("hour"),
          $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"hour", $"event_type")
    },
    Some("""
      SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M') AS hour,
             event_type,
             CAST(COUNT(*) AS BIGINT)  AS n,
             ROUND(SUM(value), 2)      AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** §2.9-extension JSON path extraction over the events props column. */
  val q13Json = Q(
    "q13_json_extract",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .filter($"k" > 90)
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, CAST(props ->> '$.k' AS BIGINT) AS k
      FROM events WHERE CAST(props ->> '$.k' AS BIGINT) > 90
      ORDER BY event_id"""))

  /** Correlated-scalar shape: orders above their customer's average. */
  val q14AboveAvg = Q(
    "q14_above_avg",
    (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val avgs = o.groupBy($"o_custkey".as("k"))
        .agg(avg($"o_totalprice").as("avg_price"))
      o.join(avgs, o("o_custkey") === avgs("k"))
        .filter($"o_totalprice" > $"avg_price" * 1.5)
        .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("total"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total
      FROM orders o
      WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders
                                  WHERE o_custkey = o.o_custkey)
      ORDER BY o_orderkey"""))

  /** Gap-based sessionization (batch form of the streaming session path):
    * a >30-minute silence starts a new session; per-user session stats.
    */
  val q15Sessionize = Q(
    "q15_sessionize",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, d)
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("new_session",
          when($"prev".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev") > 1800, 1).otherwise(0))
        .groupBy($"user_id")
        .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },
    Some("""
      WITH g AS (
        SELECT user_id,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      OR date_diff('second',
                           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                           ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events)
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM g GROUP BY 1 ORDER BY 1"""))

  /** Grouping-sets surface (absent in the reference; free in Spark —
    * SURVEY §2.5 note): ROLLUP over (returnflag, linestatus).
    */
  val q16Rollup = Q(
    "q16_rollup",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"sum_qty", $"cnt")
        .orderBy($"rf", $"ls")
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             CAST(COUNT(*) AS BIGINT)  AS cnt
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY rf, ls"""))

  /** INTERSECT / EXCEPT surface (absent in the reference; exercised per
    * SURVEY §2.7): customers with urgent orders vs with high-value orders.
    */
  val q17SetOps = Q(
    "q17_setops",
    (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
      val hi = o.filter($"o_totalprice" > 300000).select($"o_custkey")
      val both = urgent.intersect(hi).withColumn("tag", lit("both"))
      val urgentOnly = urgent.except(hi).withColumn("tag", lit("urgent_only"))
      both.unionAll(urgentOnly).orderBy($"tag", $"o_custkey")
    },
    Some("""
      SELECT * FROM (
        SELECT o_custkey, 'both' AS tag FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        UNION ALL
        SELECT o_custkey, 'urgent_only' AS tag FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_totalprice > 300000))
      ORDER BY tag, o_custkey"""))

  /** Backward as-of join (`ops.AsofJoin.asofBackward`): each click joined
    * to the user's most recent prior-or-simultaneous purchase. The oracle
    * is DuckDB's NATIVE `ASOF LEFT JOIN` — the union-tag-window plan is
    * verified against a first-class implementation of the semantics, not
    * a reimplementation of our own rewrite. Output uses second-epoch
    * deltas (both engines floor to seconds identically; ts itself is
    * microsecond-aligned in the fixture so the `>=` comparisons agree).
    */
  val q18Asof = Q(
    "q18_asof",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purch = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))
      graft.ops.AsofJoin.asofBackward(clicks, purch, Seq("user_id"), "ts",
        Seq("pvalue"))
        .select($"event_id", $"user_id",
          (unix_timestamp($"ts") - unix_timestamp($"asof_ts"))
            .as("secs_since"),
          round($"asof_pvalue", 4).as("asof_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH l AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      r AS (
        SELECT user_id, ts, MAX(value) AS pvalue FROM events
        WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id,
             CAST(date_diff('second', r.ts, l.ts) AS BIGINT) AS secs_since,
             ROUND(r.pvalue, 4) AS asof_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id"""))

  /** Banded range join (`ops.RangeJoin.intervalJoin`): clicks within ±1 h
    * of a same-user purchase. The naive inequality join is a
    * broadcast-nested-loop in Spark; the banded rewrite runs it as a hash
    * equi-join on (user, band) + exact residual filter. The oracle is the
    * PLAIN inequality join — the rewrite must be invisible.
    */
  val q19Range = Q(
    "q19_range",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val iv = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_id"),
          ($"ts" - expr("INTERVAL 3600 SECONDS")).as("start_ts"),
          ($"ts" + expr("INTERVAL 3600 SECONDS")).as("end_ts"), $"value")
      graft.ops.RangeJoin.intervalJoin(clicks, iv, Seq("user_id"), "ts",
        "start_ts", "end_ts", bandWidth = 3600L)
        .select($"event_id", $"user_id", $"iv_p_id",
          round($"iv_value", 4).as("p_value"))
        .orderBy($"event_id", $"iv_p_id")
    },
    Some("""
      WITH l AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      r AS (
        SELECT user_id, event_id AS p_id, ts, value FROM events
        WHERE event_type = 'purchase')
      SELECT l.event_id, l.user_id, r.p_id AS iv_p_id,
             ROUND(r.value, 4) AS p_value
      FROM l JOIN r ON l.user_id = r.user_id
        AND r.ts - INTERVAL 3600 SECOND <= l.ts
        AND l.ts <= r.ts + INTERVAL 3600 SECOND
      ORDER BY l.event_id, iv_p_id"""))

  /** Forward as-of join: each click joined to the user's NEXT purchase at
    * or after click time. DuckDB's ASOF JOIN is backward-only, so the
    * oracle runs it on NEGATED epoch time — forward-on-t is exactly
    * backward-on-(-t), which makes the native implementation verify this
    * direction too.
    */
  val q20AsofFwd = Q(
    "q20_asof_fwd",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purch = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))
      graft.ops.AsofJoin.asofForward(clicks, purch, Seq("user_id"), "ts",
        Seq("pvalue"))
        .select($"event_id", $"user_id",
          (unix_timestamp($"asof_ts") - unix_timestamp($"ts"))
            .as("secs_until"),
          round($"asof_pvalue", 4).as("asof_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH l AS (
        SELECT event_id, user_id, -epoch_us(ts) AS nts, ts
        FROM events WHERE event_type = 'click'),
      r AS (
        SELECT user_id, -epoch_us(ts) AS nts, ts, MAX(value) AS pvalue
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3)
      SELECT l.event_id, l.user_id,
             CAST(date_diff('second', l.ts, r.ts) AS BIGINT) AS secs_until,
             ROUND(r.pvalue, 4) AS asof_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.nts >= r.nts
      ORDER BY l.event_id"""))

  /** Nearest as-of join: each click matched to the temporally CLOSEST
    * same-user purchase in either direction (exact microsecond deltas;
    * ties prefer the backward match). The oracle composes DuckDB's two
    * native ASOF directions with the same CASE arbitration.
    */
  val q21AsofNearest = Q(
    "q21_asof_nearest",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purch = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))
      graft.ops.AsofJoin.asofNearest(clicks, purch, Seq("user_id"), "ts",
        Seq("pvalue"))
        .select($"event_id", $"user_id",
          (unix_timestamp($"asof_ts") - unix_timestamp($"ts"))
            .as("secs_offset"),
          round($"asof_pvalue", 4).as("asof_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH l AS (
        SELECT event_id, user_id, ts, epoch_us(ts) AS us, -epoch_us(ts) AS nus
        FROM events WHERE event_type = 'click'),
      r AS (
        SELECT user_id, ts, epoch_us(ts) AS us, -epoch_us(ts) AS nus,
               MAX(value) AS pvalue
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3, 4),
      bwd AS (
        SELECT l.event_id, r.ts AS bts, r.us AS bus, r.pvalue AS bval
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.us >= r.us),
      fwd AS (
        SELECT l.event_id, r.ts AS fts, r.us AS fus, r.pvalue AS fval
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.nus >= r.nus),
      pick AS (
        SELECT l.event_id, l.user_id, l.ts, l.us,
               CASE WHEN b.bts IS NOT NULL AND
                         (f.fts IS NULL OR l.us - b.bus <= f.fus - l.us)
                    THEN b.bts ELSE f.fts END AS ats,
               CASE WHEN b.bts IS NOT NULL AND
                         (f.fts IS NULL OR l.us - b.bus <= f.fus - l.us)
                    THEN b.bval ELSE f.fval END AS aval
        FROM l JOIN bwd b USING (event_id) JOIN fwd f USING (event_id))
      SELECT event_id, user_id,
             CAST(date_diff('second', ts, ats) AS BIGINT) AS secs_offset,
             ROUND(aval, 4) AS asof_value
      FROM pick ORDER BY event_id"""))

  /** Tolerance-bounded backward as-of (pandas merge_asof `tolerance`):
    * like q18, but a match more than 30 minutes before the click is
    * nulled out — the click row survives unmatched instead of carrying a
    * stale snapshot. The oracle post-gates DuckDB's native ASOF match
    * with the same interval comparison.
    */
  val q22AsofTolerance = Q(
    "q22_asof_tolerance",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purch = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))
      graft.ops.AsofJoin.asofBackward(clicks, purch, Seq("user_id"), "ts",
        Seq("pvalue"), tolerance = Some(expr("INTERVAL 30 MINUTES")))
        .select($"event_id", $"user_id",
          (unix_timestamp($"ts") - unix_timestamp($"asof_ts"))
            .as("secs_since"),
          round($"asof_pvalue", 4).as("asof_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH l AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      r AS (
        SELECT user_id, ts, MAX(value) AS pvalue FROM events
        WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id,
             CASE WHEN r.ts IS NOT NULL AND l.ts - r.ts <= INTERVAL 30 MINUTE
                  THEN CAST(date_diff('second', r.ts, l.ts) AS BIGINT)
             END AS secs_since,
             CASE WHEN r.ts IS NOT NULL AND l.ts - r.ts <= INTERVAL 30 MINUTE
                  THEN ROUND(r.pvalue, 4)
             END AS asof_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id"""))

  /** Strict backward as-of (pandas merge_asof allow_exact_matches=False):
    * both sides truncate ts to the minute (the raw fixture has zero exact
    * click/purchase collisions, so strictness over raw ts would be
    * vacuous — truncation manufactures equal-minute pairs the gate must
    * skip), then each click matches the most recent purchase minute
    * STRICTLY before its own. The oracle uses DuckDB's native ASOF with a
    * `>` comparison.
    */
  val q23AsofStrict = Q(
    "q23_asof_strict",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id",
          date_trunc("minute", $"ts").as("ts"))
      val purch = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", date_trunc("minute", $"ts").as("ts"))
        .agg(max($"value").as("pvalue"))
      graft.ops.AsofJoin.asofBackward(clicks, purch, Seq("user_id"), "ts",
        Seq("pvalue"), allowExactMatches = false)
        .select($"event_id", $"user_id",
          (unix_timestamp($"ts") - unix_timestamp($"asof_ts"))
            .as("secs_since"),
          round($"asof_pvalue", 4).as("asof_value"))
        .orderBy($"event_id")
    },
    Some("""
      WITH l AS (
        SELECT event_id, user_id, date_trunc('minute', ts) AS ts
        FROM events WHERE event_type = 'click'),
      r AS (
        SELECT user_id, date_trunc('minute', ts) AS ts, MAX(value) AS pvalue
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id,
             CAST(date_diff('second', r.ts, l.ts) AS BIGINT) AS secs_since,
             ROUND(r.pvalue, 4) AS asof_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts > r.ts
      ORDER BY l.event_id"""))

  /** The banded bounded-staleness as-of (scale path for hot keys) over the
    * SAME fixture and oracle as q22: interval-join + argmax must produce
    * bit-identical rows to the window plan and to DuckDB's post-gated
    * native ASOF.
    */
  val q24AsofBanded = Q(
    "q24_asof_banded",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purch = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))
      graft.ops.AsofJoin.asofBackwardBanded(clicks, purch, Seq("user_id"),
        "ts", Seq("pvalue"), toleranceSec = 1800L, leftIdCol = "event_id")
        .select($"event_id", $"user_id",
          (unix_timestamp($"ts") - unix_timestamp($"asof_ts"))
            .as("secs_since"),
          round($"asof_pvalue", 4).as("asof_value"))
        .orderBy($"event_id")
    },
    q22AsofTolerance.oracle)

  /** PIVOT (absent in the reference; long-to-wide reshaping per SURVEY
    * §2.9's "inherited built-ins" surface): per linestatus, one column per
    * return flag. The value list is EXPLICIT — the open-ended form runs a
    * distinct-values job first and bakes scan-order-dependent columns into
    * the schema, both wrong at corpus scale. The oracle is the standard
    * conditional-aggregation desugaring.
    */
  val q25Pivot = Q(
    "q25_pivot",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum($"l_quantity"), 2))
        .select($"l_linestatus".as("ls"), $"A".as("a_qty"),
          $"N".as("n_qty"), $"R".as("r_qty"))
        .orderBy($"ls")
    },
    Some("""
      SELECT l_linestatus AS ls,
             ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS a_qty,
             ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS n_qty,
             ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS r_qty
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** UNPIVOT/melt (wide-to-long reshaping): three measure columns stack
    * into (metric, val) rows — row-local, no shuffle beyond the downstream
    * aggregation — then aggregate per (returnflag, metric). The oracle
    * replays the stack as a metric-name cross join.
    */
  val q26Unpivot = Q(
    "q26_unpivot",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_returnflag", $"l_quantity".cast("double").as("l_quantity"),
          $"l_discount".cast("double").as("l_discount"),
          $"l_tax".cast("double").as("l_tax"))
        .unpivot(Array($"l_returnflag"),
          Array($"l_quantity", $"l_discount", $"l_tax"), "metric", "val")
        .groupBy($"l_returnflag", $"metric")
        .agg(round(sum($"val"), 2).as("total"))
        .select($"l_returnflag".as("rf"), $"metric", $"total")
        .orderBy($"rf", $"metric")
    },
    Some("""
      SELECT l_returnflag AS rf, m.metric,
             ROUND(SUM(CASE m.metric
                       WHEN 'l_quantity' THEN l_quantity
                       WHEN 'l_discount' THEN l_discount
                       ELSE l_tax END), 2) AS total
      FROM lineitem
      CROSS JOIN (VALUES ('l_quantity'), ('l_discount'), ('l_tax')) m(metric)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** CUBE — all 2^n grouping-set combinations in one shuffle (q16 covers
    * the hierarchical ROLLUP prefix subset); grouping_id() disambiguates
    * a real NULL key from a subtotal row, which COALESCE alone cannot.
    */
  val q27Cube = Q(
    "q27_cube",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("cnt"),
          grouping_id().cast("int").as("gid"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"sum_qty", $"cnt", $"gid")
        .orderBy($"gid", $"rf", $"ls")
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             CAST(COUNT(*) AS BIGINT)  AS cnt,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid, rf, ls"""))

  /** Sliding (hopping) event-time windows — q12's tumbling twin with
    * overlap: 1-hour windows every 30 minutes, so each event lands in
    * exactly duration/slide = 2 grid-aligned windows. Spark expands the
    * window set row-locally (no self-join); the oracle replays the same
    * epoch-grid arithmetic in exact integer microseconds.
    */
  val q28SlidingWindow = Q(
    "q28_sliding_window",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("ws"),
          $"event_type", $"n", $"sum_value")
        .orderBy($"ws", $"event_type")
    },
    Some("""
      SELECT STRFTIME(make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
                                     - s.o), '%Y-%m-%d %H:%M') AS ws,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(value), 2)     AS sum_value
      FROM events
      CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1800000000 AS BIGINT))) s(o)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Native session_window — q15 counted sessions per user via
    * gaps-and-islands; this emits the SESSIONS themselves through Spark's
    * built-in session_window (dynamic, data-driven windows merged by the
    * aggregation itself). Boundary semantics differ from q15's lag
    * formulation: an event at exactly prev + gap starts a NEW session
    * (window end is exclusive), so the oracle's island condition is
    * >= gap in exact integer microseconds — second-truncating date_diff
    * would misclassify sub-second stragglers (every event ts here
    * carries microseconds).
    */
  val q29SessionWindow = Q(
    "q29_session_window",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          date_format($"sw.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
          $"n_events")
        .orderBy($"user_id", $"session_start")
    },
    Some("""
      WITH g AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT user_id,
             STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM s GROUP BY user_id, sid ORDER BY 1, 2"""))

  /** Event-time RANGE window frame: per-user rolling last-hour count and
    * value sum at EVERY event — the window-frame face of a sliding
    * aggregate (no bucketing: each row gets its own trailing interval).
    * Spark's rangeBetween is numeric-only, so the frame rides
    * `unix_micros(ts)` with a [-3600·10⁶, 0] frame — microsecond-exact
    * and identical to DuckDB's native `RANGE INTERVAL 1 HOUR PRECEDING`
    * (both ends inclusive, peers-by-value semantics in both engines).
    * Scale shape: one hash shuffle on user_id + per-partition sort —
    * the same cost as any per-key window; the frame itself is a running
    * two-pointer over the sorted run, no fan-out.
    */
  val q30RangeFrame = Q(
    "q30_range_frame",
    (s, d) => {
      import s.implicits._
      // unix_micros needs TIMESTAMP; the cast is a no-op there and maps
      // NTZ wall-clock through the session zone — exact under the
      // harness's pinned UTC (no DST), the documented session convention
      // (same caveat ADVICE records for AsofJoin's NTZ handling)
      val w = Window.partitionBy($"user_id")
        .orderBy(unix_micros($"ts".cast("timestamp")))
        .rangeBetween(-3600L * 1000000L, 0L)
      T.events(s, d)
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", round(sum($"value").over(w), 2))
        .select($"event_id", $"user_id", $"n_1h", $"sum_1h")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
             ROUND(SUM(value) OVER w, 2) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** Sequential conversion funnel (view → click → purchase): per user the
    * earliest view, the first click strictly after it, the first purchase
    * strictly after that click — the greedy-earliest chain every product
    * funnel tool computes ("time to convert" semantics, order enforced,
    * not mere per-type minima). Three user-keyed min-aggregations chained
    * by joins; after the first agg every intermediate is one row per
    * user, so the chain's cost is the event scan + one user_id shuffle
    * per stage. Timestamps emit as microsecond strings for a stable
    * cross-engine compare.
    */
  val q31Funnel = Q(
    "q31_funnel",
    (s, d) => {
      import s.implicits._
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val ev = T.events(s, d)
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("vt"))
      val c = ev.filter($"event_type" === "click")
        .join(v, Seq("user_id")).filter($"ts" > $"vt")
        .groupBy($"user_id").agg(min($"ts").as("ct"))
      val p = ev.filter($"event_type" === "purchase")
        .join(c, Seq("user_id")).filter($"ts" > $"ct")
        .groupBy($"user_id").agg(min($"ts").as("pt"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select($"user_id",
          date_format($"vt", fmt).as("view_ts"),
          date_format($"ct", fmt).as("click_ts"),
          date_format($"pt", fmt).as("purchase_ts"),
          (lit(1) + when($"ct".isNotNull, 1).otherwise(0)
            + when($"pt".isNotNull, 1).otherwise(0)).cast("int").as("stage"))
        .orderBy($"user_id")
    },
    Some("""
      WITH v AS (
        SELECT user_id, MIN(ts) AS vt FROM events
        WHERE event_type = 'view' GROUP BY 1),
      c AS (
        SELECT e.user_id, MIN(e.ts) AS ct
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY 1),
      p AS (
        SELECT e.user_id, MIN(e.ts) AS pt
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY 1)
      SELECT v.user_id,
             STRFTIME(vt, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
             STRFTIME(ct, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
             STRFTIME(pt, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
             CAST(1 + CASE WHEN ct IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN pt IS NULL THEN 0 ELSE 1 END AS INT) AS stage
      FROM v LEFT JOIN c ON c.user_id = v.user_id
             LEFT JOIN p ON p.user_id = v.user_id
      ORDER BY 1"""))

  /** SCD type-2 history derivation from a change log — the warehouse
    * maintenance pattern behind every slowly-changing dimension: collapse
    * each user's event stream to its `event_type` CHANGE points, then
    * stamp each state with its validity interval ([valid_from, valid_to),
    * open-ended for the current state) and version number. Two window
    * passes over ONE user_id shuffle + per-partition sort (the lag
    * change-detect and the lead/row_number stamping share the same
    * partitioning, so Catalyst plans a single Exchange); no joins, no
    * fan-out — at 100 TB the cost is exactly the event table's key
    * shuffle, and the output is bounded by the true change count.
    */
  private val scd2Fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def scd2Formatted(hist: org.apache.spark.sql.DataFrame) =
    hist.select(col("user_id"), col("state"),
      date_format(col("valid_from"), scd2Fmt).as("valid_from"),
      date_format(col("valid_to"), scd2Fmt).as("valid_to"),
      col("version"), col("is_current"))
      .orderBy(col("user_id"), col("version"))

  private val scd2OracleSql = """
      WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev
        FROM events),
      ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
      v AS (
        SELECT user_id, event_type, ts,
               LEAD(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS vt,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS INT) AS version
        FROM ch)
      SELECT user_id, event_type AS state,
             STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             STRFTIME(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             version, vt IS NULL AS is_current
      FROM v ORDER BY user_id, version"""

  val q32Scd2 = Q(
    "q32_scd2",
    (s, d) => scd2Formatted(Scd2.build(T.events(s, d))),
    Some(scd2OracleSql))

  /** Incremental SCD2 maintenance: build the persisted history on the
    * first 90% of the time range, fold the trailing 10% in via
    * [[Scd2.merge]] (touched-users-only, O(batch)), and hash-match the
    * SAME full-recompute oracle as q32 — the merge must be
    * indistinguishable from a rebuild, the house contract every
    * incremental index row proves (dedup_index_search, text_bm25_indexed,
    * ModesSpec appends).
    */
  val q33Scd2Incr = Q(
    "q33_scd2_incr",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .withColumn("_us", unix_micros($"ts".cast("timestamp")))
      // 90%-of-timespan cutoff from two bounded driver scalars
      val r = ev.agg(min($"_us"), max($"_us")).head()
      val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 9 / 10
      val dir = java.nio.file.Files.createTempDirectory("scd2i").toString
      // nBuckets is a layout parameter sized to the table (64-dir commit
      // overhead dominates this row's cost on a local FS at ~100k rows;
      // a real deployment sizes buckets to history volume)
      Scd2.init(ev.filter($"_us" < cut).drop("_us"), dir, nBuckets = 16)
      Scd2.merge(s, dir, ev.filter($"_us" >= cut).drop("_us"),
        nBuckets = 16)
      scd2Formatted(s.read.parquet(s"$dir/history"))
    },
    Some(scd2OracleSql))

  /** Point-in-time SCD2 snapshot — the state every user had at the
    * 80%-of-timespan mark (the dimension read a backfill/audit runs):
    * interval containment selects at most one version per user, so the
    * read is a scan-speed filter over history, no shuffle. The oracle
    * replays the history derivation AND the epoch-microsecond cut
    * arithmetic (integer division in both engines).
    */
  val q37Scd2Snapshot = Q(
    "q37_scd2_snapshot",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val us = ev.select(unix_micros($"ts".cast("timestamp")).as("_us"))
        .agg(min($"_us"), max($"_us")).head()
      val cut = us.getLong(0) + (us.getLong(1) - us.getLong(0)) * 8 / 10
      Scd2.snapshotAt(Scd2.build(ev), timestamp_micros(lit(cut)))
        .select($"user_id", $"state",
          date_format($"valid_from", scd2Fmt).as("valid_from"),
          $"version")
        .orderBy($"user_id")
    },
    Some("""
      WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev
        FROM events),
      ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
      v AS (
        SELECT user_id, event_type, ts,
               LEAD(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS vt,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS INT) AS version
        FROM ch),
      cutv AS (
        SELECT MIN(epoch_us(ts)) +
               (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) * 8 // 10 AS cutus
        FROM events)
      SELECT user_id, event_type AS state,
             STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from, version
      FROM v CROSS JOIN cutv
      WHERE epoch_us(ts) <= cutus
        AND (vt IS NULL OR cutus < epoch_us(vt))
      ORDER BY user_id"""))

  /** Temporal dimension lookup — every purchase event enriched with its
    * user's state AT the purchase's own timestamp (the canonical SCD2
    * consumption join): equi-join on user_id with the validity interval
    * as the join residual. Zero-width versions (same-ts state flips)
    * match nothing by construction in both engines.
    */
  val q38Scd2Lookup = Q(
    "q38_scd2_lookup",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val purch = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      Scd2.lookupAsOf(purch, Scd2.build(ev), "ts")
        .select($"event_id", $"user_id", $"dim_state", $"dim_version")
        .orderBy($"event_id")
    },
    Some("""
      WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev
        FROM events),
      ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
      v AS (
        SELECT user_id, event_type, ts,
               LEAD(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS vt,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS INT) AS version
        FROM ch),
      p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, v.event_type AS dim_state,
             v.version AS dim_version
      FROM p LEFT JOIN v
        ON v.user_id = p.user_id AND p.ts >= v.ts
       AND (v.vt IS NULL OR p.ts < v.vt)
      ORDER BY p.event_id"""))

  /** SCD2 change feed — the CDC delta between the dimension BEFORE and
    * AFTER folding the last 20% of the log (what a downstream consumer
    * subscribes to instead of re-reading history): new versions opened
    * (`insert`) and previously-open intervals capped by a successor
    * (`close`). The diff keys on (user_id, version) — immutable once
    * minted — so the oracle is a full outer join of two independently
    * rebuilt histories.
    */
  private val scd2ChangesOracleSql = """
      WITH cutv AS (
        SELECT MIN(epoch_us(ts)) +
               (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) * 8 // 10 AS cutus
        FROM events),
      bo AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev
        FROM events, cutv WHERE epoch_us(ts) < cutus),
      bch AS (SELECT * FROM bo WHERE prev IS NULL OR prev <> event_type),
      bv AS (
        SELECT user_id, event_type AS state, ts AS vf,
               LEAD(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS vt,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS INT) AS version
        FROM bch),
      ao AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev
        FROM events),
      ach AS (SELECT * FROM ao WHERE prev IS NULL OR prev <> event_type),
      av AS (
        SELECT user_id, event_type AS state, ts AS vf,
               LEAD(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS vt,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS INT) AS version
        FROM ach)
      SELECT COALESCE(av.user_id, bv.user_id) AS user_id,
             COALESCE(av.version, bv.version) AS version,
             CASE WHEN bv.user_id IS NULL THEN 'insert'
                  WHEN av.user_id IS NULL THEN 'delete'
                  WHEN bv.state = av.state AND bv.vf = av.vf THEN 'close'
                  ELSE 'update' END AS change_type,
             COALESCE(av.state, bv.state) AS state,
             STRFTIME(COALESCE(av.vf, bv.vf),
               '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             STRFTIME(CASE WHEN av.user_id IS NOT NULL THEN av.vt
                           ELSE bv.vt END,
               '%Y-%m-%d %H:%M:%S.%f') AS valid_to
      FROM bv FULL JOIN av
        ON bv.user_id = av.user_id AND bv.version = av.version
      WHERE bv.user_id IS NULL OR av.user_id IS NULL
         OR NOT (bv.state = av.state AND bv.vf = av.vf
                 AND bv.vt IS NOT DISTINCT FROM av.vt)
      ORDER BY user_id, version"""

  val q39Scd2Changes = Q(
    "q39_scd2_changes",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .withColumn("_us", unix_micros($"ts".cast("timestamp")))
      val r = ev.agg(min($"_us"), max($"_us")).head()
      val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 8 / 10
      val before = Scd2.build(ev.filter($"_us" < cut).drop("_us"))
      val after = Scd2.build(ev.drop("_us"))
      Scd2.changesBetween(before, after)
        .select($"user_id", $"version", $"change_type", $"state",
          date_format($"valid_from", scd2Fmt).as("valid_from"),
          date_format($"valid_to", scd2Fmt).as("valid_to"))
        .orderBy($"user_id", $"version")
    },
    Some(scd2ChangesOracleSql))

  /** The same CDC delta, derived from the WRITE path instead of a table
    * diff: init the persisted dimension from the first 80% of the log,
    * merge the rest with the outbox on, and return what landed in the
    * feed. The fold-derived outbox must equal [[Scd2.changesBetween]] of
    * the two rebuilds — so this row reuses q39's oracle verbatim, and
    * DuckDB directly validates the merge's own change classification.
    */
  val q40Scd2Outbox = Q(
    "q40_scd2_outbox",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .withColumn("_us", unix_micros($"ts".cast("timestamp")))
      val r = ev.agg(min($"_us"), max($"_us")).head()
      val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 8 / 10
      val dir = java.nio.file.Files.createTempDirectory("scd2ob").toString
      Scd2.init(ev.filter($"_us" < cut).drop("_us"), dir, nBuckets = 16)
      Scd2.merge(s, dir, ev.filter($"_us" >= cut).drop("_us"),
        nBuckets = 16, changesTo = Some(s"$dir/changes/batch=0"))
      s.read.parquet(s"$dir/changes/batch=0")
        .select($"user_id", $"version", $"change_type", $"state",
          date_format($"valid_from", scd2Fmt).as("valid_from"),
          date_format($"valid_to", scd2Fmt).as("valid_to"))
        .orderBy($"user_id", $"version")
    },
    Some(scd2ChangesOracleSql))

  /** Column profiler — the schema-drift / data-quality telemetry every
    * warehouse runs before trusting a new drop: per-column non-null and
    * exact-distinct counts plus numeric min/max, ONE row per profiled
    * column. One aggregation job (Spark plans the multi-distinct via its
    * Expand operator — one shuffle carrying k tagged copies, k = profiled
    * columns, the standard exact-multi-distinct trade); the single result
    * row unpivots row-locally. String columns report null min/max —
    * cross-engine string collation never enters the hash compare.
    */
  val q34Profile = Q(
    "q34_profile",
    (s, d) => {
      import s.implicits._
      val num = Seq("l_quantity", "l_extendedprice", "l_discount")
      val str = Seq("l_returnflag", "l_linestatus")
      val aggs = (num ++ str).flatMap { c =>
        Seq(count(col(c)).as(s"${c}__n"),
          countDistinct(col(c)).as(s"${c}__d"))
      } ++ num.flatMap { c =>
        Seq(round(min(col(c)), 4).as(s"${c}__mn"),
          round(max(col(c)), 4).as(s"${c}__mx"))
      }
      val one = T.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      val rows = (num ++ str).map { c =>
        struct(lit(c).as("col_name"), col(s"${c}__n").as("n_nonnull"),
          col(s"${c}__d").as("n_distinct"),
          (if (num.contains(c)) col(s"${c}__mn")
           else lit(null).cast("double")).as("min_num"),
          (if (num.contains(c)) col(s"${c}__mx")
           else lit(null).cast("double")).as("max_num"))
      }
      one.select(explode(array(rows: _*)).as("p"))
        .select($"p.col_name", $"p.n_nonnull", $"p.n_distinct",
          $"p.min_num", $"p.max_num")
        .orderBy($"col_name")
    },
    Some("""
      SELECT * FROM (
        SELECT 'l_quantity' AS col_name,
               CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
               ROUND(MIN(l_quantity), 4) AS min_num,
               ROUND(MAX(l_quantity), 4) AS max_num FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
               CAST(COUNT(l_extendedprice) AS BIGINT),
               CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
               ROUND(MIN(l_extendedprice), 4),
               ROUND(MAX(l_extendedprice), 4) FROM lineitem
        UNION ALL
        SELECT 'l_discount',
               CAST(COUNT(l_discount) AS BIGINT),
               CAST(COUNT(DISTINCT l_discount) AS BIGINT),
               ROUND(MIN(l_discount), 4),
               ROUND(MAX(l_discount), 4) FROM lineitem
        UNION ALL
        SELECT 'l_returnflag',
               CAST(COUNT(l_returnflag) AS BIGINT),
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_linestatus',
               CAST(COUNT(l_linestatus) AS BIGINT),
               CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem)
      ORDER BY col_name"""))

  /** Distribution profiler — exact p25/p50/p75 per numeric column, the
    * spread stats q34's min/max telemetry lacks. ONE aggregation job
    * computes every column's percentile array (Spark's exact
    * `percentile` buffers the column's values per agg — fine at gate
    * scale and required for a cross-engine hash match; at 100 TB swap
    * in `approx_percentile`, whose t-digest sketch is mergeable
    * map-side but engine-specific). DuckDB's `quantile_cont` shares the
    * linear-interpolation definition, and rounding to 4 keeps last-ulp
    * arithmetic differences out of the compare.
    */
  val q41ProfileQuantiles = Q(
    "q41_profile_quantiles",
    (s, d) => {
      import s.implicits._
      val num = Seq("l_quantity", "l_extendedprice", "l_discount")
      val ps = Seq(0.25, 0.5, 0.75)
      val aggs = num.map(c =>
        percentile(col(c), lit(ps.toArray)).as(s"${c}__q"))
      val one = T.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      val rows = for { c <- num; (p, i) <- ps.zipWithIndex } yield
        struct(lit(c).as("col_name"), lit(p).as("p"),
          round(element_at(col(s"${c}__q"), i + 1), 4).as("value"))
      one.select(explode(array(rows: _*)).as("r"))
        .select($"r.col_name", $"r.p", $"r.value")
        .orderBy($"col_name", $"p")
    },
    Some("""
      SELECT col_name, CAST(p AS DOUBLE) AS p, value FROM (
        SELECT 'l_quantity' AS col_name, 0.25 AS p,
               ROUND(quantile_cont(l_quantity, 0.25), 4) AS value
        FROM lineitem
        UNION ALL SELECT 'l_quantity', 0.5,
          ROUND(quantile_cont(l_quantity, 0.5), 4) FROM lineitem
        UNION ALL SELECT 'l_quantity', 0.75,
          ROUND(quantile_cont(l_quantity, 0.75), 4) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 0.25,
          ROUND(quantile_cont(l_extendedprice, 0.25), 4) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 0.5,
          ROUND(quantile_cont(l_extendedprice, 0.5), 4) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 0.75,
          ROUND(quantile_cont(l_extendedprice, 0.75), 4) FROM lineitem
        UNION ALL SELECT 'l_discount', 0.25,
          ROUND(quantile_cont(l_discount, 0.25), 4) FROM lineitem
        UNION ALL SELECT 'l_discount', 0.5,
          ROUND(quantile_cont(l_discount, 0.5), 4) FROM lineitem
        UNION ALL SELECT 'l_discount', 0.75,
          ROUND(quantile_cont(l_discount, 0.75), 4) FROM lineitem)
      ORDER BY col_name, p"""))

  /** The 100 TB twin of q41: `approx_percentile`'s mergeable GK sketch,
    * map-side combinable where exact percentile cannot be. On COARSE
    * columns (50/11/7 distinct values) the sketch's rank slack — a
    * n/accuracy fraction of the rows — is ~100× smaller than any
    * quantile target's distance to a value boundary, so at the DEFAULT
    * accuracy the approximate answer is deterministic at every scale
    * and equals the nearest-rank exact quantile — which is what lets
    * an approximate operator sit under an exact-hash oracle (DuckDB
    * `quantile_disc`). The one knife-edge: a target sitting ON a
    * boundary in expectation (p=0.5 over 50 uniform values) resolves
    * by the corpus's sampled sign and is stable for fixed data. On
    * fine-grained columns the sketch's chosen element is
    * engine-specific; that twin stays oracle-free by nature (q41
    * covers exactness there).
    */
  val q43ProfileQuantilesApprox = Q(
    "q43_profile_quantiles_approx",
    (s, d) => {
      import s.implicits._
      // columns chosen so no target fraction sits ON a cumulative value
      // boundary in expectation (l_quantity's even 50-value domain puts
      // p=0.5 exactly on one — the sketch's and the oracle's choices then
      // flip on sampling noise; 9/11/7-value domains have no such cell)
      val num = Seq("l_tax", "l_discount", "l_linenumber")
      val ps = Seq(0.25, 0.5, 0.75)
      val aggs = num.map(c => approx_percentile(col(c).cast("double"),
        lit(ps.toArray), lit(10000)).as(s"${c}__q"))
      val one = T.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      val rows = for { c <- num; (p, i) <- ps.zipWithIndex } yield
        struct(lit(c).as("col_name"), lit(p).as("p"),
          round(element_at(col(s"${c}__q"), i + 1), 4).as("value"))
      one.select(explode(array(rows: _*)).as("r"))
        .select($"r.col_name", $"r.p", $"r.value")
        .orderBy($"col_name", $"p")
    },
    Some("""
      SELECT col_name, CAST(p AS DOUBLE) AS p, value FROM (
        SELECT 'l_tax' AS col_name, 0.25 AS p,
               ROUND(CAST(quantile_disc(l_tax, 0.25) AS DOUBLE), 4)
                 AS value FROM lineitem
        UNION ALL SELECT 'l_tax', 0.5,
          ROUND(CAST(quantile_disc(l_tax, 0.5) AS DOUBLE), 4)
          FROM lineitem
        UNION ALL SELECT 'l_tax', 0.75,
          ROUND(CAST(quantile_disc(l_tax, 0.75) AS DOUBLE), 4)
          FROM lineitem
        UNION ALL SELECT 'l_discount', 0.25,
          ROUND(CAST(quantile_disc(l_discount, 0.25) AS DOUBLE), 4)
          FROM lineitem
        UNION ALL SELECT 'l_discount', 0.5,
          ROUND(CAST(quantile_disc(l_discount, 0.5) AS DOUBLE), 4)
          FROM lineitem
        UNION ALL SELECT 'l_discount', 0.75,
          ROUND(CAST(quantile_disc(l_discount, 0.75) AS DOUBLE), 4)
          FROM lineitem
        UNION ALL SELECT 'l_linenumber', 0.25,
          ROUND(CAST(quantile_disc(l_linenumber, 0.25) AS DOUBLE), 4)
          FROM lineitem
        UNION ALL SELECT 'l_linenumber', 0.5,
          ROUND(CAST(quantile_disc(l_linenumber, 0.5) AS DOUBLE), 4)
          FROM lineitem
        UNION ALL SELECT 'l_linenumber', 0.75,
          ROUND(CAST(quantile_disc(l_linenumber, 0.75) AS DOUBLE), 4)
          FROM lineitem)
      ORDER BY col_name, p"""))

  /** Frequent-values profiler — top-3 values per column by count (ties
    * to the smaller value), the categorical complement of q41. One
    * Expand fans each row into (col_name, val) tags, ONE count shuffle
    * aggregates all columns together, and the per-column top-3 window
    * runs over the already-tiny count table — the q34 one-job pattern
    * applied to frequency histograms.
    */
  val q42ProfileFrequent = Q(
    "q42_profile_frequent",
    (s, d) => {
      import s.implicits._
      val cols = Seq("l_returnflag", "l_linestatus", "l_linenumber")
      val stacked = T.lineitem(s, d)
        .select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"),
            col(c).cast("string").as("val"))): _*)).as("s"))
        .select($"s.col_name", $"s.val")
      val w = Window.partitionBy($"col_name")
        .orderBy($"cnt".desc, $"val")
      stacked.groupBy($"col_name", $"val").agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .orderBy($"col_name", $"rank")
    },
    Some("""
      WITH s AS (
        SELECT 'l_returnflag' AS col_name, l_returnflag AS val
        FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', l_linestatus FROM lineitem
        UNION ALL
        SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR)
        FROM lineitem),
      c AS (SELECT col_name, val, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
      r AS (
        SELECT col_name, val, cnt,
               CAST(ROW_NUMBER() OVER (PARTITION BY col_name
                 ORDER BY cnt DESC, val) AS INT) AS rank
        FROM c)
      SELECT col_name, val, CAST(cnt AS BIGINT) AS cnt, rank
      FROM r WHERE rank <= 3 ORDER BY col_name, rank"""))

  /** Salted skew join under the driver gate: the fact⨝fact join runs
    * through `SkewJoin.saltedHotKeys` (hot orderkeys salted across 8
    * buckets, the cold tail joined plainly) and must aggregate to the
    * SAME revenue rows as the plain join — the salt changes row routing,
    * never multiplicity, so the rand() inside is content-invisible (the
    * oracle is the unsalted join). The manual fallback for heavy-hitter
    * keys where AQE's skew splitting can't reach (e.g. a shingle/k-mer
    * key with a double-digit share of all rows).
    */
  val q35SkewJoin = Q(
    "q35_skew_join",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      val o = T.orders(s, d)
        .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
      graft.ops.SkewJoin.saltedHotKeys(li, o, "l_orderkey", buckets = 8,
          hotThreshold = 4)
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1"""))

  /** q38's temporal enrichment composed with the PRUNED dimension read
    * (`Scd2.historyFor`): facts of a 10% user slice are enriched against
    * only the bucket directories that slice hashes into — the read-side
    * O(touched-buckets) contract under the driver gate. The oracle is
    * q38's full-history derivation restricted to the same slice: the
    * prune must be invisible to content (co-bucketed extra users pass
    * through the read and are ignored by the join).
    */
  val q44Scd2LookupPruned = Q(
    "q44_scd2_lookup_pruned",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val dir = java.nio.file.Files.createTempDirectory("scd2p").toString
      Scd2.init(ev, dir, nBuckets = 16)
      val purch = ev.filter($"event_type" === "purchase" &&
          $"user_id" % 10 === 3)
        .select($"event_id", $"user_id", $"ts")
      val hist = Scd2.historyFor(s, dir, purch.select($"user_id"))
      Scd2.lookupAsOf(purch, hist, "ts")
        .select($"event_id", $"user_id", $"dim_state", $"dim_version")
        .orderBy($"event_id")
    },
    Some("""
      WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev
        FROM events),
      ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
      v AS (
        SELECT user_id, event_type, ts,
               LEAD(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS vt,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS INT) AS version
        FROM ch),
      p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase' AND user_id % 10 = 3)
      SELECT p.event_id, p.user_id, v.event_type AS dim_state,
             v.version AS dim_version
      FROM p LEFT JOIN v
        ON v.user_id = p.user_id AND p.ts >= v.ts
       AND (v.vt IS NULL OR p.ts < v.vt)
      ORDER BY p.event_id"""))

  /** Distinct-cardinality profiler — `approx_count_distinct` (HLL++) per
    * column in ONE aggregation job, the mergeable twin of exact
    * COUNT(DISTINCT) the same way q43 twins q41: the sketch map-side
    * combines (a per-column exact distinct would be one shuffle EACH on
    * the raw values), so at 100 TB the job stays one pass + a
    * constant-size merge. Gate-checkable against DuckDB's exact
    * COUNT(DISTINCT) because at rsd=0.01 (2^14 registers) every profiled
    * column's cardinality (2-50) sits deep in the linear-counting regime:
    * the estimate m*ln(m/V) rounds to n exactly unless two values collide
    * in one register — deterministic for the fixed value DOMAINS, which
    * are replica-invariant across scales.
    */
  val q45ProfileDistinct = Q(
    "q45_profile_distinct",
    (s, d) => {
      import s.implicits._
      val cols = Seq("l_returnflag", "l_linestatus", "l_linenumber",
        "l_tax", "l_discount", "l_quantity")
      val aggs = cols.map(c =>
        approx_count_distinct(col(c), 0.01).as(s"${c}__n"))
      val one = T.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      val rows = cols.map(c => struct(lit(c).as("col_name"),
        col(s"${c}__n").as("n_distinct")))
      one.select(explode(array(rows: _*)).as("r"))
        .select($"r.col_name", $"r.n_distinct")
        .orderBy($"col_name")
    },
    Some("""
      SELECT col_name, n_distinct FROM (
        SELECT 'l_returnflag' AS col_name,
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_distinct
        FROM lineitem
        UNION ALL SELECT 'l_linestatus',
          CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_linenumber',
          CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_tax',
          CAST(COUNT(DISTINCT l_tax) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_discount',
          CAST(COUNT(DISTINCT l_discount) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_quantity',
          CAST(COUNT(DISTINCT l_quantity) AS BIGINT) FROM lineitem)
      ORDER BY col_name"""))

  /** Persisted-sketch cardinality maintenance — the incremental-index
    * house pattern applied to STATISTICS: per-shard DataSketches HLL
    * sketches are written to parquet (one binary row per shard), read
    * back, and `hll_union_agg`-merged; a new data partition appends ONE
    * sketch row and the merge re-reads sketches, never the data. The
    * merged estimate must equal the direct single-pass estimate, and both
    * equal DuckDB's exact COUNT(DISTINCT), because at lgK=14 a
    * ≤1k-cardinality column keeps the sketch in exact coupon mode. At
    * 100 TB cardinalities the union's register state stays lossless but
    * DataSketches switches estimator (HIP → composite) after a union, so
    * merged drifts from direct within the error band; the invariant that
    * survives is SHARD-LAYOUT INVARIANCE — the union's answer depends
    * only on the value set, never the partitioning (ProfileApproxSpec
    * pins both regimes).
    */
  val q46DistinctSketchMerge = Q(
    "q46_distinct_sketch_merge",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
      val dir = java.nio.file.Files.createTempDirectory("hllsk").toString
      li.groupBy(($"l_orderkey" % 8).as("shard"))
        .agg(hll_sketch_agg($"l_suppkey", lit(14)).as("sk"))
        .write.mode("overwrite").parquet(dir)
      val merged = s.read.parquet(dir)
        .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(true)))
          .as("n_merged"))
      val direct = li
        .agg(hll_sketch_estimate(hll_sketch_agg($"l_suppkey", lit(14)))
          .as("n_direct"))
      merged.crossJoin(direct).select($"n_direct", $"n_merged")
    },
    Some("""
      SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_direct,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_merged
      FROM lineitem"""))

  /** Time-series resample + forward fill — each user's `value` signal
    * regularized onto an hourly grid from their first to last event hour,
    * gaps carrying the last observation forward (the feature-engineering
    * primitive behind training-data time alignment). Scale shape: ONE
    * events shuffle down to (user, hour) — the last-in-hour pick rides
    * map-side max_by on the immutable (ts, event_id) order — and
    * everything downstream (span agg, grid explode, fill window) stays on
    * the user axis; the grid explode is row-local fan-out, never a join
    * against a calendar table. The first grid point is the user's first
    * event hour, so the fill window never sees a leading null.
    */
  /** The q47 grid + fill chain over an already-derived (user_id, h, v)
    * hourly table (shared by q47 on raw events and q50 on the
    * streaming-maintained table). Expects `hourly` persisted or cheap to
    * recompute: it is read twice (span agg + fill join).
    */
  private def fillFromHourly(hourly: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("h"))
    grid.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("value", round(last(col("v"), ignoreNulls = true)
        .over(Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, 0)), 4))
      .select(col("user_id"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("ts"), col("value"))
      .orderBy(col("user_id"), col("ts"))
  }

  val q47ResampleFfill = Q(
    "q47_resample_ffill",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      // persisted: the (user, hour) table feeds BOTH the span agg and the
      // fill join — without the cache Catalyst re-scans events twice (no
      // subplan sharing across DataFrame reuse); the cached footprint is
      // users×hours, orders of magnitude under the raw events
      val hourly = ev
        .groupBy($"user_id", date_trunc("hour", $"ts".cast("timestamp"))
          .as("h"))
        .agg(max_by($"value", struct($"ts", $"event_id")).as("v"))
        .persist()
      fillFromHourly(hourly)
    },
    Some(resampleOracleSql))

  private lazy val resampleOracleSql = """
      WITH hourly AS (
        SELECT user_id, h, v FROM (
          SELECT user_id, date_trunc('hour', ts) AS h, value AS v,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1),
      span AS (
        SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1),
      grid AS (
        SELECT user_id,
               UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM span),
      j AS (
        SELECT g.user_id, g.h, hourly.v
        FROM grid g LEFT JOIN hourly
          ON g.user_id = hourly.user_id AND g.h = hourly.h)
      SELECT user_id, STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS ts,
             ROUND(LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS UNBOUNDED PRECEDING), 4) AS value
      FROM j ORDER BY user_id, ts"""

  /** The resample fill driven from the STREAMING-MAINTAINED hourly table
    * instead of raw events: the log is folded in three arbitrary-order
    * slices through `EventsStream.processResampleBatch` (the semilattice
    * maintenance `resampleSink` runs per trigger — slice 2 carries events
    * that precede slice 1's in time, i.e. genuine late data), the
    * persisted table is read back, and q47's grid+fill chain runs over
    * it. Oracle = q47's verbatim: maintained-then-filled must be
    * indistinguishable from a raw recompute — the house incremental-index
    * contract applied to the time-series table.
    */
  val q50ResampleMaintained = Q(
    "q50_resample_maintained",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val dir = java.nio.file.Files.createTempDirectory("resm").toString
      // three interleaved slices: event_id % 3 mixes early/late arrivals
      (0 to 2).foreach { i =>
        graft.streaming.EventsStream.processResampleBatch(
          ev.filter($"event_id" % 3 === i), dir)
      }
      val hourly = s.read.parquet(dir)
        .select($"user_id", $"h", $"v").persist()
      fillFromHourly(hourly)
    },
    Some(resampleOracleSql))

  /** GROUPED approx-quantile profiler — q43's mergeable sketch, one per
    * group (the realistic per-source/per-language corpus profiler at
    * 100 TB: the partial agg carries |groups| constant-size GK sketches
    * instead of buffering raw values per group). Determinism argument is
    * q43's, applied per group — with the margin MEASURED, not assumed:
    * on l_tax the nearest (group, p) rank-to-boundary distance is 90 rows
    * at sf0.001 (~4.6% of the group) vs a sketch slack of n/10000, a
    * ~460× margin at every scale; l_discount was rejected because group
    * N's p=0.75 target sits 0.5 rows from the 0.07/0.08 boundary — a
    * genuine knife-edge where sketch and exact legitimately disagree.
    */
  val q51GroupQuantilesApprox = Q(
    "q51_group_quantiles_approx",
    (s, d) => {
      import s.implicits._
      val ps = Seq(0.25, 0.5, 0.75)
      val g = T.lineitem(s, d).groupBy($"l_returnflag")
        .agg(approx_percentile($"l_tax".cast("double"),
          lit(ps.toArray), lit(10000)).as("q"))
      val rows = ps.zipWithIndex.map { case (p, i) =>
        struct(lit(p).as("p"), round(element_at($"q", i + 1), 4).as("value"))
      }
      g.select($"l_returnflag", explode(array(rows: _*)).as("r"))
        .select($"l_returnflag", $"r.p", $"r.value")
        .orderBy($"l_returnflag", $"p")
    },
    Some("""
      SELECT l_returnflag, CAST(p AS DOUBLE) AS p, value FROM (
        SELECT l_returnflag, 0.25 AS p,
               ROUND(CAST(quantile_disc(l_tax, 0.25) AS DOUBLE), 4)
                 AS value
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 0.5,
               ROUND(CAST(quantile_disc(l_tax, 0.5) AS DOUBLE), 4)
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 0.75,
               ROUND(CAST(quantile_disc(l_tax, 0.75) AS DOUBLE), 4)
        FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag, p"""))

  /** Correlation-matrix profiler — pairwise Pearson correlation over the
    * numeric columns in ONE aggregation job: `corr` is algebraic (six
    * co-moment partials per pair), so all pairs map-side combine into one
    * constant-size exchange regardless of corpus size — the multivariate
    * complement of q41/q42/q45's univariate profilers.
    */
  val q48ProfileCorr = Q(
    "q48_profile_corr",
    (s, d) => {
      import s.implicits._
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
      } yield (a, b)
      val aggs = pairs.map { case (a, b) =>
        round(corr(col(a), col(b)), 4).as(s"${a}__${b}") }
      val one = T.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      val rows = pairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          col(s"${a}__${b}").as("corr")) }
      one.select(explode(array(rows: _*)).as("r"))
        .select($"r.col_a", $"r.col_b", $"r.corr")
        .orderBy($"col_a", $"col_b")
    },
    Some("""
      SELECT col_a, col_b, corr FROM (
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
               ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr
        FROM lineitem
        UNION ALL SELECT 'l_quantity', 'l_discount',
          ROUND(CORR(l_quantity, l_discount), 4) FROM lineitem
        UNION ALL SELECT 'l_quantity', 'l_tax',
          ROUND(CORR(l_quantity, l_tax), 4) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'l_discount',
          ROUND(CORR(l_extendedprice, l_discount), 4) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'l_tax',
          ROUND(CORR(l_extendedprice, l_tax), 4) FROM lineitem
        UNION ALL SELECT 'l_discount', 'l_tax',
          ROUND(CORR(l_discount, l_tax), 4) FROM lineitem)
      ORDER BY col_a, col_b"""))

  /** Equi-width histogram profiler — 10 bins per numeric column between
    * the column's global min/max, all columns through ONE count shuffle
    * (the q42 Expand pattern on bin tags). The min/max pre-pass is a
    * bounded driver read (4 scalars); the bin arithmetic is written with
    * the IDENTICAL expression shape in both engines
    * (`LEAST(FLOOR((v - mn) * 10.0 / (mx - mn)), 9)`) so IEEE double
    * rounding can never put a boundary value in different bins.
    */
  val q49ProfileHistogram = Q(
    "q49_profile_histogram",
    (s, d) => {
      import s.implicits._
      val cols = Seq("l_quantity", "l_extendedprice")
      val li = T.lineitem(s, d)
      val mmAggs = cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"${c}__mn"),
        max(col(c).cast("double")).as(s"${c}__mx")))
      val mm = li.agg(mmAggs.head, mmAggs.tail: _*).head()
      val tags = cols.map { c =>
        val mn = mm.getAs[Double](s"${c}__mn")
        val mx = mm.getAs[Double](s"${c}__mx")
        struct(lit(c).as("col_name"),
          least(floor((col(c).cast("double") - lit(mn)) * lit(10.0) /
            (lit(mx) - lit(mn))), lit(9.0)).cast("int").as("bin"))
      }
      li.select(explode(array(tags: _*)).as("t"))
        .groupBy($"t.col_name".as("col_name"), $"t.bin".as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"col_name", $"bin")
    },
    Some("""
      WITH mm AS (
        SELECT MIN(CAST(l_quantity AS DOUBLE)) AS q_mn,
               MAX(CAST(l_quantity AS DOUBLE)) AS q_mx,
               MIN(CAST(l_extendedprice AS DOUBLE)) AS p_mn,
               MAX(CAST(l_extendedprice AS DOUBLE)) AS p_mx
        FROM lineitem),
      tags AS (
        SELECT 'l_quantity' AS col_name,
               CAST(LEAST(FLOOR((CAST(l_quantity AS DOUBLE) - q_mn) * 10.0
                 / (q_mx - q_mn)), 9.0) AS INT) AS bin
        FROM lineitem, mm
        UNION ALL
        SELECT 'l_extendedprice',
               CAST(LEAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - p_mn)
                 * 10.0 / (p_mx - p_mn)), 9.0) AS INT)
        FROM lineitem, mm)
      SELECT col_name, bin, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tags GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Distribution-drift monitor — Population Stability Index between two
    * corpus slices per numeric column (the data-quality gate a training
    * pipeline runs between snapshot N and N+1 before retraining):
    * PSI = Σ_bins (p−q)·ln(p/q) over the q49 equi-width bins, both
    * slices binned against the FULL corpus min/max so the bins are
    * comparable. ONE count aggregation computes both slices' histograms
    * together (conditional sums, no self-join); the per-column totals
    * ride a window over the tiny (col, bin) table. Slices here are the
    * deterministic l_orderkey parity split; a deployment passes snapshot
    * ids.
    */
  val q52DriftPsi = Q(
    "q52_drift_psi",
    (s, d) => {
      import s.implicits._
      val cols = Seq("l_quantity", "l_extendedprice")
      val li = T.lineitem(s, d)
      val mmAggs = cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"${c}__mn"),
        max(col(c).cast("double")).as(s"${c}__mx")))
      val mm = li.agg(mmAggs.head, mmAggs.tail: _*).head()
      val tags = cols.map { c =>
        val mn = mm.getAs[Double](s"${c}__mn")
        val mx = mm.getAs[Double](s"${c}__mx")
        struct(lit(c).as("col_name"),
          least(floor((col(c).cast("double") - lit(mn)) * lit(10.0) /
            (lit(mx) - lit(mn))), lit(9.0)).cast("int").as("bin"))
      }
      val hist = li
        .withColumn("slice", ($"l_orderkey" % 2).cast("int"))
        .select($"slice", explode(array(tags: _*)).as("t"))
        .groupBy($"t.col_name".as("col_name"), $"t.bin".as("bin"))
        .agg(sum(when($"slice" === 0, 1.0).otherwise(0.0)).as("c0"),
          sum(when($"slice" === 1, 1.0).otherwise(0.0)).as("c1"))
      val w = Window.partitionBy($"col_name")
      hist
        .withColumn("p", $"c0" / sum($"c0").over(w))
        .withColumn("q", $"c1" / sum($"c1").over(w))
        .groupBy($"col_name")
        .agg(round(sum(($"p" - $"q") * log($"p" / $"q")), 4).as("psi"))
        .orderBy($"col_name")
    },
    Some("""
      WITH mm AS (
        SELECT MIN(CAST(l_quantity AS DOUBLE)) AS q_mn,
               MAX(CAST(l_quantity AS DOUBLE)) AS q_mx,
               MIN(CAST(l_extendedprice AS DOUBLE)) AS p_mn,
               MAX(CAST(l_extendedprice AS DOUBLE)) AS p_mx
        FROM lineitem),
      tags AS (
        SELECT l_orderkey % 2 AS slice, 'l_quantity' AS col_name,
               CAST(LEAST(FLOOR((CAST(l_quantity AS DOUBLE) - q_mn) * 10.0
                 / (q_mx - q_mn)), 9.0) AS INT) AS bin
        FROM lineitem, mm
        UNION ALL
        SELECT l_orderkey % 2, 'l_extendedprice',
               CAST(LEAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - p_mn)
                 * 10.0 / (p_mx - p_mn)), 9.0) AS INT)
        FROM lineitem, mm),
      hist AS (
        SELECT col_name, bin,
               SUM(CASE WHEN slice = 0 THEN 1.0 ELSE 0.0 END) AS c0,
               SUM(CASE WHEN slice = 1 THEN 1.0 ELSE 0.0 END) AS c1
        FROM tags GROUP BY 1, 2),
      fr AS (
        SELECT col_name,
               c0 / SUM(c0) OVER (PARTITION BY col_name) AS p,
               c1 / SUM(c1) OVER (PARTITION BY col_name) AS q
        FROM hist)
      SELECT col_name, ROUND(SUM((p - q) * LN(p / q)), 4) AS psi
      FROM fr GROUP BY col_name ORDER BY col_name"""))

  /** Categorical-association profiler — Cramér's V between two
    * categorical columns (the categorical complement of q48's Pearson
    * matrix): χ² over the contingency table, V = sqrt(χ² / (n·(min(r,c)
    * −1))). ONE count shuffle builds the contingency table; the χ² sum,
    * marginals, and normalization all ride windows over that tiny frame
    * — nothing after the first aggregation scales with the corpus.
    */
  val q53ProfileCramersV = Q(
    "q53_profile_cramers_v",
    (s, d) => {
      import s.implicits._
      val ct = T.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).cast("double").as("o"))
      val all = Window.partitionBy(lit(1))
      val wr = Window.partitionBy($"l_returnflag")
      val wc = Window.partitionBy($"l_linestatus")
      ct
        .withColumn("n", sum($"o").over(all))
        .withColumn("e", sum($"o").over(wr) * sum($"o").over(wc) / $"n")
        .withColumn("r", size(collect_set($"l_returnflag").over(all)))
        .withColumn("c", size(collect_set($"l_linestatus").over(all)))
        .agg(
          first($"n").cast("long").as("n"),
          round(sum(($"o" - $"e") * ($"o" - $"e") / $"e"), 4).as("chi2"),
          round(sqrt(sum(($"o" - $"e") * ($"o" - $"e") / $"e") /
            (first($"n") * (least(first($"r"), first($"c")) - lit(1)))), 4)
            .as("cramers_v"))
    },
    Some("""
      WITH ct AS (
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS DOUBLE) AS o
        FROM lineitem GROUP BY 1, 2),
      x AS (
        SELECT o,
               SUM(o) OVER () AS n,
               SUM(o) OVER (PARTITION BY l_returnflag) *
                 SUM(o) OVER (PARTITION BY l_linestatus) /
                 SUM(o) OVER () AS e,
               COUNT(DISTINCT l_returnflag) OVER () AS r,
               COUNT(DISTINCT l_linestatus) OVER () AS c
        FROM ct)
      SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n,
             ROUND(SUM((o - e) * (o - e) / e), 4) AS chi2,
             ROUND(SQRT(SUM((o - e) * (o - e) / e) /
               (ANY_VALUE(n) * (LEAST(ANY_VALUE(r), ANY_VALUE(c)) - 1))), 4)
               AS cramers_v
      FROM x"""))

  /** Cohort-retention matrix — users bucketed by first-seen week (the
    * cohort), counted per week-offset they were active in (the
    * engagement decay read every usage pipeline reports). Scale shape:
    * the only corpus-size work is the DISTINCT down to (user, week) —
    * map-side partial distinct, one shuffle; the cohort derives from
    * that table with a user-axis window (second, users×weeks-sized
    * shuffle), and the final (cohort, offset) aggregation is tiny. No
    * join against the raw events anywhere.
    */
  val q54RetentionCohorts = Q(
    "q54_retention_cohorts",
    (s, d) => {
      import s.implicits._
      val act = T.events(s, d)
        .select($"user_id",
          date_trunc("week", $"ts".cast("timestamp")).as("wk"))
        .distinct()
      act
        .withColumn("cohort",
          min($"wk").over(Window.partitionBy($"user_id")))
        .groupBy(date_format($"cohort", "yyyy-MM-dd").as("cohort_week"),
          (datediff($"wk", $"cohort") / 7).cast("int").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort_week", $"week_offset")
    },
    Some("""
      WITH act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      c AS (
        SELECT user_id, wk,
               MIN(wk) OVER (PARTITION BY user_id) AS cohort
        FROM act)
      SELECT STRFTIME(cohort, '%Y-%m-%d') AS cohort_week,
             CAST(date_diff('day', cohort, wk) // 7 AS INT) AS week_offset,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM c GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Persisted heavy-hitters maintenance — q46's incremental-statistics
    * pattern applied to FREQUENCY: per-shard Misra–Gries summaries
    * (capacity 4096, `ops.FreqSketch`) land as one map row each, the
    * top-k re-reads and union-merges summaries, never data; a new shard
    * appends one row. Exact under the oracle because every driver SF
    * keeps distinct suppkeys (≤ 1k) inside the capacity — no decrement
    * ever fires, so summaries are exact count maps at any shard layout
    * (the frequency analog of q46's HLL coupon mode; the lossy-regime
    * error bound and layout-invariance limits are FreqSketchSpec's).
    */
  val q55FreqSketchMerge = Q(
    "q55_freq_sketch_merge",
    (s, d) => {
      import s.implicits._
      val m = 4096
      val li = T.lineitem(s, d)
      val dir = java.nio.file.Files.createTempDirectory("mgsk").toString
      li.groupBy(($"l_orderkey" % 8).as("shard"))
        .agg(graft.ops.FreqSketch.misraGries(
          $"l_suppkey".cast("string"), m).as("sk"))
        .write.mode("overwrite").parquet(dir)
      val merged = s.read.parquet(dir)
        .agg(graft.ops.FreqSketch.misraGriesMerge($"sk", m).as("merged"))
      graft.ops.FreqSketch.topK(merged, "merged", 10)
    },
    Some("""
      SELECT CAST(l_suppkey AS VARCHAR) AS key,
             CAST(COUNT(*) AS BIGINT) AS est
      FROM lineitem GROUP BY 1
      ORDER BY est DESC, key LIMIT 10"""))

  /** Robust outlier detection — per-segment median/MAD z-scores
    * (Iglewicz–Hoaglin: 0.6745·(x−med)/MAD, flag |z| > 3.5), the
    * data-quality gate that survives the heavy tails that break
    * mean/stddev z-scores. Three passes over events (median, MAD — which
    * needs the median first — and the flag scan), each a 5-group
    * aggregation with the per-group stats riding back on BROADCAST
    * joins; the exact `percentile` buffers per group, so the 100 TB swap
    * is q51's grouped `approx_percentile` with a measured margin — the
    * pass structure is unchanged.
    */
  val q56AnomalyMad = Q(
    "q56_anomaly_mad",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      // med/mad are rounded to 6dp before the z arithmetic: the exact
      // interpolated medians are midpoints of 2dp values (multiples of
      // 0.005 — 6dp rounding is the identity on them up to fp noise),
      // and the engine/oracle interpolation differs in last ulps, which
      // the division would otherwise amplify past the output rounding
      // (one sf0.1 row flipped at the 4th decimal before this pin)
      val med = ev.groupBy($"event_type")
        .agg(round(percentile($"value", lit(0.5)), 6).as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
      val mad = dev.groupBy($"event_type")
        .agg(round(percentile(abs($"value" - $"med"), lit(0.5)), 6)
          .as("mad"))
      // +1e-9 nudge before BOTH the threshold and the 4dp round: with
      // 2dp inputs the true z is a small-denominator rational that CAN
      // land exactly on a .00005 rounding boundary (sf0.1 event 1222:
      // z = 92993315/24140000 = 3.85225 exactly), where engine-side fp
      // noise (~1e-12) decides the direction per engine; the nudge is
      // ~1000x that noise, so both engines leave the boundary on the
      // same side
      dev.join(broadcast(mad), Seq("event_type"))
        .withColumn("rz",
          lit(0.6745) * ($"value" - $"med") / $"mad" + lit(1e-9))
        .filter(abs($"rz") > 3.5)
        .select($"event_id", $"event_type", $"value",
          round($"rz", 4).as("robust_z"))
        .orderBy($"event_id")
    },
    Some("""
      WITH med AS (
        SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
        FROM events GROUP BY 1),
      dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med
        FROM events e JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type,
               ROUND(quantile_cont(ABS(value - med), 0.5), 6) AS mad
        FROM dev GROUP BY 1)
      SELECT d.event_id, d.event_type, d.value,
             ROUND(0.6745 * (d.value - d.med) / m.mad + 1e-9, 4)
               AS robust_z
      FROM dev d JOIN mad m USING (event_type)
      WHERE ABS(0.6745 * (d.value - d.med) / m.mad + 1e-9) > 3.5
      ORDER BY d.event_id"""))

  /** Declarative data-quality battery (`ops.DataQuality`) — Deequ-style
    * checks compiled to minimal jobs: the seven row-local rules ride ONE
    * conditional-sum aggregation (algebraic partials, corpus-size-FLAT);
    * the Unique rule is one key-axis count; each foreign key anti-joins
    * the fact's DISTINCT key domain against the dim's key column (never
    * fact rows). Two rules genuinely fail on this corpus — the discount
    * range (44.8% out of [0, 0.05]) and the (l_orderkey, l_linenumber)
    * key (the synthetic generator mints duplicate line numbers) — so the
    * gate exercises both verdicts. Budgets sit far from attainable
    * violation fractions (k/n rationals), so `passed` is
    * fp-noise-immune.
    */
  val q57DqChecks = Q(
    "q57_dq_checks",
    (s, d) => {
      import graft.ops.DataQuality._
      val li = T.lineitem(s, d)
      validate(li, Seq(
        NotNull("l_orderkey"),
        NotNull("l_shipdate"),
        InRange("l_quantity", 1.0, 50.0),
        InRange("l_discount", 0.0, 0.05),
        InSet("l_returnflag", Seq("A", "N", "R")),
        InSet("l_linestatus", Seq("O"), maxViolFrac = 0.75),
        MatchesRegex("l_returnflag", "^[ANR]$"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        ForeignKey("l_orderkey", T.orders(s, d), "o_orderkey", "orders"),
        ForeignKey("l_suppkey", T.supplier(s, d), "s_suppkey", "supplier")))
    },
    Some("""
      WITH rl AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ok_null,
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_sd_null,
               CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
               CAST(SUM(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
               CAST(SUM(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_rf,
               CAST(SUM(CASE WHEN l_linestatus IS NOT NULL AND l_linestatus NOT IN ('O') THEN 1 ELSE 0 END) AS BIGINT) AS v_ls,
               CAST(SUM(CASE WHEN l_returnflag IS NOT NULL AND NOT regexp_matches(l_returnflag, '^[ANR]$') THEN 1 ELSE 0 END) AS BIGINT) AS v_re
        FROM lineitem),
      uq AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS v
        FROM (SELECT COUNT(*) AS cnt FROM lineitem
              GROUP BY l_orderkey, l_linenumber)),
      fk_o AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n,
               CAST(COALESCE(SUM(k.cnt), 0) AS BIGINT) AS v
        FROM (SELECT l_orderkey AS k, COUNT(*) AS cnt FROM lineitem
              WHERE l_orderkey IS NOT NULL GROUP BY 1) k
        WHERE k.k NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)),
      fk_s AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n,
               CAST(COALESCE(SUM(k.cnt), 0) AS BIGINT) AS v
        FROM (SELECT l_suppkey AS k, COUNT(*) AS cnt FROM lineitem
              WHERE l_suppkey IS NOT NULL GROUP BY 1) k
        WHERE k.k NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL)),
      m AS (
        SELECT 'not_null' AS rule, 'l_orderkey' AS target, n, v_ok_null AS v, 0.0 AS budget FROM rl
        UNION ALL SELECT 'not_null', 'l_shipdate', n, v_sd_null, 0.0 FROM rl
        UNION ALL SELECT 'in_range', 'l_quantity', n, v_qty, 0.0 FROM rl
        UNION ALL SELECT 'in_range', 'l_discount', n, v_disc, 0.0 FROM rl
        UNION ALL SELECT 'in_set', 'l_returnflag', n, v_rf, 0.0 FROM rl
        UNION ALL SELECT 'in_set', 'l_linestatus', n, v_ls, 0.75 FROM rl
        UNION ALL SELECT 'matches', 'l_returnflag', n, v_re, 0.0 FROM rl
        UNION ALL SELECT 'unique', 'l_orderkey,l_linenumber', n, v, 0.0 FROM uq
        UNION ALL SELECT 'foreign_key', 'l_orderkey->orders.o_orderkey', n, v, 0.0 FROM fk_o
        UNION ALL SELECT 'foreign_key', 'l_suppkey->supplier.s_suppkey', n, v, 0.0 FROM fk_s)
      SELECT rule, target, n AS n_rows, v AS n_violations,
             ROUND(1.0 - CAST(v AS DOUBLE) / n, 6) AS frac_ok,
             (CAST(v AS DOUBLE) / n <= budget) AS passed
      FROM m ORDER BY rule, target"""))

  /** k-anonymity audit — the privacy gate a dataset release runs over its
    * quasi-identifier columns (Sweeney 2002): any QI combination shared by
    * fewer than k rows re-identifies its members. QI here = (lang, source,
    * coarse length bucket) on documents; output = the risky groups at
    * k = 5. One hash aggregation over the bounded QI domain, then a
    * domain-sized filter — corpus-size-FLAT output, and at 100 TB the
    * aggregation is map-side combined on a 3-column key.
    */
  val q58KAnonymity = Q(
    "q58_k_anonymity",
    (s, d) => {
      T.documents(s, d)
        .groupBy(col("lang"), col("source"),
          expr("n_chars DIV 200").as("len_bucket"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") < 5)
        .orderBy(col("lang"), col("source"), col("len_bucket"))
    },
    Some("""
      SELECT lang, source, n_chars // 200 AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents
      GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
      ORDER BY lang, source, len_bucket"""))

  /** Bloom runtime-filter join ([[graft.ops.RuntimeFilter]]): the 20%
    * urgent-orders slice ships as a 16 KiB bit-set literal that kills
    * ~80% of lineitem BEFORE the fact-side shuffle; the exact join then
    * runs over the survivors, so the oracle is the PLAIN join — the
    * reduction must be invisible in the result. Selectivity and
    * completeness are RuntimeFilterSpec's.
    */
  val q59BloomSemijoin = Q(
    "q59_bloom_semijoin",
    (s, d) => {
      val li = T.lineitem(s, d)
      val urgent = T.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.ops.RuntimeFilter.bloomSemiJoin(li, "l_orderkey", urgent,
        "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             CAST(COUNT(*) AS BIGINT)                            AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Explicit GROUPING SETS — the general grouping-lattice form CUBE and
    * ROLLUP are shorthands for (q16/q27 cover those): an irregular set of
    * three groupings in ONE aggregation pass, disambiguated by
    * GROUPING__ID exactly as the rollup row does with its NULL-marker
    * convention.
    */
  val q60GroupingSets = Q(
    "q60_grouping_sets",
    (s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("q60_lineitem")
      s.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM q60_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY l_returnflag, l_linestatus""")
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
             COALESCE(l_linestatus, 'ALL') AS l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), ())
      ORDER BY l_returnflag, l_linestatus"""))

  def all: Seq[Q] = Seq(
    q1Agg, q2JoinAgg, q3Argmax, q4Having, q5Collect, q6WindowLag, q7Union,
    q8Anti, q9TopK, q10Scalar, q11Rank, q12EventsWindow, q13Json, q14AboveAvg,
    q15Sessionize, q16Rollup, q17SetOps, q18Asof, q19Range, q20AsofFwd,
    q21AsofNearest, q22AsofTolerance, q23AsofStrict, q24AsofBanded,
    q25Pivot, q26Unpivot, q27Cube, q28SlidingWindow, q29SessionWindow,
    q30RangeFrame, q31Funnel, q32Scd2, q33Scd2Incr, q34Profile,
    q35SkewJoin, q37Scd2Snapshot, q38Scd2Lookup, q39Scd2Changes,
    q40Scd2Outbox, q41ProfileQuantiles, q42ProfileFrequent,
    q43ProfileQuantilesApprox, q44Scd2LookupPruned, q45ProfileDistinct,
    q46DistinctSketchMerge, q47ResampleFfill, q48ProfileCorr,
    q49ProfileHistogram, q50ResampleMaintained, q51GroupQuantilesApprox,
    q52DriftPsi, q53ProfileCramersV, q54RetentionCohorts,
    q55FreqSketchMerge, q56AnomalyMad, q57DqChecks, q58KAnonymity,
    q59BloomSemijoin, q60GroupingSets)
}

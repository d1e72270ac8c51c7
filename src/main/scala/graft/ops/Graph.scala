package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair tables — the centrality companion to
  * [[Dedup.components]]. A training-data pipeline uses these to rank
  * documents inside the near-duplicate graph (a high-PageRank node is the
  * "canonical" copy a cluster converges on; a low-rank leaf is a one-off
  * variant), the same way the reference ranks alignment targets by hit
  * connectivity before the expensive cascade
  * (`/root/reference/src/sra/comparekmertables.cpp:46-67` — the
  * match-count gate is degree centrality over the k-mer hit graph).
  *
  * 100 TB posture: one round of power iteration is one hash join of the
  * rank table onto the edge list (shuffle on the source key) plus one
  * `groupBy(dst).sum` — both map-side-combined, state O(|V| + |E|), no
  * driver materialization. `localCheckpoint` per round truncates lineage
  * exactly like the [[Dedup.components]] fixpoint loop. A FIXED iteration
  * count (not convergence detection) keeps the result deterministic and
  * oracle-expressible.
  */
object Graph {

  /** PageRank over an undirected pair set by fixed-round power iteration.
    *
    * `pairs` carries one row per undirected edge in columns (a, b); the
    * node set is every pair endpoint (isolated nodes are not ranked —
    * rank mass is defined over the graph the pairs induce). Each round:
    *
    * {{{ rank'(v) = (1 - damping)/N + damping * Σ_{u ~ v} rank(u)/deg(u) }}}
    *
    * Mirroring the edges makes the graph symmetric, so every ranked node
    * has out-degree >= 1 and no dangling-mass redistribution is needed:
    * total rank stays 1 every round (spec-pinned).
    *
    * Output: (node, rank) — rank a double summing to 1 over the node set.
    */
  def pageRank(pairs: DataFrame, iterations: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping >= 0 && damping <= 1,
      s"damping must be in [0, 1], got $damping")
    val p = pairs.select(col("a"), col("b")).cache()
    // mirror + distinct: tolerates callers handing both orientations or
    // repeated pairs; localCheckpoint materializes so p can be released
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    p.unpersist()
    // checkpointed ONCE: the scalar count and the rank seed share the
    // materialized aggregation instead of each recomputing it
    val deg = edges.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // N is one bounded scalar read (house convention: scalar aggregates
    // may surface to the driver; row data never does)
    val n = deg.count()
    if (n == 0) return edges.select(col("a").as("node"),
      lit(0.0).as("rank")).limit(0)
    var ranks = deg.select(col("node"), col("deg"),
      lit(1.0 / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.select(col("node").as("a"),
          (col("rank") / col("deg")).as("c")), Seq("a"))
        .groupBy(col("b").as("node"))
        .agg(sum(col("c")).as("inflow"))
      // inner join: symmetric edges guarantee every node receives inflow
      ranks = ranks.select(col("node"), col("deg"))
        .join(contrib, Seq("node"))
        .select(col("node"), col("deg"),
          (lit((1.0 - damping) / n) + lit(damping) * col("inflow"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Edge-weighted PageRank: random-walk transition probability is
    * proportional to edge weight instead of uniform over neighbors —
    * over a near-dup graph weighted by Jaccard, rank mass flows toward
    * the STRONGEST duplicate ties rather than merely the best-connected
    * node. `pairs` is (a, b, w) with w > 0 (one row per undirected edge;
    * duplicate a–b rows sum their weights):
    *
    * {{{ rank'(v) = (1-d)/N + d · Σ_{u ~ v} w(u,v)/W(u) · rank(u) }}}
    *
    * with `W(u) = Σ_x w(u,x)`. Mass is conserved (each node redistributes
    * its whole rank across its weighted out-edges). Same per-round
    * join+agg shape and lineage truncation as [[pageRank]].
    */
  def pageRankWeighted(pairs: DataFrame, weightCol: String = "w",
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val p = pairs.select(col("a"), col("b"),
      col(weightCol).cast("double").as("w"))
      .filter(col("w") > 0)
      .cache()
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b"),
      col("w")))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
      .localCheckpoint()
    p.unpersist()
    // checkpointed ONCE: count + rank seed share one materialization
    val wsum = edges.groupBy(col("a").as("node"))
      .agg(sum(col("w")).as("ws"))
      .localCheckpoint()
    val n = wsum.count()
    if (n == 0) return edges.select(col("a").as("node"),
      lit(0.0).as("rank")).limit(0)
    var ranks = wsum.select(col("node"), col("ws"),
      lit(1.0 / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.select(col("node").as("a"),
          (col("rank") / col("ws")).as("rw")), Seq("a"))
        .groupBy(col("b").as("node"))
        .agg(sum(col("rw") * col("w")).as("inflow"))
      ranks = ranks.select(col("node"), col("ws"))
        .join(contrib, Seq("node"))
        .select(col("node"), col("ws"),
          (lit((1.0 - damping) / n) + lit(damping) * col("inflow"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Personalized PageRank: teleport mass goes to a SOURCE set instead of
    * uniformly — rank becomes graph proximity to the sources ("documents
    * related to this seed set through the duplicate/co-occurrence
    * structure", the random-walk-with-restart retrieval primitive). Same
    * fixed-round shape as [[pageRank]]:
    *
    * {{{ rank'(v) = (1-d)·tele(v) + d · Σ_{u ~ v} rank(u)/deg(u) }}}
    *
    * with `tele = 1/|S ∩ V|` on source nodes, 0 elsewhere, and
    * `rank₀ = tele`. Mass is conserved at 1 over the node set; nodes in
    * components containing no source stay at exactly 0.
    *
    * `sources` is a single-column (node) DataFrame; sources outside the
    * pair-induced node set are ignored (they have no edges to walk).
    */
  def personalizedPageRank(pairs: DataFrame, sources: DataFrame,
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping >= 0 && damping <= 1,
      s"damping must be in [0, 1], got $damping")
    val p = pairs.select(col("a"), col("b")).cache()
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    p.unpersist()
    // checkpointed ONCE: the source intersection count and the teleport
    // seed share one materialized aggregation
    val deg = edges.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val src = sources.select(col("node")).distinct()
      .join(deg.select(col("node")), Seq("node"), "left_semi")
    val nS = src.count()
    require(nS > 0, "personalizedPageRank: no source node touches the graph")
    var ranks = deg
      .join(src.withColumn("_s", lit(1)), Seq("node"), "left")
      .select(col("node"), col("deg"),
        when(col("_s").isNotNull, lit(1.0 / nS)).otherwise(lit(0.0))
          .as("tele"))
      .withColumn("rank", col("tele"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.select(col("node").as("a"),
          (col("rank") / col("deg")).as("c")), Seq("a"))
        .groupBy(col("b").as("node"))
        .agg(sum(col("c")).as("inflow"))
      ranks = ranks.select(col("node"), col("deg"), col("tele"))
        .join(contrib, Seq("node"))
        .select(col("node"), col("deg"), col("tele"),
          (lit(1.0 - damping) * col("tele") +
            lit(damping) * col("inflow")).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank"))
  }

  /** DuckDB CTE chain replaying [[personalizedPageRank]]: assumes prior
    * CTEs `edges(a, b)` (mirrored) and `src(node)` (the raw source set —
    * intersection with the node set happens here). Final CTE is
    * `r$iterations` (node, dg, tele, r).
    */
  def duckPersonalizedPageRankSql(iterations: Int,
      damping: Double = 0.85): String = {
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (
        SELECT e.b AS node, SUM(p.r / p.dg) AS inflow
        FROM edges e JOIN r${k - 1} p ON p.node = e.a GROUP BY 1),
      r$k AS (
        SELECT p.node, p.dg, p.tele,
               (1 - $damping) * p.tele + $damping * c$k.inflow AS r
        FROM r${k - 1} p JOIN c$k ON c$k.node = p.node)"""
    }.mkString(",\n      ")
    s"""deg AS (SELECT a AS node, COUNT(*) AS dg FROM edges GROUP BY 1),
      srcv AS (SELECT DISTINCT s.node FROM src s JOIN deg d ON d.node = s.node),
      ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM srcv),
      r0 AS (
        SELECT d.node, d.dg,
               CASE WHEN s.node IS NULL THEN 0.0 ELSE 1.0 / ns.c END AS tele,
               CASE WHEN s.node IS NULL THEN 0.0 ELSE 1.0 / ns.c END AS r
        FROM deg d LEFT JOIN srcv s ON s.node = d.node CROSS JOIN ns),
      $iters"""
  }

  /** DuckDB CTE chain replaying [[pageRank]] for oracle SQL: assumes a
    * prior CTE `edges(a, b)` holding the MIRRORED edge set; appends
    * deg/n/r0 and c1/r1 … up to `r$iterations` (columns node, dg, r).
    * Callers splice it after their edges CTE and SELECT from the final
    * rK. The damping literals are emitted as `(1 - d)` / `d` so both
    * engines compute the same IEEE doubles.
    */
  def duckPageRankSql(iterations: Int, damping: Double = 0.85): String = {
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (
        SELECT e.b AS node, SUM(p.r / p.dg) AS inflow
        FROM edges e JOIN r${k - 1} p ON p.node = e.a GROUP BY 1),
      r$k AS (
        SELECT d.node, d.dg, (1 - $damping) / n.c + $damping * c$k.inflow AS r
        FROM deg d JOIN c$k ON c$k.node = d.node CROSS JOIN n)"""
    }.mkString(",\n      ")
    s"""deg AS (SELECT a AS node, COUNT(*) AS dg FROM edges GROUP BY 1),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM deg),
      r0 AS (SELECT node, dg, 1.0 / n.c AS r FROM deg CROSS JOIN n),
      $iters"""
  }

  /** Per-node triangle counts and local clustering coefficient over an
    * undirected pair set — the density diagnostic of a near-dup graph
    * (clique-y clusters are true duplicate families; triangle-free hubs
    * are LSH collision artifacts worth re-verifying).
    *
    * Enumeration is DEGREE-ORIENTED (each undirected edge points from its
    * lower-(deg, node) endpoint; wedges open only at the low end, ordered
    * by endpoint rank): every triangle is found exactly once and the
    * wedge join is bounded by O(m^1.5) instead of Σdeg² — a hub of
    * degree D contributes no wedge pairs unless it is the LOW end, which
    * degree ordering prevents. That is the difference between a skewed
    * near-dup graph finishing and a hub node exploding the join at
    * corpus scale; the oracle uses the naive a<b enumeration (same
    * result, triangle identity is orientation-free).
    *
    * Output: (node, n_tri, coeff) for every pair endpoint;
    * `coeff = 2·n_tri / (deg·(deg−1))`, 0 for degree-1 nodes.
    */
  def triangles(pairs: DataFrame): DataFrame = {
    val und = pairs.select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    // orient by (deg, node) rank; carry the high endpoint's rank for the
    // wedge ordering below (field names fixed so both when-branches type
    // identically)
    val ru = struct(col("du").as("d"), col("u").as("n"))
    val rv = struct(col("dv").as("d"), col("v").as("n"))
    val oriented = withDeg.select(
      when(ru < rv,
        struct(col("u").as("s"), col("v").as("t"), rv.as("rt")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"), ru.as("rt"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.rt").as("rt"))
      .localCheckpoint()
    val w1 = oriented.select(col("s"), col("t").as("t1"), col("rt").as("r1"))
    val w2 = oriented.select(col("s"), col("t").as("t2"), col("rt").as("r2"))
    val wedges = w1.join(w2, Seq("s"))
      .filter(col("r1") < col("r2"))
      .select(col("s"), col("t1"), col("t2"))
    val tri = wedges.join(
      oriented.select(col("s").as("t1"), col("t").as("t2")),
      Seq("t1", "t2"), "left_semi")
    val cnt = tri.select(explode(array(col("s"), col("t1"), col("t2")))
      .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(cnt, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          lit(2.0) * coalesce(col("n_tri"), lit(0L))
            / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)).as("coeff"))
  }

  /** k-core peeling (Seidman 1983): `rounds` synchronous rounds of
    * "drop every node with degree < k, then its edges", over the
    * canonical undirected edge set. A round is one degree aggregation +
    * two left-semi joins; each round strictly shrinks the edge set, so
    * `rounds` ≥ the peel depth yields the exact k-core, and a SMALLER
    * `rounds` yields the same partial peel on any engine that unrolls
    * the identical recurrence (what the oracle does — determinism never
    * depends on convergence). Early-exits when a round removes nothing
    * (the remaining rounds are no-ops, output unchanged). Returns the
    * surviving nodes with their degree in the peeled graph.
    *
    * Scale shape: the [[Dedup.components]] loop contract — per-round
    * localCheckpoint truncates lineage, shuffles are keyed on node/edge
    * endpoints, and state is the live edge set (monotonically shrinking).
    */
  def kCore(pairs: DataFrame, k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1; got $k, $rounds")
    def degreesOf(e: DataFrame): DataFrame =
      e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var edges = pairs.select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    var live = edges.count()
    var i = 0
    var converged = false
    while (i < rounds && !converged) {
      val keep = degreesOf(edges).filter(col("deg") >= k)
        .select(col("node")).localCheckpoint()
      val next = edges
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .localCheckpoint()
      val nextLive = next.count()
      converged = nextLive == live
      edges = next
      live = nextLive
      i += 1
    }
    degreesOf(edges).select(col("node"), col("deg").cast("long").as("deg"))
  }

  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007): every node starts as its own label; each round every node
    * adopts the label most frequent among its NEIGHBORS (pure neighbor
    * vote — the node's own current label does not participate), ties
    * broken by the smallest label. The deterministic variant: synchronous
    * updates + a total tie-break order, so the result is a pure function
    * of the edge set and `rounds` — the known oscillation of synchronous
    * LPA on bipartite structures is handled the same way [[kCore]]
    * handles partial peels: a FIXED round count that the oracle unrolls
    * identically, never a convergence test.
    *
    * Over a near-dup graph this yields duplicate families without the
    * transitive-closure fixpoint of [[Dedup.components]] — label prop
    * rounds are bounded work (R rounds, not graph diameter), the standard
    * trade at corpus scale where CC chains can be long but communities
    * are shallow.
    *
    * Scale shape: per round ONE hash join of the label table onto the
    * mirrored edges (shuffle keyed on the source endpoint) + one
    * (node, label) count aggregation + one per-node argmax — all
    * map-side-combined, state O(|V|); `localCheckpoint` truncates lineage
    * per round like every fixpoint loop in this repo.
    *
    * Output: (node, label) for every pair endpoint.
    */
  def labelPropagation(pairs: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val p = pairs.select(col("a"), col("b")).cache()
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    p.unpersist()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = edges
        .join(labels.select(col("node").as("a"), col("lbl")), Seq("a"))
        .groupBy(col("b").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      // argmax count, min label on ties: min_by over (-count, label) —
      // one hash aggregation, no per-node sort window
      labels = votes.groupBy(col("node"))
        .agg(min_by(col("lbl"),
          struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))
        .localCheckpoint()
    }
    labels.select(col("node"), col("lbl").as("label"))
  }

  /** DuckDB CTE chain replaying [[labelPropagation]]: assumes a prior CTE
    * `edges(a, b)` holding the MIRRORED edge set; appends l0 and
    * n1/l1 … up to `l$rounds` (columns node, lbl). The argmax is spelled
    * as a max-count window + MIN(lbl) — same result as Spark's min_by
    * tie-break, engine-portable.
    */
  def duckLabelPropSql(rounds: Int): String = {
    val iters = (1 to rounds).map { k =>
      s"""n$k AS (
        SELECT e.b AS node, p.lbl, COUNT(*) AS c
        FROM edges e JOIN l${k - 1} p ON p.node = e.a GROUP BY 1, 2),
      l$k AS (
        SELECT node, MIN(lbl) AS lbl FROM (
          SELECT node, lbl, c, MAX(c) OVER (PARTITION BY node) AS mc
          FROM n$k)
        WHERE c = mc GROUP BY 1)"""
    }.mkString(",\n      ")
    s"""l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM edges),
      $iters"""
  }

  /** Multi-source BFS distances over the undirected pair graph: hop count
    * to the nearest source, bounded at `rounds` hops (nodes unreached
    * within the bound are absent — the fixed-round contract every
    * iterative op in this family uses, so the oracle unrolls identical
    * rounds and determinism never depends on convergence).
    *
    * Implemented FRONTIER-STYLE: round r expands only the nodes first
    * reached at round r-1, anti-joins already-settled nodes, and appends
    * the new layer with dist = r. For unit edge weights this equals the
    * relax-to-fixpoint min-distance recurrence at the same bound (the
    * oracle spells THAT form — min over settled ∪ neighbors+1 — and
    * GraphSpec pins the equivalence against an in-driver BFS), but the
    * frontier plan's per-round join is |frontier|-sized, not
    * |settled|-sized: at 100 TB the expansion cost tracks the wave, and
    * state (the settled table) grows monotonically with lineage truncated
    * per round.
    */
  def bfsDistances(pairs: DataFrame, sources: DataFrame,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val p = pairs.select(col("a"), col("b")).cache()
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    p.unpersist()
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var frontier = dist.select(col("node"))
    // superseded checkpoints are unpersisted once their successor has
    // materialized (localCheckpoint is eager) — the Bpe.train convention;
    // without this, every bench leg / service call leaks one block set
    // per round into the block manager
    var prevNext: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val next = edges
        .join(frontier.select(col("node").as("a")), Seq("a"))
        .select(col("b").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(r.toLong))
        .localCheckpoint()
      val grown = dist.union(next).localCheckpoint()
      dist.unpersist()
      prevNext.foreach(_.unpersist())
      prevNext = Some(next)
      dist = grown
      frontier = next.select(col("node"))
    }
    prevNext.foreach(_.unpersist())
    edges.unpersist()
    dist
  }

  /** DuckDB CTE chain replaying [[bfsDistances]]: assumes prior CTEs
    * `edges(a, b)` (MIRRORED) and `src(node)`; appends d0 … d`rounds`
    * (columns node, dist) in the relax-min form — equivalent to the
    * engine's frontier expansion for unit weights at the same bound.
    */
  def duckBfsSql(rounds: Int): String = {
    val iters = (1 to rounds).map { k =>
      s"""d$k AS (
        SELECT node, MIN(dist) AS dist FROM (
          SELECT node, dist FROM d${k - 1}
          UNION ALL
          SELECT e.b AS node, p.dist + 1 AS dist
          FROM edges e JOIN d${k - 1} p ON p.node = e.a)
        GROUP BY 1)"""
    }.mkString(",\n      ")
    s"""d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM src),
      $iters"""
  }

  /** Degree centrality of an undirected pair set: (node, degree) with
    * mirrored-edge counting — the zero-iteration companion used to pick
    * cluster exemplars cheaply when the full power iteration isn't worth
    * a multi-round job.
    */
  def degrees(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("a"), col("b")).cache()
    val out = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .groupBy(col("a").as("node"))
      .agg(count(lit(1)).cast("long").as("degree"))
      .localCheckpoint()
    p.unpersist()
    out
  }
}

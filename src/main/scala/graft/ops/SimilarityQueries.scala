package graft.ops

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Similarity-search suite over the embeddings corpus (64-dim float
  * vectors, 10 cluster labels). Spark computes cosines via higher-order
  * functions over double-cast arrays; the DuckDB oracle mirrors the exact
  * iteration order via indexed unnest, so sums agree bit-for-bit (modulo
  * final rounding).
  */
object SimilarityQueries {

  private def doubled(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** DuckDB CTE computing pairwise cosine between qv/cv double lists. */
  private val duckCos = """
      comp AS (
        SELECT query_id, neighbor_id,
               SUM(qv[CAST(i AS INT)] * cv[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(cv[CAST(i AS INT)] * cv[CAST(i AS INT)]))) AS cos
        FROM (SELECT *, unnest(generate_series(1, 64)) AS i FROM pairs)
        GROUP BY 1, 2)"""

  val embCosineTopK = Q(
    "emb_cosine_topk",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.cosineTopK(emb, emb.filter(col("vec_id") % 50 === 0), 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 50 = 0),
      pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, q.qv, e.embedding::DOUBLE[] AS cv
        FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      $duckCos,
      ranked AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)
      SELECT query_id, neighbor_id, ROUND(cos, 3) AS cos, rank
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** The IVF oracle CTE chain through `ranked` (probed-cluster exact
    * cosines, globally ranked) — shared by the top-k row and its recall
    * gauge.
    */
  private val ivfCtes = """expl AS (
        SELECT label, vec_id, embedding::DOUBLE[] AS v,
               unnest(generate_series(1, 64)) AS i
        FROM embeddings),
      cent AS (
        SELECT label, i, AVG(v[CAST(i AS INT)]) AS mean
        FROM expl GROUP BY 1, 2),
      centv AS (
        SELECT label, list(mean ORDER BY i) AS centroid FROM cent GROUP BY 1),
      q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 50 = 0),
      pcomp AS (
        SELECT query_id, label,
               SUM(qv[CAST(i AS INT)] * centroid[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]))) AS ccos
        FROM (SELECT q.query_id, q.qv, c.label, c.centroid,
                     unnest(generate_series(1, 64)) AS i
              FROM q, centv c)
        GROUP BY 1, 2),
      probes AS (
        SELECT query_id, label FROM (
          SELECT query_id, label,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY ccos DESC, label) AS pr
          FROM pcomp) WHERE pr <= 2),
      pairs AS (
        SELECT p.query_id, e.vec_id AS neighbor_id, q.qv, e.embedding::DOUBLE[] AS cv
        FROM probes p
        JOIN embeddings e ON e.label = p.label
        JOIN q ON q.query_id = p.query_id
        WHERE e.vec_id <> p.query_id),
      comp AS (
        SELECT query_id, neighbor_id,
               SUM(qv[CAST(i AS INT)] * cv[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(cv[CAST(i AS INT)] * cv[CAST(i AS INT)]))) AS cos
        FROM (SELECT *, unnest(generate_series(1, 64)) AS i FROM pairs)
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)"""

  val embIvfTopK = Q(
    "emb_ivf_topk",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), col("label"), doubled(col("embedding")).as("embedding"))
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 50 === 0), "label",
        k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $ivfCtes
      SELECT query_id, neighbor_id, ROUND(cos, 3) AS cos, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank"""))

  /** SRP-bucketed near-dup: the oracle mirrors the deterministic md5-seeded
    * sign projections (8 bits, 4 bands of 2), the band equi-join candidate
    * step, and the exact-cosine verify — same cascade, same result set.
    * Query membership is EITHER-SIDE (the simhashPairs contract): a pair
    * qualifies when either endpoint is a query doc, so query docs carrying
    * the larger vec_id of a colliding pair are not silently dropped.
    */
  val embNearDup = Q(
    "emb_near_dup",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.embeddingNearDup(emb, col("vec_id") % 10 === 0, 0.4,
        nProj = 8, rowsPerBand = 2, dims = 64)
        .select(col("a"), col("b"), round(col("cos"), 3).as("cos"))
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      proj AS (
        SELECT vec_id, p,
               SUM(v[CAST(i AS INT)] *
                   CASE WHEN substr(md5(p || ':' || (i - 1)), 1, 1) < '8'
                        THEN 1.0 ELSE -1.0 END) AS proj
        FROM (SELECT vec_id, v, unnest(generate_series(1, 64)) AS i FROM e),
             (SELECT unnest(generate_series(0, 7)) AS p)
        GROUP BY 1, 2),
      banded AS (
        SELECT vec_id, CAST(p // 2 AS INT) AS band,
               SUM(CASE WHEN proj > 0 THEN 1 ELSE 0 END
                   << CAST(p % 2 AS INT)) AS bval
        FROM proj GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bval = r.bval AND l.vec_id < r.vec_id
        WHERE l.vec_id % 10 = 0 OR r.vec_id % 10 = 0),
      pairs AS (
        SELECT c.a AS query_id, c.b AS neighbor_id, ea.v AS qv, eb.v AS cv
        FROM cand c
        JOIN e ea ON ea.vec_id = c.a
        JOIN e eb ON eb.vec_id = c.b),
      $duckCos
      SELECT query_id AS a, neighbor_id AS b, ROUND(cos, 3) AS cos
      FROM comp WHERE cos >= 0.4 ORDER BY a, b"""))

  /** Unrolled 2-iteration Lloyd k-means CTE chain (md5-ordered seeding,
    * cosine argmax assignment, elementwise-mean update, reassignment),
    * ending in `<p>a2(vec_id, label)`. Every CTE name carries prefix `p`
    * so the chain composes with others (the PQ chain reuses sel/c0/a1/...)
    * — only `e(vec_id, v)` (the double-cast corpus) is expected to exist.
    */
  private[ops] def duckKmeansChain(p: String): String = s"""${p}sel AS (
        SELECT vec_id, v FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 10),
      ${p}c0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS label,
               v AS centroid
        FROM ${p}sel),
      ${p}p1 AS (
        SELECT e.vec_id, e.v, c.label, c.centroid,
               unnest(generate_series(1, 64)) AS i
        FROM e, ${p}c0 c),
      ${p}s1 AS (
        SELECT vec_id, label,
               SUM(v[CAST(i AS INT)] * centroid[CAST(i AS INT)])
                 / (SQRT(SUM(v[CAST(i AS INT)] * v[CAST(i AS INT)]))
                    * SQRT(SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]))) AS ccos
        FROM ${p}p1 GROUP BY 1, 2),
      ${p}a1 AS (
        SELECT vec_id, label FROM (
          SELECT vec_id, label,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY ccos DESC, label) AS rn
          FROM ${p}s1) WHERE rn = 1),
      ${p}x1 AS (
        SELECT a.label, e.v, unnest(generate_series(1, 64)) AS i
        FROM ${p}a1 a JOIN e ON e.vec_id = a.vec_id),
      ${p}m1 AS (
        SELECT label, i, AVG(v[CAST(i AS INT)]) AS mean
        FROM ${p}x1 GROUP BY 1, 2),
      ${p}c1 AS (
        SELECT label, list(mean ORDER BY i) AS centroid FROM ${p}m1 GROUP BY 1),
      ${p}p2 AS (
        SELECT e.vec_id, e.v, c.label, c.centroid,
               unnest(generate_series(1, 64)) AS i
        FROM e, ${p}c1 c),
      ${p}s2 AS (
        SELECT vec_id, label,
               SUM(v[CAST(i AS INT)] * centroid[CAST(i AS INT)])
                 / (SQRT(SUM(v[CAST(i AS INT)] * v[CAST(i AS INT)]))
                    * SQRT(SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]))) AS ccos
        FROM ${p}p2 GROUP BY 1, 2),
      ${p}a2 AS (
        SELECT vec_id, label FROM (
          SELECT vec_id, label,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY ccos DESC, label) AS rn
          FROM ${p}s2) WHERE rn = 1)"""

  /** Shared DuckDB CTE chain: the unprefixed k-means unroll over
    * `e(vec_id, v)`, ending in `a2(vec_id, label)`. Callers prefix `WITH `.
    */
  private val duckKmeans2 =
    "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n      " +
      duckKmeansChain("")

  /** Deterministic k-means (2 Lloyd iterations, md5-ordered seeding): the
    * oracle unrolls both iterations in SQL — seed selection, cosine argmax
    * assignment, elementwise-mean update, reassignment.
    */
  val embKmeans = Q(
    "emb_kmeans",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.kmeans(emb, 10, iters = 2)
        .select(col("vec_id"), col("label").cast("int").as("label"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $duckKmeans2
      SELECT vec_id, CAST(label AS INT) AS label FROM a2 ORDER BY vec_id"""))

  /** SemDeDup: within-k-means-cluster exact cosine pairs. The oracle
    * replays the full cascade — the unrolled k-means, the label equi-join
    * pair space, and the indexed-unnest cosine — so the cluster
    * restriction itself is verified, not just the final cosines.
    */
  val embSemDedup = Q(
    "emb_semdedup",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.semDedup(emb, 10, iters = 2, threshold = 0.35)
        .select(col("a"), col("b"), round(col("cos"), 3).as("cos"),
          col("label").cast("int").as("label"))
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      WITH $duckKmeans2,
      prs AS (
        SELECT x.vec_id AS a, y.vec_id AS b, x.label
        FROM a2 x JOIN a2 y ON x.label = y.label AND x.vec_id < y.vec_id),
      pe AS (
        SELECT p.a, p.b, p.label, ea.v AS qv, eb.v AS cv
        FROM prs p JOIN e ea ON ea.vec_id = p.a JOIN e eb ON eb.vec_id = p.b),
      pc AS (
        SELECT a, b, label,
               SUM(qv[CAST(i AS INT)] * cv[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(cv[CAST(i AS INT)] * cv[CAST(i AS INT)]))) AS cos
        FROM (SELECT *, unnest(generate_series(1, 64)) AS i FROM pe)
        GROUP BY 1, 2, 3)
      SELECT a, b, ROUND(cos, 3) AS cos, CAST(label AS INT) AS label
      FROM pc WHERE cos >= 0.35 ORDER BY a, b"""))

  /** Product-quantization ANN: train 8x8 codebooks, encode the corpus to
    * 8 small ints per vector, ADC top-10 per query. The whole pipeline is
    * deterministic (md5-ordered seeding, 2 fixed Lloyd iterations,
    * (dist, label) argmin tie-break), so the oracle unrolls it end to end:
    * subvector slicing, the shared seed ranking, both fused-Lloyd rounds
    * (L2 argmin mirrored as dist = sv.sv - 2 sv.c + c.c with the exact
    * three-dot formulation, elementwise-mean update), the encode argmin,
    * the per-query distance tables, and the ADC top-10. Recall quality is
    * separately spec-pinned in PqSpec vs the exact inner-product scan.
    */
  val embPqTopK = Q(
    "emb_pq_topk",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val books = Similarity.pqTrain(emb, dim = 64, nSub = 8, k = 8,
        iters = 2).cache()
      val codes = Similarity.pqEncode(emb, books, 64, 8)
      Similarity.pqSearch(codes, books, emb.filter(col("vec_id") % 50 === 0),
        dim = 64, nSub = 8, k = 8, topK = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("score"), 3).as("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckPqCode,
      sc AS (
        SELECT q.query_id, co.vec_id AS neighbor_id, SUM(q.dp) AS score
        FROM code co
        JOIN qdp q ON q.sub = co.sub AND q.label = co.label
        WHERE co.vec_id <> q.query_id
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM sc)
      SELECT query_id, neighbor_id, ROUND(score, 3) AS score, rank
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** Shared DuckDB CTE chain for the PQ family: two unrolled fused-Lloyd
    * iterations over every subspace (md5-ordered seeding — exactly
    * [[Similarity.pqTrain]]), row-local argmin encode (`code`), and the
    * per-query ADC dot tables (`qdp`, queries = vec_id % 50). Callers
    * prefix `WITH ` and append their scan/rank CTEs.
    */
  private lazy val duckPqCode = """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      subs AS (
        SELECT vec_id, CAST(s AS INT) AS sub,
               list_slice(v, CAST(s * 8 + 1 AS INT), CAST(s * 8 + 8 AS INT)) AS sv
        FROM e, (SELECT unnest(generate_series(0, 7)) AS s)),
      sel AS (
        SELECT vec_id FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      sl AS (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS label
        FROM sel),
      c0 AS (
        SELECT s.sub, l.label, s.sv AS centroid
        FROM subs s JOIN sl l USING (vec_id)),
      d1 AS (
        SELECT vec_id, sub, label,
               SUM(sv[CAST(i AS INT)] * sv[CAST(i AS INT)])
               - 2.0 * SUM(sv[CAST(i AS INT)] * centroid[CAST(i AS INT)])
               + SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]) AS dist
        FROM (SELECT s.vec_id, s.sub, s.sv, c.label, c.centroid,
                     unnest(generate_series(1, 8)) AS i
              FROM subs s JOIN c0 c ON c.sub = s.sub)
        GROUP BY 1, 2, 3),
      a1 AS (
        SELECT vec_id, sub, label FROM (
          SELECT vec_id, sub, label,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                    ORDER BY dist, label) AS rn
          FROM d1) WHERE rn = 1),
      x1 AS (
        SELECT a.sub, a.label, s.sv, unnest(generate_series(1, 8)) AS i
        FROM a1 a JOIN subs s ON s.vec_id = a.vec_id AND s.sub = a.sub),
      m1 AS (
        SELECT sub, label, i, AVG(sv[CAST(i AS INT)]) AS mean
        FROM x1 GROUP BY 1, 2, 3),
      c1 AS (
        SELECT sub, label, list(mean ORDER BY i) AS centroid
        FROM m1 GROUP BY 1, 2),
      d2 AS (
        SELECT vec_id, sub, label,
               SUM(sv[CAST(i AS INT)] * sv[CAST(i AS INT)])
               - 2.0 * SUM(sv[CAST(i AS INT)] * centroid[CAST(i AS INT)])
               + SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]) AS dist
        FROM (SELECT s.vec_id, s.sub, s.sv, c.label, c.centroid,
                     unnest(generate_series(1, 8)) AS i
              FROM subs s JOIN c1 c ON c.sub = s.sub)
        GROUP BY 1, 2, 3),
      a2 AS (
        SELECT vec_id, sub, label FROM (
          SELECT vec_id, sub, label,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                    ORDER BY dist, label) AS rn
          FROM d2) WHERE rn = 1),
      x2 AS (
        SELECT a.sub, a.label, s.sv, unnest(generate_series(1, 8)) AS i
        FROM a2 a JOIN subs s ON s.vec_id = a.vec_id AND s.sub = a.sub),
      m2 AS (
        SELECT sub, label, i, AVG(sv[CAST(i AS INT)]) AS mean
        FROM x2 GROUP BY 1, 2, 3),
      c2 AS (
        SELECT sub, label, list(mean ORDER BY i) AS centroid
        FROM m2 GROUP BY 1, 2),
      d3 AS (
        SELECT vec_id, sub, label,
               SUM(sv[CAST(i AS INT)] * sv[CAST(i AS INT)])
               - 2.0 * SUM(sv[CAST(i AS INT)] * centroid[CAST(i AS INT)])
               + SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]) AS dist
        FROM (SELECT s.vec_id, s.sub, s.sv, c.label, c.centroid,
                     unnest(generate_series(1, 8)) AS i
              FROM subs s JOIN c2 c ON c.sub = s.sub)
        GROUP BY 1, 2, 3),
      code AS (
        SELECT vec_id, sub, label FROM (
          SELECT vec_id, sub, label,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                    ORDER BY dist, label) AS rn
          FROM d3) WHERE rn = 1),
      qdp AS (
        SELECT vec_id AS query_id, sub, label,
               SUM(sv[CAST(i AS INT)] * centroid[CAST(i AS INT)]) AS dp
        FROM (SELECT s.vec_id, s.sub, s.sv, c.label, c.centroid,
                     unnest(generate_series(1, 8)) AS i
              FROM subs s JOIN c2 c ON c.sub = s.sub
              WHERE s.vec_id % 50 = 0)
        GROUP BY 1, 2, 3)"""

  /** IVF-PQ composition (the FAISS-IVFPQ shape): the coarse quantizer
    * (stored label) bounds which rows are scanned, PQ codes bound what a
    * scanned row costs. The oracle composes the shared PQ chain with the
    * IVF probe chain and restricts the ADC scan to probed clusters.
    */
  val embIvfPqTopK = Q(
    "emb_ivfpq_topk",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          doubled(col("embedding")).as("embedding"))
      val books = Similarity.pqTrain(emb, dim = 64, nSub = 8, k = 8,
        iters = 2).cache()
      val codes = Similarity.pqEncode(emb, books, 64, 8)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") % 50 === 0),
        "label", codes, books, dim = 64, nSub = 8, k = 8, topK = 10,
        nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("score"), 3).as("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckPqCode,
      expl AS (
        SELECT label, vec_id, embedding::DOUBLE[] AS v,
               unnest(generate_series(1, 64)) AS i
        FROM embeddings),
      centm AS (
        SELECT label, i, AVG(v[CAST(i AS INT)]) AS mean
        FROM expl GROUP BY 1, 2),
      centv AS (
        SELECT label, list(mean ORDER BY i) AS centroid FROM centm GROUP BY 1),
      qe AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 50 = 0),
      pcomp AS (
        SELECT query_id, label,
               SUM(qv[CAST(i AS INT)] * centroid[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]))) AS ccos
        FROM (SELECT qe.query_id, qe.qv, c.label, c.centroid,
                     unnest(generate_series(1, 64)) AS i
              FROM qe, centv c)
        GROUP BY 1, 2),
      probes AS (
        SELECT query_id, label FROM (
          SELECT query_id, label,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY ccos DESC, label) AS pr
          FROM pcomp) WHERE pr <= 2),
      sc AS (
        SELECT qd.query_id, co.vec_id AS neighbor_id, SUM(qd.dp) AS score
        FROM code co
        JOIN embeddings em ON em.vec_id = co.vec_id
        JOIN probes p ON p.label = em.label
        JOIN qdp qd ON qd.sub = co.sub AND qd.label = co.label
                   AND qd.query_id = p.query_id
        WHERE co.vec_id <> qd.query_id
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM sc)
      SELECT query_id, neighbor_id, ROUND(score, 3) AS score, rank
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** The persisted-IVF flagship path end-to-end, stored artifacts included:
    * [[Similarity.buildAnnIndex]] k-means-clusters the corpus into a
    * temp-dir index (vectors partitioned by label + a centroid table) and
    * [[Similarity.searchAnnIndexed]] probes the STORED centroids and scans
    * only the probed label partitions (dynamic partition pruning). The
    * oracle replays the unrolled k-means, recomputes the stored per-label
    * centroids, probes, and restricts the exact-cosine scan to probed
    * clusters — so a regression anywhere in the build/persist/search
    * cascade (label assignment, centroid persistence, partition pruning,
    * final ranking) hash-mismatches.
    */
  val embAnnIndexSearch = Q(
    "emb_ann_index_search",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ann_idx").toString
      Similarity.buildAnnIndex(emb, dir, nClusters = 10, iters = 2)
      Similarity.searchAnnIndexed(s, dir,
        emb.filter(col("vec_id") % 50 === 0), k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckKmeans2,
      lab AS (
        SELECT e.vec_id, e.v, a.label FROM e JOIN a2 a ON a.vec_id = e.vec_id),
      centm AS (
        SELECT label, i, AVG(v[CAST(i AS INT)]) AS mean
        FROM (SELECT label, v, unnest(generate_series(1, 64)) AS i FROM lab)
        GROUP BY 1, 2),
      centv AS (
        SELECT label, list(mean ORDER BY i) AS centroid FROM centm GROUP BY 1),
      q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
      pcomp AS (
        SELECT query_id, label,
               SUM(qv[CAST(i AS INT)] * centroid[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]))) AS ccos
        FROM (SELECT q.query_id, q.qv, c.label, c.centroid,
                     unnest(generate_series(1, 64)) AS i
              FROM q, centv c)
        GROUP BY 1, 2),
      probes AS (
        SELECT query_id, label FROM (
          SELECT query_id, label,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY ccos DESC, label) AS pr
          FROM pcomp) WHERE pr <= 2),
      pairs AS (
        SELECT p.query_id, l.vec_id AS neighbor_id, q.qv, l.v AS cv
        FROM probes p
        JOIN lab l ON l.label = p.label
        JOIN q ON q.query_id = p.query_id
        WHERE l.vec_id <> p.query_id),
      $duckCos,
      ranked AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)
      SELECT query_id, neighbor_id, ROUND(cos, 3) AS cos, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank"""))

  /** The persisted-IVF-PQ flagship path end-to-end:
    * [[Similarity.buildPqIndex]] persists coarse-labeled PQ CODES (plus
    * codebooks and coarse centroids) into a temp dir, and
    * [[Similarity.searchPqIndexed]] probes the stored centroids, scans
    * only the probed label partitions of the codes table, and scores by
    * ADC lookup. The oracle composes the shared PQ chain (codes + ADC
    * tables) with a `k`-prefixed unrolled-k-means chain for the coarse
    * labels and restricts the ADC scan to probed clusters.
    */
  /** Shared DuckDB chain for the persisted-IVF-PQ oracles: the PQ chain
    * (codes + ADC tables) composed with a `k`-prefixed unrolled-k-means
    * chain for the coarse labels, probes, ADC scan restricted to probed
    * clusters, ending in `kranked(query_id, neighbor_id, score, rank)`.
    * Callers prefix `WITH ` and select at their own rank cutoff.
    */
  private lazy val duckPqIndexChain = s"""$duckPqCode,
      ${duckKmeansChain("k")},
      klab AS (
        SELECT e.vec_id, e.v, a.label FROM e JOIN ka2 a ON a.vec_id = e.vec_id),
      kcentm AS (
        SELECT label, i, AVG(v[CAST(i AS INT)]) AS mean
        FROM (SELECT label, v, unnest(generate_series(1, 64)) AS i FROM klab)
        GROUP BY 1, 2),
      kcentv AS (
        SELECT label, list(mean ORDER BY i) AS centroid FROM kcentm GROUP BY 1),
      kq AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
      kpcomp AS (
        SELECT query_id, label,
               SUM(qv[CAST(i AS INT)] * centroid[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]))) AS ccos
        FROM (SELECT kq.query_id, kq.qv, c.label, c.centroid,
                     unnest(generate_series(1, 64)) AS i
              FROM kq, kcentv c)
        GROUP BY 1, 2),
      kprobes AS (
        SELECT query_id, label FROM (
          SELECT query_id, label,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY ccos DESC, label) AS pr
          FROM kpcomp) WHERE pr <= 2),
      ksc AS (
        SELECT qd.query_id, co.vec_id AS neighbor_id, SUM(qd.dp) AS score
        FROM code co
        JOIN ka2 al ON al.vec_id = co.vec_id
        JOIN kprobes p ON p.label = al.label
        JOIN qdp qd ON qd.sub = co.sub AND qd.label = co.label
                   AND qd.query_id = p.query_id
        WHERE co.vec_id <> qd.query_id
        GROUP BY 1, 2),
      kranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM ksc)"""

  val embPqIndexSearch = Q(
    "emb_pqindex_search",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pq_idx").toString
      Similarity.buildPqIndex(emb, dir, nClusters = 10, dim = 64, nSub = 8,
        pqK = 8, iters = 2)
      Similarity.searchPqIndexed(s, dir, emb.filter(col("vec_id") % 50 === 0),
        dim = 64, nSub = 8, pqK = 8, topK = 10, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("score"), 3).as("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckPqIndexChain
      SELECT query_id, neighbor_id, ROUND(score, 3) AS score, rank
      FROM kranked WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** Two-stage retrieval: ADC candidates from the persisted IVF-PQ index
    * (top 30), re-ranked by exact cosine against the raw corpus, top 5
    * kept. The oracle extends the persisted-index chain with the exact
    * re-rank, so BOTH stages — the approximate candidate cut and the
    * exact final ordering — are verified.
    */
  val embPqIndexRerank = Q(
    "emb_pqindex_rerank",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pqrr_idx").toString
      Similarity.buildPqIndex(emb, dir, nClusters = 10, dim = 64, nSub = 8,
        pqK = 8, iters = 2)
      Similarity.searchPqIndexedRerank(s, dir, emb,
        emb.filter(col("vec_id") % 50 === 0),
        dim = 64, nSub = 8, pqK = 8, topK = 5, rerankK = 30, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckPqIndexChain,
      cands AS (
        SELECT query_id, neighbor_id FROM kranked WHERE rank <= 30),
      pairs AS (
        SELECT c.query_id, c.neighbor_id, qe2.v AS qv, ce.v AS cv
        FROM cands c
        JOIN e qe2 ON qe2.vec_id = c.query_id
        JOIN e ce ON ce.vec_id = c.neighbor_id),
      $duckCos,
      rr AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)
      SELECT query_id, neighbor_id, ROUND(cos, 3) AS cos, rank
      FROM rr WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Per-JVM prebuilt index fixtures, keyed by sfDir. The `*_probe`
    * queries below time (and verify) the per-query SEARCH path alone —
    * probe join, partition-pruned scan, ADC/cosine ranking — which is
    * what runs per query in production; the `emb_*_index_search` rows
    * keep timing the whole build→persist→search cascade. The build runs
    * once per JVM, outside any timed window (Bench warms the fixtures
    * explicitly before pass 1). Build params match
    * [[embAnnIndexSearch]] / [[embPqIndexSearch]] exactly, so those
    * queries' oracles verify the probe rows too.
    */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensureAnnFixture(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    fixtureCache.computeIfAbsent(s"ann:$d", { _ =>
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ann_fixture").toString
      Similarity.buildAnnIndex(emb, dir, nClusters = 10, iters = 2)
      dir
    })

  def ensurePqFixture(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    fixtureCache.computeIfAbsent(s"pq:$d", { _ =>
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pq_fixture").toString
      Similarity.buildPqIndex(emb, dir, nClusters = 10, dim = 64, nSub = 8,
        pqK = 8, iters = 2)
      dir
    })

  val embAnnProbe = Q(
    "emb_ann_probe",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.searchAnnIndexed(s, ensureAnnFixture(s, d),
        emb.filter(col("vec_id") % 50 === 0), k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    embAnnIndexSearch.oracle)

  val embPqProbe = Q(
    "emb_pq_probe",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.searchPqIndexed(s, ensurePqFixture(s, d),
        emb.filter(col("vec_id") % 50 === 0),
        dim = 64, nSub = 8, pqK = 8, topK = 10, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("score"), 3).as("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    embPqIndexSearch.oracle)

  val embPqRerankProbe = Q(
    "emb_pq_rerank_probe",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.searchPqIndexedRerank(s, ensurePqFixture(s, d), emb,
        emb.filter(col("vec_id") % 50 === 0),
        dim = 64, nSub = 8, pqK = 8, topK = 5, rerankK = 30, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    embPqIndexRerank.oracle)

  /** Hybrid dense+sparse retrieval via reciprocal-rank fusion: BM25 over
    * the documents table and exact cosine over the parallel embeddings
    * table, ranks fused with 1/(60+rank). The oracle replays BOTH
    * retrieval cascades (the text_bm25 CTE chain and the brute-force
    * cosine chain) and the fusion arithmetic — rank-based, so the fused
    * scores are exact functions of two integer orderings.
    */
  val embHybridRrf = Q(
    "emb_hybrid_rrf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sparse = graft.ops.TextAnalysis.bm25(T.documents(s, d), "doc_id",
        "text", Seq("vector", "hash"), k1 = 1.2, b = 0.75, topK = 30)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("id"))))
        .select(col("id"), col("rank"))
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dense = Similarity.cosineTopK(emb, emb.filter(col("vec_id") === 0), 30)
        .select(col("neighbor_id").as("id"), col("rank"))
      Similarity.rrfFuse(Seq(sparse, dense), "id", "rank", rrfK = 60,
        topK = 15)
        .select(col("id").as("doc_id"), round(col("rrf_score"), 6).as("rrf"),
          col("n_lists"))
        .orderBy(col("rrf").desc, col("doc_id"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id AS id,
               unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
        FROM documents),
      t AS (SELECT id, tok FROM tok WHERE length(tok) > 0),
      dl AS (SELECT id, COUNT(*) AS dl FROM t GROUP BY 1),
      stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
      tf AS (SELECT id, tok, COUNT(*) AS tf FROM t
             WHERE tok IN ('vector', 'hash') GROUP BY 1, 2),
      dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      sc AS (
        SELECT tf.id,
               SUM(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                   * (tf.tf * (1.2 + 1))
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
                 AS score
        FROM tf JOIN dfq USING (tok) JOIN dl USING (id), stats s
        GROUP BY 1),
      sparse AS (
        SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS INT)
                 AS rank
        FROM (SELECT * FROM sc ORDER BY score DESC, id LIMIT 30)),
      q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id = 0),
      pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, q.qv,
               e.embedding::DOUBLE[] AS cv
        FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      $duckCos,
      dense AS (
        SELECT neighbor_id AS id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, neighbor_id) AS INT)
                 AS rank
        FROM comp QUALIFY rank <= 30),
      contrib AS (
        SELECT id, 1.0 / (60.0 + rank) AS c FROM sparse
        UNION ALL
        SELECT id, 1.0 / (60.0 + rank) AS c FROM dense),
      fused AS (
        SELECT id, SUM(c) AS rrf_score, CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM contrib GROUP BY 1
        ORDER BY rrf_score DESC, id LIMIT 15)
      SELECT id AS doc_id, ROUND(rrf_score, 6) AS rrf, n_lists
      FROM fused ORDER BY rrf DESC, doc_id"""))

  /** Maintenance gate: the flagship ANN search re-run on a COMPACTED
    * artifact. `compactAnnIndex` promises content-identity (only file
    * boundaries change), so the row set must hash-equal the
    * `emb_ann_index_search` oracle — a compaction that drops, duplicates,
    * or relabels a single vector mismatches. bench=false: cost is already
    * measured by the build-inclusive twin; this row exists for the driver
    * hash compare.
    */
  val embAnnCompactedSearch = Q(
    "emb_ann_compacted_search",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ann_compact").toString
      Similarity.buildAnnIndex(emb, dir, nClusters = 10, iters = 2)
      Maintenance.compactAnnIndex(s, dir)
      Similarity.searchAnnIndexed(s, dir,
        emb.filter(col("vec_id") % 50 === 0), k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    embAnnIndexSearch.oracle,
    bench = false)

  /** Maintenance gate: build(2 Lloyd rounds) + rebalance(1 warm-start
    * round) + search. The stored centroids after build are the
    * mean-over-final-assignment, so one warm-start Lloyd round is EXACTLY
    * Lloyd round 3 of the same unrolled chain — the oracle extends
    * `duckKmeansChain` by one assignment (a3) and searches against the
    * a3 labels and their means, verifying the relabel, the partition
    * rewrite, and the new centroid table in one hash. bench=false (the
    * driver hash compare is the point).
    */
  val embAnnRebalancedSearch = Q(
    "emb_ann_rebalanced_search",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ann_rebal").toString
      Similarity.buildAnnIndex(emb, dir, nClusters = 10, iters = 2)
      Similarity.rebalanceAnnIndex(s, dir, iters = 1)
      Similarity.searchAnnIndexed(s, dir,
        emb.filter(col("vec_id") % 50 === 0), k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $duckKmeans2,
      bx AS (
        SELECT a.label, e.v, unnest(generate_series(1, 64)) AS i
        FROM a2 a JOIN e ON e.vec_id = a.vec_id),
      bm AS (
        SELECT label, i, AVG(v[CAST(i AS INT)]) AS mean
        FROM bx GROUP BY 1, 2),
      bc AS (
        SELECT label, list(mean ORDER BY i) AS centroid FROM bm GROUP BY 1),
      p3 AS (
        SELECT e.vec_id, e.v, c.label, c.centroid,
               unnest(generate_series(1, 64)) AS i
        FROM e, bc c),
      s3 AS (
        SELECT vec_id, label,
               SUM(v[CAST(i AS INT)] * centroid[CAST(i AS INT)])
                 / (SQRT(SUM(v[CAST(i AS INT)] * v[CAST(i AS INT)]))
                    * SQRT(SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]))) AS ccos
        FROM p3 GROUP BY 1, 2),
      a3 AS (
        SELECT vec_id, label FROM (
          SELECT vec_id, label,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY ccos DESC, label) AS rn
          FROM s3) WHERE rn = 1),
      lab AS (
        SELECT e.vec_id, e.v, a.label FROM a3 a JOIN e ON e.vec_id = a.vec_id),
      centm AS (
        SELECT label, i, AVG(v[CAST(i AS INT)]) AS mean
        FROM (SELECT label, v, unnest(generate_series(1, 64)) AS i FROM lab)
        GROUP BY 1, 2),
      centv AS (
        SELECT label, list(mean ORDER BY i) AS centroid FROM centm GROUP BY 1),
      q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
      pcomp AS (
        SELECT query_id, label,
               SUM(qv[CAST(i AS INT)] * centroid[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(centroid[CAST(i AS INT)] * centroid[CAST(i AS INT)]))) AS ccos
        FROM (SELECT q.query_id, q.qv, c.label, c.centroid,
                     unnest(generate_series(1, 64)) AS i
              FROM q, centv c)
        GROUP BY 1, 2),
      probes AS (
        SELECT query_id, label FROM (
          SELECT query_id, label,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY ccos DESC, label) AS pr
          FROM pcomp) WHERE pr <= 2),
      pairs AS (
        SELECT p.query_id, l.vec_id AS neighbor_id, q.qv, l.v AS cv
        FROM probes p
        JOIN lab l ON l.label = p.label
        JOIN q ON q.query_id = p.query_id
        WHERE l.vec_id <> p.query_id),
      $duckCos,
      ranked AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)
      SELECT query_id, neighbor_id, ROUND(cos, 3) AS cos, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank"""),
    bench = false)

  /** Population covariance of the embedding corpus as an upper-triangular
    * (i, j, cov) table — the one-pass moment statistics behind
    * [[LinAlg.pca]]/whitening. The Spark side reduces through a single
    * O(d²)-state treeAggregate (no shuffle of row data); the oracle
    * replays the same `Σxy/n − (Σx/n)(Σy/n)` expression over an indexed
    * unnest so the float paths agree to the 6-decimal rounding.
    */
  val embCovariance = Q(
    "emb_covariance",
    (s, d) => {
      LinAlg.covariance(T.embeddings(s, d), "embedding")
        // + 0.0 normalizes IEEE -0.0 to +0.0 (the oracle does the same —
        // pandas formats them differently and the driver hash would split)
        .select(col("i"), col("j"),
          (round(col("cov"), 6) + lit(0.0)).as("cov"))
        .orderBy(col("i"), col("j"))
    },
    Some("""
      WITH x AS (
        SELECT vec_id, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS xv,
               CAST(i AS INT) AS i
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, 64)) AS i
              FROM embeddings)),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM embeddings),
      p AS (
        SELECT a.i AS i, b.i AS j,
               SUM(a.xv * b.xv) AS sxy, SUM(a.xv) AS sx, SUM(b.xv) AS sy
        FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2)
      SELECT CAST(i - 1 AS INT) AS i, CAST(j - 1 AS INT) AS j,
             ROUND(sxy / n.c - (sx / n.c) * (sy / n.c), 6) + 0.0 AS cov
      FROM p CROSS JOIN n ORDER BY i, j"""))

  /** The SQ8 oracle CTE chain through `ranked` (exact-reranked
    * candidates) — shared by the top-k row and the recall row.
    */
  private val sq8Ctes = s"""dims AS (
        SELECT vec_id, CAST(x AS DOUBLE) AS x, i FROM (
          SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
                 generate_subscripts(embedding, 1) AS i FROM embeddings)),
      cal AS (SELECT i, MIN(x) AS lo, MAX(x) AS hi FROM dims GROUP BY i),
      dec AS (
        SELECT d.vec_id, d.i,
               c.lo + (CASE WHEN c.hi = c.lo THEN 0
                       ELSE FLOOR((d.x - c.lo) / (c.hi - c.lo) * 255.0 + 0.5) END)
                 * (c.hi - c.lo) / 255.0 AS dx
        FROM dims d JOIN cal c ON c.i = d.i),
      dn AS (SELECT vec_id, SQRT(SUM(dx * dx)) AS dn FROM dec GROUP BY 1),
      qset AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 50 = 0),
      qn AS (SELECT d.vec_id AS query_id, SQRT(SUM(d.x * d.x)) AS qn
             FROM dims d JOIN qset ON qset.query_id = d.vec_id GROUP BY 1),
      adot AS (
        SELECT qd.vec_id AS query_id, dec.vec_id AS neighbor_id,
               SUM(qd.x * dec.dx) AS adp
        FROM dims qd JOIN qset ON qset.query_id = qd.vec_id
        JOIN dec ON dec.i = qd.i AND dec.vec_id <> qd.vec_id
        GROUP BY 1, 2),
      approx AS (
        SELECT a.query_id, a.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.query_id
                 ORDER BY a.adp / (qn.qn * dn.dn) DESC, a.neighbor_id) AS arank
        FROM adot a JOIN qn USING (query_id)
        JOIN dn ON dn.vec_id = a.neighbor_id),
      pairs AS (
        SELECT c.query_id, c.neighbor_id,
               qa.embedding::DOUBLE[] AS qv, qb.embedding::DOUBLE[] AS cv
        FROM approx c
        JOIN embeddings qa ON qa.vec_id = c.query_id
        JOIN embeddings qb ON qb.vec_id = c.neighbor_id
        WHERE c.arank <= 20),
      $duckCos,
      ranked AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)"""

  /** SQ8 scalar-quantization ANN: min/max-calibrated uint8 codes, decoded
    * asymmetric scan for candidates, exact-cosine rerank — the
    * scalar-quantizer member of the ANN family next to IVF/PQ/SRP.
    */
  val embSq8TopK = Q(
    "emb_sq8_topk",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.sq8TopK(emb, emb.filter(col("vec_id") % 50 === 0),
          k = 5, rerank = 20)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $sq8Ctes
      SELECT query_id, neighbor_id, ROUND(cos, 3) AS cos, rank
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Recall@5 of the SQ8 path against the exact scan, per query — the
    * ANN quality gauge as a first-class hash-gated row (both retrieval
    * chains replayed in the oracle, intersected there too).
    */
  val embSq8Recall = Q(
    "emb_sq8_recall",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
      val exact = Similarity.cosineTopK(emb, queries, 5)
      val approx = Similarity.sq8TopK(emb, queries, k = 5, rerank = 20)
      Similarity.recallAtK(approx, exact, 5)
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH $sq8Ctes,
      epairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               q.qv, e.embedding::DOUBLE[] AS cv
        FROM embeddings e,
             (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id % 50 = 0) q
        WHERE e.vec_id <> q.query_id),
      ecomp AS (
        SELECT query_id, neighbor_id,
               SUM(qv[CAST(i AS INT)] * cv[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(cv[CAST(i AS INT)] * cv[CAST(i AS INT)]))) AS cos
        FROM (SELECT *, unnest(generate_series(1, 64)) AS i FROM epairs)
        GROUP BY 1, 2),
      etop AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rk
          FROM ecomp) WHERE rk <= 5),
      atop AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
      h AS (
        SELECT a.query_id, COUNT(*) AS hits
        FROM atop a JOIN etop e USING (query_id, neighbor_id)
        GROUP BY 1)
      SELECT q.query_id,
             CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
             ROUND(COALESCE(h.hits, 0) / 5.0, 4) AS recall
      FROM (SELECT DISTINCT query_id FROM etop) q
      LEFT JOIN h USING (query_id)
      ORDER BY query_id"""))

  /** JL random-projection ANN (dims 64 → 16) with exact rerank: the
    * oracle replays the md5-seeded ±1 projection matrix, the
    * projected-space cosine ranking, the rerank-window cut, and the exact
    * rerank — the full cascade, same result set.
    */
  /** The RP oracle chain's PREFIX through `scored` — md5-seeded ±1
    * matrix, projected-space ranking with the UNCUT approximate rank —
    * so callers can apply their own rerank-window cut ([[rpCtes]] cuts
    * at the registry's 20; the recall sweep cuts at several widths).
    */
  private val rpProjCtes = s"""e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      proj AS (
        SELECT vec_id, p,
               SUM(v[CAST(i AS INT)] *
                   CASE WHEN substr(md5('rp:' || p || ':' || (i - 1)), 1, 1) < '8'
                        THEN 1.0 ELSE -1.0 END) AS pv
        FROM (SELECT vec_id, v, unnest(generate_series(1, 64)) AS i FROM e),
             (SELECT unnest(generate_series(0, 15)) AS p)
        GROUP BY 1, 2),
      pn AS (SELECT vec_id, SQRT(SUM(pv * pv)) AS n FROM proj GROUP BY 1),
      ip AS (
        SELECT pq.vec_id AS query_id, pc.vec_id AS neighbor_id,
               SUM(pq.pv * pc.pv) AS ip
        FROM proj pq JOIN proj pc USING (p)
        WHERE pq.vec_id % 50 = 0 AND pc.vec_id <> pq.vec_id
        GROUP BY 1, 2),
      scored AS (
        SELECT a.query_id, a.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.query_id
                 ORDER BY a.ip / (nq.n * nc.n) DESC, a.neighbor_id) AS arank
        FROM ip a
        JOIN pn nq ON nq.vec_id = a.query_id
        JOIN pn nc ON nc.vec_id = a.neighbor_id)"""

  /** The RP oracle CTE chain through `ranked` — md5-seeded ±1 matrix,
    * projected-space ranking, rerank cut, exact rerank — shared by the
    * top-k row, the persisted-index row, and the recall gauge.
    */
  private val rpCtes = s"""$rpProjCtes,
      cand AS (
        SELECT query_id, neighbor_id FROM scored WHERE arank <= 20),
      pairs AS (
        SELECT c.query_id, c.neighbor_id, eq.v AS qv, ec.v AS cv
        FROM cand c
        JOIN e eq ON eq.vec_id = c.query_id
        JOIN e ec ON ec.vec_id = c.neighbor_id),
      $duckCos,
      ranked AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)"""

  val embRpTopK = Q(
    "emb_rp_topk",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.rpTopK(emb, emb.filter(col("vec_id") % 50 === 0),
          k = 5, dProj = 16, rerank = 20)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $rpCtes
      SELECT query_id, neighbor_id, ROUND(cos, 3) AS cos, rank
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Top-principal-component projection (LinAlg.pca at 3 power
    * iterations, k=1): the oracle replays the WHOLE eigen path in SQL —
    * mean, full covariance, three matvec+normalize power rounds, the
    * largest-|loading|-positive sign fix, and the centered projection.
    * Three iterations (not the production default 100) keep the oracle
    * CTE chain short; determinism is identical either way (fixed start,
    * no RNG), and power iteration is contractive so the engines' float
    * paths converge toward the same axis rather than drifting apart.
    */
  /** The power-iteration PCA CTE chain through `proj` (3 iterations,
    * sign-fixed top component, centered projection) — shared by the
    * plain-projection row and the whitening row.
    */
  private val pcaCtes = """x AS (
        SELECT vec_id, CAST(i AS INT) AS i,
               CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS xv
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, 64)) AS i
              FROM embeddings)),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM embeddings),
      m AS (SELECT i, SUM(xv) / n.c AS mv
            FROM x CROSS JOIN n GROUP BY i, n.c),
      cov AS (
        SELECT a.i AS i, b.i AS j,
               SUM(a.xv * b.xv) / n.c - ma.mv * mb.mv AS cv
        FROM x a JOIN x b ON a.vec_id = b.vec_id
        CROSS JOIN n
        JOIN m ma ON ma.i = a.i
        JOIN m mb ON mb.i = b.i
        GROUP BY a.i, b.i, n.c, ma.mv, mb.mv),
      v0 AS (SELECT DISTINCT i, 1.0 / SQRT(64.0) AS vv FROM x),
      w1 AS (SELECT cov.i, SUM(cov.cv * v0.vv) AS wv
             FROM cov JOIN v0 ON v0.i = cov.j GROUP BY cov.i),
      s1 AS (SELECT SQRT(SUM(wv * wv)) AS nn FROM w1),
      v1 AS (SELECT i, wv / s1.nn AS vv FROM w1 CROSS JOIN s1),
      w2 AS (SELECT cov.i, SUM(cov.cv * v1.vv) AS wv
             FROM cov JOIN v1 ON v1.i = cov.j GROUP BY cov.i),
      s2 AS (SELECT SQRT(SUM(wv * wv)) AS nn FROM w2),
      v2 AS (SELECT i, wv / s2.nn AS vv FROM w2 CROSS JOIN s2),
      w3 AS (SELECT cov.i, SUM(cov.cv * v2.vv) AS wv
             FROM cov JOIN v2 ON v2.i = cov.j GROUP BY cov.i),
      s3 AS (SELECT SQRT(SUM(wv * wv)) AS nn FROM w3),
      v3 AS (SELECT i, wv / s3.nn AS vv FROM w3 CROSS JOIN s3),
      sgn AS (SELECT vv FROM v3 ORDER BY ABS(vv) DESC, i LIMIT 1),
      comp AS (
        SELECT v3.i,
               CASE WHEN sgn.vv < 0 THEN -v3.vv ELSE v3.vv END AS cv
        FROM v3 CROSS JOIN sgn),
      proj AS (
        SELECT x.vec_id, SUM((x.xv - m.mv) * comp.cv) AS p
        FROM x JOIN m ON m.i = x.i JOIN comp ON comp.i = x.i
        GROUP BY x.vec_id)"""

  val embPcaProject = Q(
    "emb_pca_project",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val model = LinAlg.pca(emb, "embedding", k = 1, powerIters = 3)
      LinAlg.projectPca(emb, "embedding", model, "proj")
        .select(col("vec_id"),
          (round(element_at(col("proj"), 1), 4) + lit(0.0)).as("pc1"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $pcaCtes
      SELECT vec_id, ROUND(p, 4) + 0.0 AS pc1
      FROM proj ORDER BY vec_id"""))

  /** PCA whitening (`projectPca(whiten = true)`): the top component's
    * projection scaled to unit variance by 1/sqrt(eigenvalue) — the
    * embedding-normalization step in front of cosine retrieval /
    * SemDeDup pipelines. The oracle extends the shared power-iteration
    * chain with the Rayleigh quotient (lambda = c'Cc over the same cov
    * table), so both engines derive the scale from the same arithmetic.
    */
  val embPcaWhiten = Q(
    "emb_pca_whiten",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val model = LinAlg.pca(emb, "embedding", k = 1, powerIters = 3)
      LinAlg.projectPca(emb, "embedding", model, "proj", whiten = true)
        .select(col("vec_id"),
          (round(element_at(col("proj"), 1), 4) + lit(0.0)).as("w1"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $pcaCtes,
      eig AS (
        SELECT SUM(ca.cv * cov.cv * cb.cv) AS ev
        FROM cov JOIN comp ca ON ca.i = cov.i
                 JOIN comp cb ON cb.i = cov.j)
      SELECT vec_id, ROUND(p / SQRT(eig.ev), 4) + 0.0 AS w1
      FROM proj CROSS JOIN eig ORDER BY vec_id"""))

  /** Persisted RP index: build on 90% of the corpus, append the rest,
    * search the STORED projected table — and hash-match the SAME oracle
    * as emb_rp_topk, so the artifact round trip and the append are
    * invisible (the house build/append/search contract).
    */
  val embRpIndexSearch = Q(
    "emb_rpindex_search",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val dir = java.nio.file.Files.createTempDirectory("rpidx").toString
      Similarity.buildRpIndex(emb.filter(col("vec_id") % 10 =!= 0), dir,
        dProj = 16)
      Similarity.appendToRpIndex(emb.filter(col("vec_id") % 10 === 0), dir)
      Similarity.searchRpIndexed(s, dir,
          emb.filter(col("vec_id") % 50 === 0), k = 5, rerank = 20)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    embRpTopK.oracle)

  /** Exact cosine top-`k` + recall tail over an approximate `ranked`
    * CTE already in scope — the shared suffix of every cosine-family
    * recall gauge (queries = vec_id % 50, the family's query set).
    */
  private def cosRecallTail(k: Int): String = s"""
      epairs AS (
        SELECT q.query_id, e2.vec_id AS neighbor_id,
               q.qv, e2.embedding::DOUBLE[] AS cv
        FROM embeddings e2,
             (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id % 50 = 0) q
        WHERE e2.vec_id <> q.query_id),
      ecomp AS (
        SELECT query_id, neighbor_id,
               SUM(qv[CAST(i AS INT)] * cv[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(cv[CAST(i AS INT)] * cv[CAST(i AS INT)]))) AS cos
        FROM (SELECT *, unnest(generate_series(1, 64)) AS i FROM epairs)
        GROUP BY 1, 2),
      etop AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rk
          FROM ecomp) WHERE rk <= $k),
      atop AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= $k),
      h AS (
        SELECT a.query_id, COUNT(*) AS hits
        FROM atop a JOIN etop e3 USING (query_id, neighbor_id)
        GROUP BY 1)
      SELECT q2.query_id,
             CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
             ROUND(COALESCE(h.hits, 0) / $k.0, 4) AS recall
      FROM (SELECT DISTINCT query_id FROM etop) q2
      LEFT JOIN h USING (query_id)
      ORDER BY query_id"""

  /** The RP∘SQ8 composed-compression oracle chain through `ranked`:
    * md5-seeded projection, per-projected-dim min/max calibration,
    * uint8 encode/decode, asymmetric scan (full-precision projected
    * queries against the decoded projection), rerank cut, exact rerank.
    */
  private val rpSq8Ctes = s"""e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      proj AS (
        SELECT vec_id, p,
               SUM(v[CAST(i AS INT)] *
                   CASE WHEN substr(md5('rp:' || p || ':' || (i - 1)), 1, 1) < '8'
                        THEN 1.0 ELSE -1.0 END) AS pv
        FROM (SELECT vec_id, v, unnest(generate_series(1, 64)) AS i FROM e),
             (SELECT unnest(generate_series(0, 15)) AS p)
        GROUP BY 1, 2),
      cal AS (SELECT p, MIN(pv) AS lo, MAX(pv) AS hi FROM proj GROUP BY p),
      pdec AS (
        SELECT pr.vec_id, pr.p,
               c.lo + (CASE WHEN c.hi = c.lo THEN 0
                       ELSE FLOOR((pr.pv - c.lo) / (c.hi - c.lo) * 255.0 + 0.5) END)
                 * (c.hi - c.lo) / 255.0 AS dx
        FROM proj pr JOIN cal c ON c.p = pr.p),
      pdn AS (SELECT vec_id, SQRT(SUM(dx * dx)) AS n FROM pdec GROUP BY 1),
      qpn AS (SELECT vec_id, SQRT(SUM(pv * pv)) AS n FROM proj
              WHERE vec_id % 50 = 0 GROUP BY 1),
      aip AS (
        SELECT pq.vec_id AS query_id, pc.vec_id AS neighbor_id,
               SUM(pq.pv * pc.dx) AS ip
        FROM proj pq JOIN pdec pc USING (p)
        WHERE pq.vec_id % 50 = 0 AND pc.vec_id <> pq.vec_id
        GROUP BY 1, 2),
      cand AS (
        SELECT query_id, neighbor_id FROM (
          SELECT a.query_id, a.neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY a.query_id
                   ORDER BY a.ip / (nq.n * nc.n) DESC, a.neighbor_id) AS arank
          FROM aip a
          JOIN qpn nq ON nq.vec_id = a.query_id
          JOIN pdn nc ON nc.vec_id = a.neighbor_id)
        WHERE arank <= 20),
      pairs AS (
        SELECT c.query_id, c.neighbor_id, eq.v AS qv, ec.v AS cv
        FROM cand c
        JOIN e eq ON eq.vec_id = c.query_id
        JOIN e ec ON ec.vec_id = c.neighbor_id),
      $duckCos,
      ranked AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)"""

  /** Composed compression — project (RP, 64→16) THEN quantize (SQ8) —
    * the composition the rpTopK scaladoc promises: a 32× smaller at-rest
    * scan artifact (4× fewer dims × 8× narrower cells), exact-cosine
    * rerank repairing both error sources inside the rerank window. The
    * oracle replays the WHOLE composed cascade.
    */
  val embRpSq8TopK = Q(
    "emb_rp_sq8_topk",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.rpSq8TopK(emb, emb.filter(col("vec_id") % 50 === 0),
          k = 5, dProj = 16, rerank = 20)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $rpSq8Ctes
      SELECT query_id, neighbor_id, ROUND(cos, 3) AS cos, rank
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Recall@5 of the composed RP∘SQ8 cascade against the exact scan —
    * the quality gauge for the composition (verdict item #6).
    */
  val embRpSq8Recall = Q(
    "emb_rp_sq8_recall",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
      val approx = Similarity.rpSq8TopK(emb, queries, k = 5, dProj = 16,
        rerank = 20)
      Similarity.recallAtK(approx, Similarity.cosineTopK(emb, queries, 5), 5)
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH $rpSq8Ctes,${cosRecallTail(5)}"""),
    bench = false)

  /** Recall@5 of the plain RP cascade against the exact scan (verdict
    * item #7: every ANN family member carries its own recall gauge, so
    * a quantizer/projection regression is visible in the driver gate).
    */
  val embRpRecall = Q(
    "emb_rp_recall",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
      val approx = Similarity.rpTopK(emb, queries, k = 5, dProj = 16,
        rerank = 20)
      Similarity.recallAtK(approx, Similarity.cosineTopK(emb, queries, 5), 5)
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH $rpCtes,${cosRecallTail(5)}"""),
    bench = false)

  /** Recall@5 of the RP cascade at three rerank-window widths — the
    * quality/cost KNOB made measurable: JL noise at dProj=16 is not a
    * fixed loss but a window trade (wider window = one more narrow-row
    * rank pass over candidates, recall climbs toward 1.0). One uncut
    * approximate ranking and one exact ranking feed all three widths —
    * the sweep costs one extra candidate-rank pass, not three cascades.
    */
  val embRpRecallSweep = Q(
    "emb_rp_recall_sweep",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
      val exact = Similarity.cosineTopK(emb, queries, 5)
        .select(col("query_id"), col("neighbor_id"))
      val nq = queries.count()
      val pool = Similarity.rpCandidates(emb, queries, dProj = 16,
        window = 400).localCheckpoint()
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      Seq(20, 100, 400).map { w =>
        pool.filter(col("arank") <= w)
          .withColumn("_rk", row_number().over(wr))
          .filter(col("_rk") <= 5)
          .join(exact, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("hits"))
          .select(lit(w).as("rerank"), col("hits"),
            round(col("hits") / (lit(5.0) * nq), 4).as("recall"))
      }.reduce(_ unionByName _).orderBy(col("rerank"))
    },
    Some(s"""
      WITH $rpProjCtes,
      epairs AS (
        SELECT q.query_id, e2.vec_id AS neighbor_id,
               q.qv, e2.embedding::DOUBLE[] AS cv
        FROM embeddings e2,
             (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id % 50 = 0) q
        WHERE e2.vec_id <> q.query_id),
      ecomp AS (
        SELECT query_id, neighbor_id,
               SUM(qv[CAST(i AS INT)] * cv[CAST(i AS INT)])
                 / (SQRT(SUM(qv[CAST(i AS INT)] * qv[CAST(i AS INT)]))
                    * SQRT(SUM(cv[CAST(i AS INT)] * cv[CAST(i AS INT)]))) AS cos
        FROM (SELECT *, unnest(generate_series(1, 64)) AS i FROM epairs)
        GROUP BY 1, 2),
      etop AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rk
          FROM ecomp) WHERE rk <= 5),
      wins AS (SELECT UNNEST([20, 100, 400]) AS rerank),
      swcand AS (
        SELECT w.rerank, s.query_id, s.neighbor_id
        FROM scored s CROSS JOIN wins w WHERE s.arank <= w.rerank),
      rr AS (
        SELECT c.rerank, c.query_id, c.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY c.rerank, c.query_id
                 ORDER BY ec.cos DESC, c.neighbor_id) AS rk
        FROM swcand c JOIN ecomp ec USING (query_id, neighbor_id)),
      atop AS (
        SELECT rerank, query_id, neighbor_id FROM rr WHERE rk <= 5),
      h AS (
        SELECT a.rerank, COUNT(*) AS hits
        FROM atop a JOIN etop e3 USING (query_id, neighbor_id)
        GROUP BY 1),
      nq AS (SELECT COUNT(DISTINCT query_id) AS n FROM etop)
      SELECT w.rerank, CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
             ROUND(COALESCE(h.hits, 0) / (5.0 * nq.n), 4) AS recall
      FROM wins w LEFT JOIN h ON h.rerank = w.rerank CROSS JOIN nq
      ORDER BY w.rerank"""),
    bench = false)

  /** Recall@3 of the IVF probe path (nprobe=2 of 10 clusters) against
    * the exact scan — recall loss here is the pruning trade made
    * explicit, at the registry's own parameters.
    */
  val embIvfRecall = Q(
    "emb_ivf_recall",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          doubled(col("embedding")).as("embedding"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
      val approx = Similarity.ivfTopK(emb, queries, "label", k = 3,
        nprobe = 2)
      Similarity.recallAtK(approx, Similarity.cosineTopK(emb, queries, 3), 3)
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH $ivfCtes,${cosRecallTail(3)}"""),
    bench = false)

  /** Recall@10 of the PQ ADC scan against the exact INNER-PRODUCT top-10
    * — PQ's ADC score approximates the raw inner product (sum of
    * per-subspace codebook dots), so its gauge compares against that
    * metric, not cosine.
    */
  val embPqRecall = Q(
    "emb_pq_recall",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
      val books = Similarity.pqTrain(emb, dim = 64, nSub = 8, k = 8,
        iters = 2).cache()
      val codes = Similarity.pqEncode(emb, books, 64, 8)
      val approx = Similarity.pqSearch(codes, books, queries,
        dim = 64, nSub = 8, k = 8, topK = 10)
      Similarity.recallAtK(approx, Similarity.ipTopK(emb, queries, 10), 10)
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH $duckPqCode,
      sc AS (
        SELECT q.query_id, co.vec_id AS neighbor_id, SUM(q.dp) AS score
        FROM code co
        JOIN qdp q ON q.sub = co.sub AND q.label = co.label
        WHERE co.vec_id <> q.query_id
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM sc),
      eq4 AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id % 50 = 0),
      eip AS (
        SELECT eq4.query_id, e.vec_id AS neighbor_id,
               SUM(eq4.qv[CAST(i AS INT)] * e.v[CAST(i AS INT)]) AS score
        FROM e, eq4, (SELECT unnest(generate_series(1, 64)) AS i)
        WHERE e.vec_id <> eq4.query_id
        GROUP BY 1, 2),
      etop AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS rk
          FROM eip) WHERE rk <= 10),
      atop AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 10),
      h AS (
        SELECT a.query_id, COUNT(*) AS hits
        FROM atop a JOIN etop e3 USING (query_id, neighbor_id)
        GROUP BY 1)
      SELECT q2.query_id,
             CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
             ROUND(COALESCE(h.hits, 0) / 10.0, 4) AS recall
      FROM (SELECT DISTINCT query_id FROM etop) q2
      LEFT JOIN h USING (query_id)
      ORDER BY query_id"""),
    bench = false)

  /** MMR diverse retrieval (see [[Similarity.mmrTopK]]): top-12 cosine
    * candidates per query, then a 4-step greedy diversity cut at
    * lambda = 0.7. The oracle unrolls the greedy recurrence step by step
    * (the pagerank convention), with the identical rounded-objective +
    * id tie-break, so both engines pick the same sequence.
    */
  /** Shared greedy-MMR oracle tail: expects `cand(query_id, neighbor_id,
    * cos)` (the candidate cut) in scope; unrolls the 4-step lambda=0.7
    * greedy with the rounded objective + id tie-break and SELECTs the
    * picks. Shared by the brute-force and the indexed MMR rows, which
    * differ only in how `cand` is produced.
    */
  private val duckMmrGreedy = """cvecs AS (
        SELECT c.query_id, c.neighbor_id, e.embedding::DOUBLE[] AS v
        FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id),
      cp AS (
        SELECT query_id, ai, bi,
               SUM(av[CAST(i AS INT)] * bv[CAST(i AS INT)])
                 / (SQRT(SUM(av[CAST(i AS INT)] * av[CAST(i AS INT)]))
                    * SQRT(SUM(bv[CAST(i AS INT)] * bv[CAST(i AS INT)]))) AS s
        FROM (SELECT a.query_id, a.neighbor_id AS ai, b.neighbor_id AS bi,
                     a.v AS av, b.v AS bv,
                     unnest(generate_series(1, 64)) AS i
              FROM cvecs a JOIN cvecs b
                ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id)
        GROUP BY 1, 2, 3),
      s1 AS (
        SELECT query_id, neighbor_id, 0.7*cos AS obj FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ROUND(0.7*cos, 9) DESC, neighbor_id) AS rn
          FROM cand) WHERE rn = 1),
      gm2 AS (
        SELECT c.query_id, c.neighbor_id, c.cos, MAX(p.s) AS ms
        FROM cand c
        JOIN s1 ON c.query_id = s1.query_id AND c.neighbor_id <> s1.neighbor_id
        JOIN cp p ON p.query_id = c.query_id AND p.ai = c.neighbor_id
               AND p.bi = s1.neighbor_id
        GROUP BY 1, 2, 3),
      s2 AS (
        SELECT query_id, neighbor_id, 0.7*cos - 0.3*ms AS obj FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ROUND(0.7*cos - 0.3*ms, 9) DESC, neighbor_id) AS rn
          FROM gm2) WHERE rn = 1),
      sel2 AS (SELECT query_id, neighbor_id FROM s1
               UNION ALL SELECT query_id, neighbor_id FROM s2),
      gm3 AS (
        SELECT c.query_id, c.neighbor_id, c.cos, MAX(p.s) AS ms
        FROM cand c
        JOIN cp p ON p.query_id = c.query_id AND p.ai = c.neighbor_id
        JOIN sel2 s ON s.query_id = p.query_id AND s.neighbor_id = p.bi
        WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                          WHERE x.query_id = c.query_id
                            AND x.neighbor_id = c.neighbor_id)
        GROUP BY 1, 2, 3),
      s3 AS (
        SELECT query_id, neighbor_id, 0.7*cos - 0.3*ms AS obj FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ROUND(0.7*cos - 0.3*ms, 9) DESC, neighbor_id) AS rn
          FROM gm3) WHERE rn = 1),
      sel3 AS (SELECT * FROM sel2
               UNION ALL SELECT query_id, neighbor_id FROM s3),
      gm4 AS (
        SELECT c.query_id, c.neighbor_id, c.cos, MAX(p.s) AS ms
        FROM cand c
        JOIN cp p ON p.query_id = c.query_id AND p.ai = c.neighbor_id
        JOIN sel3 s ON s.query_id = p.query_id AND s.neighbor_id = p.bi
        WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                          WHERE x.query_id = c.query_id
                            AND x.neighbor_id = c.neighbor_id)
        GROUP BY 1, 2, 3),
      s4 AS (
        SELECT query_id, neighbor_id, 0.7*cos - 0.3*ms AS obj FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ROUND(0.7*cos - 0.3*ms, 9) DESC, neighbor_id) AS rn
          FROM gm4) WHERE rn = 1)
      SELECT query_id, 1 AS pick, neighbor_id, ROUND(obj, 4) AS mmr FROM s1
      UNION ALL
      SELECT query_id, 2, neighbor_id, ROUND(obj, 4) FROM s2
      UNION ALL
      SELECT query_id, 3, neighbor_id, ROUND(obj, 4) FROM s3
      UNION ALL
      SELECT query_id, 4, neighbor_id, ROUND(obj, 4) FROM s4
      ORDER BY query_id, pick"""

  val embMmrTopK = Q(
    "emb_mmr_topk",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      Similarity.mmrTopK(emb, emb.filter(col("vec_id") % 50 === 0),
        k = 4, lambda = 0.7, candN = 12)
        .select(col("query_id"), col("pick"), col("neighbor_id"),
          round(col("mmr"), 4).as("mmr"))
        .orderBy(col("query_id"), col("pick"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 50 = 0),
      pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, q.qv, e.embedding::DOUBLE[] AS cv
        FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      $duckCos,
      cand AS (
        SELECT query_id, neighbor_id, cos FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rn FROM comp)
        WHERE rn <= 12),
      $duckMmrGreedy"""))

  /** Hard-negative mining for contrastive training (the in-batch-negatives
    * upgrade every embedding-model pipeline ships): per anchor, the top-3
    * most-similar vectors with a DIFFERENT label — maximally confusing
    * negatives. Same distributed shape as [[Similarity.cosineTopK]]
    * (pre-computed norms, broadcast anchors, per-anchor window) with the
    * label inequality pushed into the pair filter BEFORE the ranking, so
    * the window never ranks what the contract excludes.
    */
  val embHardNegatives = Q(
    "emb_hard_negatives",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"),
          col("label"))
      val q = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("qv"),
          Similarity.norm(col("embedding")).as("qn"), col("label").as("ql"))
      val c = emb.select(col("vec_id").as("neg_id"),
        col("embedding").as("cv"), Similarity.norm(col("embedding")).as("cn"),
        col("label").as("cl"))
      val w = Window.partitionBy(col("anchor_id"))
        .orderBy(col("cos").desc, col("neg_id"))
      c.crossJoin(broadcast(q))
        .filter(col("cl") =!= col("ql"))
        .withColumn("cos",
          Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("anchor_id"), col("neg_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("anchor_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
        FROM embeddings WHERE vec_id % 50 = 0),
      pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, q.qv,
               e.embedding::DOUBLE[] AS cv
        FROM embeddings e, q WHERE e.label <> q.ql),
      $duckCos,
      ranked AS (
        SELECT query_id AS anchor_id, neighbor_id AS neg_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)
      SELECT anchor_id, neg_id, ROUND(cos, 3) AS cos, rank
      FROM ranked WHERE rank <= 3 ORDER BY anchor_id, rank"""))

  /** [[Similarity.hardNegativesIndexed]] — hard negatives THROUGH the
    * persisted IVF-PQ index: ADC top-30 candidates per anchor
    * (partition-pruned codes scan), label-inequality + exact-cosine top-3
    * over the cut. The oracle extends the persisted-index chain with the
    * label filter and exact re-rank, so the candidate cut AND the mining
    * semantics are both verified ("exact over the candidate cut", the
    * emb_pqindex_rerank convention). This is the scale path for
    * emb_hard_negatives: the anchors × corpus pair term becomes
    * anchors × 30.
    */
  val embHardNegativesIndexed = Q(
    "emb_hard_negatives_indexed",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"),
          col("label"))
      Similarity.hardNegativesIndexed(s, ensurePqFixture(s, d), emb,
        emb.filter(col("vec_id") % 50 === 0),
        dim = 64, nSub = 8, pqK = 8, negK = 3, candK = 30, nprobe = 2)
        .select(col("anchor_id"), col("neg_id"),
          round(col("cos"), 3).as("cos"), col("rank"))
        .orderBy(col("anchor_id"), col("rank"))
    },
    Some(s"""
      WITH $duckPqIndexChain,
      cands AS (
        SELECT query_id, neighbor_id FROM kranked WHERE rank <= 30),
      pairs AS (
        SELECT c.query_id, c.neighbor_id, qe2.v AS qv, ce.v AS cv
        FROM cands c
        JOIN e qe2 ON qe2.vec_id = c.query_id
        JOIN e ce ON ce.vec_id = c.neighbor_id
        JOIN embeddings ql ON ql.vec_id = c.query_id
        JOIN embeddings cl ON cl.vec_id = c.neighbor_id
        WHERE cl.label <> ql.label),
      $duckCos,
      hranked AS (
        SELECT query_id AS anchor_id, neighbor_id AS neg_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS INT) AS rank
        FROM comp)
      SELECT anchor_id, neg_id, ROUND(cos, 3) AS cos, rank
      FROM hranked WHERE rank <= 3 ORDER BY anchor_id, rank"""))

  /** [[Similarity.mmrRerank]] over an INDEXED candidate cut: exact-cosine
    * top-12 over the persisted IVF-PQ index's ADC top-30
    * ([[Similarity.searchPqIndexedRerank]]), then the same 4-step greedy
    * as emb_mmr_topk. The oracle composes the persisted-index chain, the
    * exact re-rank cut, and the shared greedy unroll — so the scale-path
    * MMR (no anchors × corpus pair term) is verified end to end.
    */
  val embMmrIndexed = Q(
    "emb_mmr_indexed",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val cands = Similarity.searchPqIndexedRerank(s, ensurePqFixture(s, d),
        emb, emb.filter(col("vec_id") % 50 === 0),
        dim = 64, nSub = 8, pqK = 8, topK = 12, rerankK = 30, nprobe = 2)
      Similarity.mmrRerank(cands, emb, k = 4, lambda = 0.7)
        .select(col("query_id"), col("pick"), col("neighbor_id"),
          round(col("mmr"), 4).as("mmr"))
        .orderBy(col("query_id"), col("pick"))
    },
    Some(s"""
      WITH $duckPqIndexChain,
      rcands AS (
        SELECT query_id, neighbor_id FROM kranked WHERE rank <= 30),
      pairs AS (
        SELECT c.query_id, c.neighbor_id, qe2.v AS qv, ce.v AS cv
        FROM rcands c
        JOIN e qe2 ON qe2.vec_id = c.query_id
        JOIN e ce ON ce.vec_id = c.neighbor_id),
      $duckCos,
      cand AS (
        SELECT query_id, neighbor_id, cos FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rn FROM comp)
        WHERE rn <= 12),
      $duckMmrGreedy"""))

  /** Diversity gauge for the MMR family (bench=false, the recall-gauge
    * convention): per query, the mean pairwise cosine among the 4 MMR
    * picks vs among the plain top-4 — the quantity MMR exists to lower.
    * A regression in the greedy (wrong lambda, broken tie-break, stale
    * candidates) shows up as mmr_red drifting up to topk_red. The oracle
    * replays both pick sets and averages the same candidate-pair sims.
    */
  val embMmrGauge = Q(
    "emb_mmr_diversity_gauge",
    (s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"))
      val queries = emb.filter(col("vec_id") % 50 === 0)
      def redundancy(picks: org.apache.spark.sql.DataFrame, out: String) = {
        val v = emb.select(col("vec_id"), col("embedding").as("v"))
        val a = picks.join(v, picks("neighbor_id") === v("vec_id"))
          .select(col("query_id"), col("neighbor_id").as("ai"), col("v").as("av"))
        val b = picks.join(v, picks("neighbor_id") === v("vec_id"))
          .select(col("query_id").as("qb"), col("neighbor_id").as("bi"),
            col("v").as("bv"))
        a.join(b, col("query_id") === col("qb") && col("ai") < col("bi"))
          .withColumn("s", Similarity.cosine(col("av"), col("bv")))
          .groupBy(col("query_id"))
          .agg(round(avg(col("s")), 4).as(out))
      }
      val mmr = Similarity.mmrTopK(emb, queries, k = 4, lambda = 0.7,
        candN = 12).select(col("query_id"), col("neighbor_id"))
      val top4 = Similarity.cosineTopK(emb, queries, 4)
        .select(col("query_id"), col("neighbor_id"))
      redundancy(mmr, "mmr_red")
        .join(redundancy(top4, "topk_red"), Seq("query_id"))
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id % 50 = 0),
      pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, q.qv, e.embedding::DOUBLE[] AS cv
        FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      $duckCos,
      cand AS (
        SELECT query_id, neighbor_id, cos FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rn FROM comp)
        WHERE rn <= 12),
      cvecs AS (
        SELECT c.query_id, c.neighbor_id, e.embedding::DOUBLE[] AS v
        FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id),
      cp AS (
        SELECT query_id, ai, bi,
               SUM(av[CAST(i AS INT)] * bv[CAST(i AS INT)])
                 / (SQRT(SUM(av[CAST(i AS INT)] * av[CAST(i AS INT)]))
                    * SQRT(SUM(bv[CAST(i AS INT)] * bv[CAST(i AS INT)]))) AS s
        FROM (SELECT a.query_id, a.neighbor_id AS ai, b.neighbor_id AS bi,
                     a.v AS av, b.v AS bv,
                     unnest(generate_series(1, 64)) AS i
              FROM cvecs a JOIN cvecs b
                ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id)
        GROUP BY 1, 2, 3),
      s1 AS (
        SELECT query_id, neighbor_id, 0.7*cos AS obj FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ROUND(0.7*cos, 9) DESC, neighbor_id) AS rn
          FROM cand) WHERE rn = 1),
      m2 AS (
        SELECT c.query_id, c.neighbor_id, c.cos, MAX(p.s) AS ms
        FROM cand c
        JOIN s1 ON c.query_id = s1.query_id AND c.neighbor_id <> s1.neighbor_id
        JOIN cp p ON p.query_id = c.query_id AND p.ai = c.neighbor_id
               AND p.bi = s1.neighbor_id
        GROUP BY 1, 2, 3),
      s2 AS (
        SELECT query_id, neighbor_id, 0.7*cos - 0.3*ms AS obj FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ROUND(0.7*cos - 0.3*ms, 9) DESC, neighbor_id) AS rn
          FROM m2) WHERE rn = 1),
      sel2 AS (SELECT query_id, neighbor_id FROM s1
               UNION ALL SELECT query_id, neighbor_id FROM s2),
      m3 AS (
        SELECT c.query_id, c.neighbor_id, c.cos, MAX(p.s) AS ms
        FROM cand c
        JOIN cp p ON p.query_id = c.query_id AND p.ai = c.neighbor_id
        JOIN sel2 s ON s.query_id = p.query_id AND s.neighbor_id = p.bi
        WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                          WHERE x.query_id = c.query_id
                            AND x.neighbor_id = c.neighbor_id)
        GROUP BY 1, 2, 3),
      s3 AS (
        SELECT query_id, neighbor_id, 0.7*cos - 0.3*ms AS obj FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ROUND(0.7*cos - 0.3*ms, 9) DESC, neighbor_id) AS rn
          FROM m3) WHERE rn = 1),
      sel3 AS (SELECT * FROM sel2
               UNION ALL SELECT query_id, neighbor_id FROM s3),
      m4 AS (
        SELECT c.query_id, c.neighbor_id, c.cos, MAX(p.s) AS ms
        FROM cand c
        JOIN cp p ON p.query_id = c.query_id AND p.ai = c.neighbor_id
        JOIN sel3 s ON s.query_id = p.query_id AND s.neighbor_id = p.bi
        WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                          WHERE x.query_id = c.query_id
                            AND x.neighbor_id = c.neighbor_id)
        GROUP BY 1, 2, 3),
      s4 AS (
        SELECT query_id, neighbor_id, 0.7*cos - 0.3*ms AS obj FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY ROUND(0.7*cos - 0.3*ms, 9) DESC, neighbor_id) AS rn
          FROM m4) WHERE rn = 1),
      mmrsel AS (
        SELECT query_id, neighbor_id FROM s1
        UNION ALL SELECT query_id, neighbor_id FROM s2
        UNION ALL SELECT query_id, neighbor_id FROM s3
        UNION ALL SELECT query_id, neighbor_id FROM s4),
      topsel AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rn FROM cand)
        WHERE rn <= 4),
      mred AS (
        SELECT p.query_id, ROUND(AVG(p.s), 4) AS mmr_red
        FROM cp p
        JOIN mmrsel a ON a.query_id = p.query_id AND a.neighbor_id = p.ai
        JOIN mmrsel b ON b.query_id = p.query_id AND b.neighbor_id = p.bi
        WHERE p.ai < p.bi GROUP BY 1),
      tred AS (
        SELECT p.query_id, ROUND(AVG(p.s), 4) AS topk_red
        FROM cp p
        JOIN topsel a ON a.query_id = p.query_id AND a.neighbor_id = p.ai
        JOIN topsel b ON b.query_id = p.query_id AND b.neighbor_id = p.bi
        WHERE p.ai < p.bi GROUP BY 1)
      SELECT m.query_id, m.mmr_red, t.topk_red
      FROM mred m JOIN tred t USING (query_id)
      ORDER BY query_id"""),
    bench = false)

  /** Quality gauge for the indexed hard-negative miner (bench=false): per
    * anchor, how many of the EXACT brute-force top-3 different-label
    * negatives the indexed miner recovered — recall@3 of the mining path,
    * exactly the emb_*_recall convention. A quantizer or probe regression
    * in the index shows up here as recall decay without any code read.
    */
  val embHardnegRecall = Q(
    "emb_hardneg_recall",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = T.embeddings(s, d)
        .select(col("vec_id"), doubled(col("embedding")).as("embedding"),
          col("label"))
      val anchors = emb.filter(col("vec_id") % 50 === 0)
      val approx = Similarity.hardNegativesIndexed(s, ensurePqFixture(s, d),
        emb, anchors, dim = 64, nSub = 8, pqK = 8, negK = 3, candK = 30,
        nprobe = 2).select(col("anchor_id"), col("neg_id"))
      // exact miner: brute-force different-label top-3 (the
      // emb_hard_negatives query's definition)
      val q = emb.select(col("vec_id").as("anchor_id"),
        col("embedding").as("qv"), Similarity.norm(col("embedding")).as("qn"),
        col("label").as("ql"))
        .filter(col("anchor_id") % 50 === 0)
      val c = emb.select(col("vec_id").as("neg_id"), col("embedding").as("cv"),
        Similarity.norm(col("embedding")).as("cn"), col("label").as("cl"))
      val w = Window.partitionBy(col("anchor_id"))
        .orderBy(col("cos").desc, col("neg_id"))
      val exact = c.crossJoin(broadcast(q))
        .filter(col("cl") =!= col("ql"))
        .withColumn("cos",
          Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("anchor_id"), col("neg_id"))
      val hits = approx.join(exact, Seq("anchor_id", "neg_id"))
        .groupBy(col("anchor_id")).agg(count(lit(1)).as("hits"))
      exact.select(col("anchor_id")).distinct()
        .join(hits, Seq("anchor_id"), "left")
        .select(col("anchor_id"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          round(coalesce(col("hits"), lit(0L)) / 3.0, 4).as("recall"))
        .orderBy(col("anchor_id"))
    },
    Some(s"""
      WITH $duckPqIndexChain,
      cands AS (
        SELECT query_id, neighbor_id FROM kranked WHERE rank <= 30),
      pairs AS (
        SELECT c.query_id, c.neighbor_id, qe2.v AS qv, ce.v AS cv
        FROM cands c
        JOIN e qe2 ON qe2.vec_id = c.query_id
        JOIN e ce ON ce.vec_id = c.neighbor_id
        JOIN embeddings ql ON ql.vec_id = c.query_id
        JOIN embeddings cl ON cl.vec_id = c.neighbor_id
        WHERE cl.label <> ql.label),
      $duckCos,
      atop AS (
        SELECT query_id AS anchor_id, neighbor_id AS neg_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rk FROM comp)
        WHERE rk <= 3),
      xpairs AS (
        SELECT q2.vec_id AS anchor_id, e2.vec_id AS neg_id,
               q2.v AS qv, e2.v AS cv
        FROM e q2
        JOIN embeddings ql2 ON ql2.vec_id = q2.vec_id
        JOIN e e2 ON e2.vec_id <> q2.vec_id
        JOIN embeddings cl2 ON cl2.vec_id = e2.vec_id
        WHERE q2.vec_id % 50 = 0 AND cl2.label <> ql2.label),
      xcomp AS (
        SELECT anchor_id, neg_id,
               SUM(qv[CAST(i AS INT)] * cv[CAST(i AS INT)]) AS score
        FROM (SELECT *, unnest(generate_series(1, 64)) AS i FROM xpairs)
        GROUP BY 1, 2),
      etop AS (
        SELECT anchor_id, neg_id FROM (
          SELECT anchor_id, neg_id,
                 ROW_NUMBER() OVER (PARTITION BY anchor_id
                   ORDER BY score DESC, neg_id) AS rk FROM xcomp)
        WHERE rk <= 3),
      h AS (
        SELECT a.anchor_id, COUNT(*) AS hits
        FROM atop a JOIN etop e3 USING (anchor_id, neg_id)
        GROUP BY 1)
      SELECT q4.anchor_id,
             CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
             ROUND(COALESCE(h.hits, 0) / 3.0, 4) AS recall
      FROM (SELECT DISTINCT anchor_id FROM etop) q4
      LEFT JOIN h USING (anchor_id)
      ORDER BY anchor_id"""),
    bench = false)

  def all: Seq[Q] =
    Seq(embCosineTopK, embIvfTopK, embNearDup, embKmeans, embSemDedup,
      embPqTopK, embIvfPqTopK, embAnnIndexSearch, embPqIndexSearch,
      embPqIndexRerank, embAnnProbe, embPqProbe, embPqRerankProbe,
      embHybridRrf, embAnnCompactedSearch, embAnnRebalancedSearch,
      embCovariance, embSq8TopK, embSq8Recall, embRpTopK, embPcaProject,
      embRpIndexSearch, embRpSq8TopK, embRpSq8Recall, embRpRecall,
      embRpRecallSweep,
      embIvfRecall, embPqRecall, embMmrTopK, embHardNegatives, embPcaWhiten,
      embHardNegativesIndexed, embMmrIndexed, embMmrGauge, embHardnegRecall)
}

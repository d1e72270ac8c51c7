package graft.ops

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Training-export + decontamination suite over the documents corpus, each
  * with a DuckDB mirror as correctness oracle. The md5-derived shard/order
  * values are engine-portable (same trick as the minhash family), so the
  * oracles check the actual shuffle, not just row counts.
  */
object TrainQueries {

  /** Portable 60-bit hash of doc_id, mod n — matches
    * TrainExport.assignShards. */
  private def duckShard(n: Int) =
    s"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % $n"

  private val duckTokens =
    "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)"

  val trainShards = Q(
    "train_shards",
    (s, d) => {
      TrainExport.assignShards(T.documents(s, d), "doc_id", 8)
        .withColumn("tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("total_tokens"))
        .orderBy(col("shard"))
    },
    Some(s"""
      WITH s AS (
        SELECT CAST(${duckShard(8)} AS INT) AS shard, $duckTokens AS tokens
        FROM documents)
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(tokens) AS BIGINT) AS total_tokens
      FROM s GROUP BY 1 ORDER BY 1"""))

  val trainPack = Q(
    "train_pack",
    (s, d) => {
      TrainExport.packContexts(T.documents(s, d), "doc_id", "text", 4, 512)
        .groupBy(col("shard"), col("ctx_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("ctx_tokens"))
        .orderBy(col("shard"), col("ctx_id"))
    },
    Some(s"""
      WITH s AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sort_key,
               CAST(${duckShard(4)} AS INT) AS shard, $duckTokens AS tokens
        FROM documents),
      c AS (
        SELECT shard,
               CAST((SUM(tokens) OVER (PARTITION BY shard
                                       ORDER BY sort_key, doc_id)
                     - tokens) // 512 AS BIGINT) AS ctx_id,
               tokens
        FROM s)
      SELECT shard, ctx_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(tokens) AS BIGINT) AS ctx_tokens
      FROM c GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Mixture balancing to target language shares. The oracle recomputes
    * the same double arithmetic (counts -> binding-group output size ->
    * per-group keep fraction -> md5-hash threshold); dividing the 60-bit
    * hash by 2^60 is exact IEEE scaling, so the kept row set is identical
    * across engines.
    */
  val trainMixture = Q(
    "train_mixture",
    (s, d) => {
      TrainExport.sampleToMixture(T.documents(s, d), "doc_id", "lang",
        Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.15,
          "zh" -> 0.05))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tv(lang, t) AS (
        VALUES ('en', CAST(0.4 AS DOUBLE)), ('de', CAST(0.2 AS DOUBLE)),
               ('es', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.15 AS DOUBLE)),
               ('zh', CAST(0.05 AS DOUBLE))),
      cnt AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents JOIN tv USING (lang) GROUP BY 1),
      mm AS (SELECT MIN(n / t) AS m FROM cnt JOIN tv USING (lang)),
      keep AS (
        SELECT lang, t * (SELECT m FROM mm) / n AS kf
        FROM cnt JOIN tv USING (lang))
      SELECT doc_id, lang
      FROM documents JOIN keep USING (lang)
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) * 1.0 / 1152921504606846976.0 < kf
      ORDER BY doc_id"""))

  /** Temperature (α = 0.5) mixture over source: flattens the natural
    * source distribution halfway to uniform, keeping the smallest source
    * in full. The oracle mirrors the EXACT float operation shapes
    * (pow(n, 0.5), the sorted-order z fold via list_sum, q·m/n) so every
    * keep fraction is bit-identical and the md5-threshold row set
    * matches.
    */
  val trainTemperatureMix = Q(
    "train_temperature_mix",
    (s, d) => {
      TrainExport.sampleTemperature(T.documents(s, d), "doc_id", "source",
        alpha = 0.5)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH cnt AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1),
      z AS (SELECT list_sum(list(pow(n, 0.5) ORDER BY source)) AS z
            FROM cnt),
      mm AS (SELECT MIN(z.z * pow(n, 0.5)) AS m FROM cnt, z),
      keep AS (
        SELECT source,
               LEAST(1.0, pow(n, 0.5) / z.z * (SELECT m FROM mm) / n) AS kf
        FROM cnt, z)
      SELECT doc_id, source
      FROM documents JOIN keep USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) * 1.0 / 1152921504606846976.0 < kf
      ORDER BY doc_id"""))

  val textDecontaminate = Q(
    "text_decontaminate",
    (s, d) => {
      Curate.decontaminate(T.documents(s, d), "doc_id", "text",
        col("doc_id") % 50 === 0, shingleSize = 3, minShared = 3)
        .select(col("id").as("doc_id"), col("n_shared"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents),
      shx AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM tok WHERE len(w) >= 3),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] || ' ' ||
               w[CAST(i AS INT) + 2] AS shingle
        FROM shx),
      eg AS (SELECT DISTINCT shingle FROM sh WHERE id % 50 = 0)
      SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sh JOIN eg USING (shingle)
      WHERE id % 50 <> 0
      GROUP BY 1 HAVING COUNT(*) >= 3
      ORDER BY doc_id"""))

  /** Sketch-path decontamination: Bloom prefilter + exact verify. The
    * output is exactly [[Curate.decontaminate]]'s (no false negatives;
    * false positives die in the verify join), so the oracle is the same
    * exact-overlap SQL — the sketch is a pure execution-strategy change,
    * and the hash compare proves it invisible. Distinct eval slice /
    * threshold from text_decontaminate so the rows differ.
    */
  val textDecontaminateBloom = Q(
    "text_decontaminate_bloom",
    (s, d) => {
      Curate.decontaminateBloom(T.documents(s, d), "doc_id", "text",
        col("doc_id") % 40 === 0, shingleSize = 3, minShared = 2)
        .select(col("id").as("doc_id"), col("n_shared"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents),
      shx AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM tok WHERE len(w) >= 3),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] || ' ' ||
               w[CAST(i AS INT) + 2] AS shingle
        FROM shx),
      eg AS (SELECT DISTINCT shingle FROM sh WHERE id % 40 = 0)
      SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sh JOIN eg USING (shingle)
      WHERE id % 40 <> 0
      GROUP BY 1 HAVING COUNT(*) >= 2
      ORDER BY doc_id"""))

  /** Contamination attribution: per (train doc, eval doc) shared-gram
    * counts — the audit report behind text_decontaminate's flags. Same
    * gram machinery; the eval side keeps its doc id.
    */
  val textDecontaminateWho = Q(
    "text_decontaminate_who",
    (s, d) => {
      Curate.decontaminateAttribution(T.documents(s, d), "doc_id", "text",
        col("doc_id") % 50 === 0, shingleSize = 3, minShared = 3)
        .select(col("id").as("doc_id"), col("eval_id"), col("n_shared"))
        .orderBy(col("doc_id"), col("eval_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents),
      shx AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM tok WHERE len(w) >= 3),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] || ' ' ||
               w[CAST(i AS INT) + 2] AS shingle
        FROM shx),
      eg AS (SELECT id AS eval_id, shingle FROM sh WHERE id % 50 = 0)
      SELECT s.id AS doc_id, eg.eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sh s JOIN eg USING (shingle)
      WHERE s.id % 50 <> 0
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
      ORDER BY doc_id, eval_id"""))

  /** Near-dup-aware train/eval split: the whole near-dup component lands
    * on one side (no eval doc with a training twin). The oracle replays
    * the LSH pair pipeline, the recursive-CTE transitive closure, and the
    * md5-threshold side pick on the cluster label.
    */
  val trainSplitCluster = Q(
    "train_split_cluster",
    (s, d) => {
      val docs = T.documents(s, d)
      val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 8, rowsPerBand = 2, threshold = 0.2)
      TrainExport.splitByComponent(docs, "doc_id", pairs, evalFrac = 0.1)
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.duckPairs},
      edges AS (
        SELECT a, b FROM pairsq UNION SELECT b AS a, a AS b FROM pairsq),
      reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      comp AS (
        SELECT n.a AS node, LEAST(n.a, MIN(r.b)) AS component
        FROM (SELECT DISTINCT a FROM edges) n
        JOIN reach r ON r.a = n.a GROUP BY n.a),
      lab AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
      SELECT doc_id, cluster,
             CASE WHEN CAST(('0x' || substr(md5('split:' ||
                            CAST(cluster AS VARCHAR)), 1, 15)) AS BIGINT)
                       * 1.0 / 1152921504606846976.0 < 0.1
                  THEN 'eval' ELSE 'train' END AS split
      FROM lab ORDER BY doc_id"""))

  /** Exact-k weighted sampling without replacement (Efraimidis–Spirakis
    * exponential keys), weight = n_chars: the quality-biased draw between
    * a hard top-k and a uniform sample. The oracle replays the identical
    * `ln((md5int + 0.5)/2^60)/w` key — selection is discrete, so the
    * float paths can only disagree if two keys collide to ~1 ulp.
    */
  val trainWeightedSample = Q(
    "train_weighted_sample",
    (s, d) => {
      TrainExport.weightedSample(T.documents(s, d), "doc_id",
        col("n_chars"), k = 100, seed = "42")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH s AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               ln((CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) + 0.5)
                  / 1152921504606846976.0) / n_chars AS k
        FROM documents WHERE n_chars > 0),
      top AS (SELECT doc_id, n_chars FROM s ORDER BY k DESC, doc_id LIMIT 100)
      SELECT doc_id, n_chars FROM top ORDER BY doc_id"""))

  /** Curriculum export: quartile phase by n_chars + deterministic
    * in-phase shuffled position. The oracle replays the exact-percentile
    * cuts (quantile_cont ≡ Spark percentile, the text_length_profile
    * parity) and the (phase, shard) position window.
    */
  val trainCurriculum = Q(
    "train_curriculum",
    (s, d) => {
      TrainExport.curriculumOrder(T.documents(s, d), "doc_id",
        col("n_chars"), phases = 4, nShards = 4)
        .select(col("doc_id"), col("phase"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH cuts AS (
        SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS c1,
               quantile_cont(CAST(n_chars AS DOUBLE), 0.5)  AS c2,
               quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS c3
        FROM documents),
      s AS (
        SELECT doc_id,
               CAST(CASE WHEN CAST(n_chars AS DOUBLE) > c3 THEN 3
                         WHEN CAST(n_chars AS DOUBLE) > c2 THEN 2
                         WHEN CAST(n_chars AS DOUBLE) > c1 THEN 1
                         ELSE 0 END AS INT) AS phase,
               CAST(${duckShard(4)} AS INT) AS shard,
               md5(CAST(doc_id AS VARCHAR)) AS sk
        FROM documents CROSS JOIN cuts)
      SELECT doc_id, phase, shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY phase, shard
                                     ORDER BY sk, doc_id) AS BIGINT) AS pos
      FROM s ORDER BY doc_id"""))

  /** Dataset card: the per-language + corpus-total summary a release ships
    * with (doc counts, exact-dup counts, source diversity, token totals,
    * mean length) in ONE pass — a digest-partition window for the dup
    * flag (the dedup_exact shuffle: narrow sha-256 keys, never raw-text
    * keys at the exchange) feeding a single Expand-based ROLLUP
    * aggregation; output is |langs| + 1 rows regardless of corpus size.
    */
  val trainDatasetCard = Q(
    "train_dataset_card",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val f = T.documents(s, d)
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy(sha2(col("text"), 256))))
        .withColumn("ws_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      f.rollup(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_same") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("ws_tokens")).as("total_tokens"),
          round(avg(col("n_chars")), 2).as("avg_chars"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          col("n_docs"), col("n_dup_docs"), col("n_sources"),
          col("total_tokens"), col("avg_chars"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH f AS (
        SELECT lang, source, n_chars,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS ws_tokens,
               COUNT(*) OVER (PARTITION BY sha256(text)) AS n_same
        FROM documents)
      SELECT COALESCE(lang, 'ALL') AS lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
             ROUND(AVG(n_chars), 2) AS avg_chars
      FROM f GROUP BY ROLLUP(lang) ORDER BY lang"""))

  /** The release composition the governance band was missing: each
    * curated corpus release publishes as a [[graft.sources.Versioned]]
    * SNAPSHOT via the exactly-once batch commit — release 1 (even ids)
    * then release 2 (odd ids), then release 1 is REDELIVERED and must
    * no-op (the query requires it, so the hash gate covers replay
    * safety). Time travel then reads BOTH release states: v1 = the first
    * release alone, v2 = the accumulated corpus. The oracle replays the
    * full curation cascade per release slice (scoped CTE chains) and
    * reconstructs each snapshot's aggregates from first principles.
    */
  val trainReleaseSnapshot = Q(
    "train_release_snapshot",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_rel").toString + "/t"
      val docs = T.documents(s, d)
      val cfg = Curate.Config(minTokens = 30, minStopwordRatio = 0.02,
        nearDupThreshold = 0.8)
      def release(rem: Int) =
        Curate.curate(docs.filter(col("doc_id") % 2 === rem), "doc_id",
          "text", cfg)
          .select(col("doc_id"),
            size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      // the two release cascades are independent corpus slices: compute
      // them CONCURRENTLY (guide §2.6) into materialized frames, then
      // commit in order — the versioned txn chain still sequences v1/v2,
      // but the expensive curation no longer serializes behind it
      val rel = new Array[org.apache.spark.sql.DataFrame](2)
      graft.Par.jobs(
        () => rel(0) = release(0).localCheckpoint(),
        () => rel(1) = release(1).localCheckpoint())
      require(graft.sources.Versioned
        .appendBatch(rel(0), dir, batchId = 0L).contains(1))
      require(graft.sources.Versioned
        .appendBatch(rel(1), dir, batchId = 1L).contains(2))
      // redelivery of release 0: exactly-once MUST make this a no-op —
      // a broken txn chain fails the require, not just the hash
      require(graft.sources.Versioned
        .appendBatch(rel(0), dir, batchId = 0L).isEmpty)
      def snap(v: Int) = graft.sources.Versioned.read(s, dir, Some(v))
        .agg(lit(v).as("version"), count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"))
        .select(col("version"), col("n_docs"), col("sum_tokens"))
      snap(1).unionAll(snap(2)).orderBy(col("version"))
    },
    Some {
      def slice(rem: Int) =
        "SELECT doc_id, n_tokens FROM (WITH " +
          TextQueries.duckCurateChain.replace("FROM documents",
            s"FROM (SELECT * FROM documents WHERE doc_id % 2 = $rem)") +
          """
        SELECT k.doc_id, k.n_tokens
        FROM kept2 k LEFT JOIN losers l ON l.b = k.doc_id
        WHERE l.b IS NULL)"""
      s"""
      WITH ke AS (${slice(0)}),
      ko AS (${slice(1)})
      SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      FROM ke
      UNION ALL
      SELECT 2,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ke)
               + CAST(COUNT(*) AS BIGINT),
             (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM ke)
               + CAST(SUM(n_tokens) AS BIGINT)
      FROM ko
      ORDER BY version"""
    })

  /** Cross-release diff card — the "what changed since the last corpus
    * release" audit: two FULL re-releases publish as overwrite commits
    * ([[graft.sources.Versioned.replace]] — release 2 tightens the
    * quality gate), then time travel reads both states and a full-outer
    * join classifies every doc added / removed / kept with token deltas.
    * 'added' under a STRICTER gate is the subtle case the audit exists
    * for: removing a near-dup's dominating keeper can resurrect its
    * loser — the oracle replays both cascades and must agree.
    */
  val trainReleaseDiff = Q(
    "train_release_diff",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_reldiff").toString + "/t"
      val docs = T.documents(s, d)
      def release(minTok: Int) =
        Curate.curate(docs, "doc_id", "text",
          Curate.Config(minTokens = minTok, minStopwordRatio = 0.02,
            nearDupThreshold = 0.8))
          .select(col("doc_id"),
            size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      graft.sources.Versioned.replace(release(30), dir)
      graft.sources.Versioned.replace(release(40), dir)
      val r1 = graft.sources.Versioned.read(s, dir, Some(1))
        .select(col("doc_id"), col("n_tokens").as("t1"))
      val r2 = graft.sources.Versioned.read(s, dir, Some(2))
        .select(col("doc_id"), col("n_tokens").as("t2"))
      r1.join(r2, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("t1").isNull, "added")
            .when(col("t2").isNull, "removed").otherwise("kept"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("t2"), col("t1"))).as("sum_tokens"))
        .orderBy(col("status"))
    },
    Some {
      def rel(minTok: Int) =
        "(WITH " + TextQueries.duckCurateChain
          .replace("n_tokens >= 30", s"n_tokens >= $minTok") +
          """
        SELECT k.doc_id, CAST(k.n_tokens AS BIGINT) AS n_tokens
        FROM kept2 k LEFT JOIN losers l ON l.b = k.doc_id
        WHERE l.b IS NULL)"""
      s"""
      WITH r1 AS (SELECT * FROM ${rel(30)}),
      r2 AS (SELECT * FROM ${rel(40)}),
      j AS (
        SELECT CASE WHEN r1.doc_id IS NULL THEN 'added'
                    WHEN r2.doc_id IS NULL THEN 'removed'
                    ELSE 'kept' END AS status,
               COALESCE(r2.n_tokens, r1.n_tokens) AS t
        FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id)
      SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(t) AS BIGINT) AS sum_tokens
      FROM j GROUP BY 1 ORDER BY status"""
    },
    // correctness-gated only: its cost is two full curation cascades,
    // both already regression-tracked by the benched curate rows
    bench = false)

  /** The STORAGE-level release diff: the same two re-releases as
    * train_release_diff, but the row deltas come from
    * [[graft.sources.Versioned.changesBetween]] — the change-data-feed
    * read over the actual published snapshots (manifest-derived, no
    * logical join of the releases) — and must agree with the oracle's
    * from-first-principles EXCEPT-ALL replay of both cascades. Kept
    * docs (identical rows) cancel out of the feed by construction.
    */
  val trainReleaseCdf = Q(
    "train_release_cdf",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_relcdf").toString + "/t"
      val docs = T.documents(s, d)
      def release(minTok: Int) =
        Curate.curate(docs, "doc_id", "text",
          Curate.Config(minTokens = minTok, minStopwordRatio = 0.02,
            nearDupThreshold = 0.8))
          .select(col("doc_id"),
            size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      graft.sources.Versioned.replace(release(30), dir)
      graft.sources.Versioned.replace(release(40), dir)
      graft.sources.Versioned.changesBetween(s, dir, 1, 2)
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"))
        .orderBy(col("_change_type"))
    },
    Some {
      def rel(minTok: Int) =
        "(WITH " + TextQueries.duckCurateChain
          .replace("n_tokens >= 30", s"n_tokens >= $minTok") +
          """
        SELECT k.doc_id, CAST(k.n_tokens AS BIGINT) AS n_tokens
        FROM kept2 k LEFT JOIN losers l ON l.b = k.doc_id
        WHERE l.b IS NULL)"""
      s"""
      WITH r1 AS (SELECT * FROM ${rel(30)}),
      r2 AS (SELECT * FROM ${rel(40)}),
      ins AS (SELECT doc_id, n_tokens FROM r2
              EXCEPT ALL SELECT doc_id, n_tokens FROM r1),
      del AS (SELECT doc_id, n_tokens FROM r1
              EXCEPT ALL SELECT doc_id, n_tokens FROM r2)
      SELECT 'delete' AS _change_type, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      FROM del HAVING COUNT(*) > 0
      UNION ALL
      SELECT 'insert', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(n_tokens) AS BIGINT)
      FROM ins HAVING COUNT(*) > 0
      ORDER BY _change_type"""
    },
    // correctness-gated only, like train_release_diff (two cascades)
    bench = false)

  def all: Seq[Q] = Seq(trainShards, trainPack, trainMixture,
    textDecontaminate, textDecontaminateBloom, textDecontaminateWho,
    trainSplitCluster, trainWeightedSample, trainCurriculum,
    trainTemperatureMix, trainDatasetCard, trainReleaseSnapshot,
    trainReleaseDiff, trainReleaseCdf)
}

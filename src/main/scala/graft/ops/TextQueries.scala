package graft.ops

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Text-analysis operator suite over the documents corpus. */
object TextQueries {

  val textQuality = Q(
    "text_quality",
    (s, d) => {
      // the composite `quality` stays library-side only: its weighted sum
      // lands on exact .00005 boundaries where Spark/DuckDB rounding differ
      TextAnalysis.qualityFeatures(T.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          round(col("mean_tok_len"), 4).as("mean_tok_len"),
          round(col("stopword_ratio"), 4).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
               len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x = 'the'))
                 + len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x = 'a'))
                 + len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x = 'of'))
                 + len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x = 'and'))
                 + len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x = 'is'))
                 + len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x = 'to'))
                 + len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x = 'in'))
                 AS stop_hits,
               length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS n_punct
        FROM documents)
      SELECT doc_id, n_chars, n_tokens,
             ROUND(n_chars * 1.0 / n_tokens, 4) AS mean_tok_len,
             ROUND(stop_hits * 1.0 / n_tokens, 4) AS stopword_ratio
      FROM f ORDER BY doc_id"""))

  val textLangId = Q(
    "text_langid",
    (s, d) => {
      T.documents(s, d)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH f AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
      sc AS (
        SELECT doc_id,
          len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'a'))
            + len(list_filter(w, x -> x = 'of')) + len(list_filter(w, x -> x = 'and'))
            + len(list_filter(w, x -> x = 'is')) AS s_en,
          len(list_filter(w, x -> x = 'der')) + len(list_filter(w, x -> x = 'die'))
            + len(list_filter(w, x -> x = 'das')) + len(list_filter(w, x -> x = 'und'))
            + len(list_filter(w, x -> x = 'ist')) AS s_de,
          len(list_filter(w, x -> x = 'le')) + len(list_filter(w, x -> x = 'la'))
            + len(list_filter(w, x -> x = 'les')) + len(list_filter(w, x -> x = 'et'))
            + len(list_filter(w, x -> x = 'est')) AS s_fr,
          len(list_filter(w, x -> x = 'el')) + len(list_filter(w, x -> x = 'los'))
            + len(list_filter(w, x -> x = 'las')) + len(list_filter(w, x -> x = 'y'))
            + len(list_filter(w, x -> x = 'es')) AS s_es
        FROM f)
      SELECT doc_id,
             CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_es > GREATEST(s_en, s_de, s_fr) THEN 'es'
                  WHEN s_fr > GREATEST(s_en, s_de) THEN 'fr'
                  WHEN s_de > s_en THEN 'de'
                  ELSE 'en' END AS lang_pred
      FROM sc ORDER BY doc_id"""))

  val textTokenCount = Q(
    "text_token_count",
    (s, d) => {
      TextAnalysis.tokenCounts(T.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens").cast("long").as("ws_tokens"),
          col("bpe_ish_tokens").cast("long").as("bpe_ish_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                  AS BIGINT) AS bpe_ish_tokens
      FROM documents ORDER BY doc_id"""))

  val textFingerprint = Q(
    "text_fingerprint",
    (s, d) => {
      T.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               regexp_split_to_array(lower(text), '\s+'))), ' ')) AS fp
      FROM documents ORDER BY doc_id"""))

  val textScrub = Q(
    "text_scrub",
    (s, d) => {
      TextAnalysis.scrub(T.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("n_urls").cast("long").as("n_urls"),
          col("n_emails").cast("long").as("n_emails"), col("clean_text"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, 'https?://\S+')) AS BIGINT) AS n_urls,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             trim(regexp_replace(regexp_replace(regexp_replace(text,
               'https?://\S+', ' ', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
               '\s+', ' ', 'g')) AS clean_text
      FROM documents ORDER BY doc_id"""))

  /** Deterministic stratified sampling: strata = doc_id % 5 with rates
    * 10/20/30/40/50 pct; the md5 hash bucket makes the pick reproducible
    * across engines (the oracle selects the same rows).
    */
  val textSampleStratified = Q(
    "text_sample_stratified",
    (s, d) => {
      val stratum = col("doc_id") % 5
      val rate = (stratum + 1) * 10
      TextAnalysis.sampleStratified(T.documents(s, d), "doc_id", rate)
        .select(col("doc_id"), stratum.cast("long").as("stratum"),
          TextAnalysis.hashBucket(col("doc_id")).as("bucket"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH h AS (
        SELECT doc_id, doc_id % 5 AS stratum,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 100 AS bucket
        FROM documents)
      SELECT doc_id, stratum, bucket FROM h
      WHERE bucket < (stratum + 1) * 10
      ORDER BY doc_id"""))

  val textIdf = Q(
    "text_idf",
    (s, d) => {
      val docs = T.documents(s, d)
      val n = docs.count()
      TextAnalysis.idfTable(docs, "doc_id", "text", n)
        .select(col("token"), col("df").cast("long").as("df"),
          round(col("idf"), 4).as("idf"))
        .orderBy(col("token"))
    },
    Some("""
      WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        FROM documents),
      agg AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        FROM tok WHERE length(token) > 0 GROUP BY 1)
      SELECT token, df,
             ROUND(LN((SELECT COUNT(*) FROM documents) * 1.0 / df), 4) AS idf
      FROM agg ORDER BY token"""))

  /** TF-IDF related docs (see [[TextAnalysis.tfidfRelated]]): top-3
    * lexical neighbors per doc over the df-capped term space (df <= 50 —
    * the hot-term guard that keeps the term self-join linear).
    */
  val textTfidfRelated = Q(
    "text_tfidf_related",
    (s, d) => {
      val docs = T.documents(s, d)
      val n = docs.count()
      // two-part cap: the RELATIVE term (10% of the corpus — at sf0.01's
      // 500 docs this is the oracle's literal 50) defines "hot = no idf
      // signal" on small corpora, while the ABSOLUTE 500 is the fan-out
      // guard — the pair join emits df² rows PER TERM, and only an
      // absolute bound keeps that quadratic term capped as N grows
      TextAnalysis.tfidfRelated(docs, "doc_id", "text", n,
        k = 3, dfCap = math.min(n / 10, 500L))
        .select(col("doc_id"), col("related_id"),
          round(col("cos"), 4).as("cos"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents)
        WHERE length(token) > 0 GROUP BY 1, 2),
      dft AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY 1),
      w AS (
        SELECT t.doc_id, t.token,
               t.tf * LN((SELECT COUNT(*) FROM documents) * 1.0 / dft.df) AS w
        FROM tok t JOIN dft ON t.token = dft.token
        WHERE dft.df <= LEAST((SELECT COUNT(*) // 10 FROM documents), 500)),
      nrm AS (SELECT doc_id, SQRT(SUM(w*w)) AS n FROM w GROUP BY 1),
      dots AS (
        SELECT a.doc_id AS a, b.doc_id AS b, SUM(a.w * b.w) AS dot
        FROM w a JOIN w b ON a.token = b.token AND a.doc_id <> b.doc_id
        GROUP BY 1, 2),
      cosed AS (
        SELECT d.a, d.b, d.dot / (na.n * nb.n) AS cos
        FROM dots d JOIN nrm na ON na.doc_id = d.a
                    JOIN nrm nb ON nb.doc_id = d.b),
      ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY a
                  ORDER BY ROUND(cos, 9) DESC, b) AS INT) AS rank
        FROM cosed)
      SELECT a AS doc_id, b AS related_id, ROUND(cos, 4) AS cos, rank
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** Feature-hashing vectorizer (see [[TextAnalysis.hashEmbed]]): the
    * sparse (doc, bucket, w) table at d = 12. The oracle reproduces the
    * md5 bucket/sign derivation with strpos digit arithmetic — engine
    * functions differ, the math is identical.
    */
  val textHashEmbed = Q(
    "text_hash_embed",
    (s, d) => {
      TextAnalysis.hashEmbed(T.documents(s, d), "doc_id", "text", d = 12)
        .select(col("doc_id"), col("bucket"),
          col("w").cast("long").as("w"))
        .orderBy(col("doc_id"), col("bucket"))
    },
    Some("""
      WITH tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM documents)
        WHERE length(token) > 0 GROUP BY 1, 2),
      hx AS (SELECT doc_id, tf, md5(token) AS h FROM tf),
      hv AS (
        SELECT doc_id, tf, h,
               (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
             + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) AS hv
        FROM hx)
      SELECT doc_id, hv % 12 AS bucket,
             CAST(SUM(CASE WHEN substr(h, 5, 1) < '8' THEN tf ELSE -tf END)
                  AS BIGINT) AS w
      FROM hv GROUP BY 1, 2 ORDER BY doc_id, bucket"""))

  /** Shared DuckDB CTE chain replaying the full curation cascade at
    * minTokens=30, stopword 0.02, threshold 0.8: quality gate (`kept1`),
    * exact dedup (`kept2`), LSH candidates + exact-Jaccard losers
    * (`losers`). Callers prefix `WITH ` and select from kept1/kept2/losers.
    */
  private[ops] val duckCurateChain = """tok0 AS (
        SELECT doc_id, text,
               regexp_split_to_array(text, '\s+') AS w,
               regexp_split_to_array(lower(text), '\s+') AS wl
        FROM documents),
      qual AS (
        SELECT doc_id, text, len(w) AS n_tokens,
               len(list_filter(wl, x -> x = 'the'))
                 + len(list_filter(wl, x -> x = 'a'))
                 + len(list_filter(wl, x -> x = 'of'))
                 + len(list_filter(wl, x -> x = 'and'))
                 + len(list_filter(wl, x -> x = 'is'))
                 + len(list_filter(wl, x -> x = 'to'))
                 + len(list_filter(wl, x -> x = 'in')) AS stop_hits
        FROM tok0),
      kept1 AS (
        SELECT doc_id, text, n_tokens FROM qual
        WHERE n_tokens >= 30 AND stop_hits * 1.0 / n_tokens >= 0.02),
      kept2 AS (
        SELECT k.doc_id, k.text, k.n_tokens FROM kept1 k
        JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keeper
              FROM kept1 GROUP BY 1) e ON e.keeper = k.doc_id),
      t2 AS (
        SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM kept2),
      shx AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM t2 WHERE len(w) >= 2),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS shingle
        FROM shx),
      seeds AS (SELECT unnest(generate_series(1, 8)) AS seed),
      mh AS (
        SELECT id, seed,
               MIN(substr(md5(((seed - 1) // 4) || ':' || shingle),
                          CAST(((seed - 1) % 4) * 8 + 1 AS INT), 8)) AS minhash
        FROM sh, seeds GROUP BY 1, 2),
      banded AS (
        SELECT id, CAST((seed - 1) // 2 AS INT) AS band,
               md5(string_agg(seed || ':' || minhash, '|'
                              ORDER BY seed || ':' || minhash)) AS bucket
        FROM mh GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT l.id AS a, r.id AS b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
      sizes AS (SELECT id, COUNT(*) AS setsize FROM sh GROUP BY 1),
      common AS (
        SELECT c.a, c.b, COUNT(*) AS ncommon
        FROM cand c
        JOIN sh sa ON sa.id = c.a
        JOIN sh sb ON sb.id = c.b AND sb.shingle = sa.shingle
        GROUP BY 1, 2),
      losers AS (
        SELECT DISTINCT c.b
        FROM common c
        JOIN sizes za ON za.id = c.a
        JOIN sizes zb ON zb.id = c.b
        WHERE c.ncommon * 1.0 / (za.setsize + zb.setsize - c.ncommon) >= 0.8)"""

  /** The full curation cascade (quality gate -> exact dedup -> LSH near-dup
    * removal) hash-checked end to end: the oracle replays every stage in
    * SQL over the same corpus.
    */
  val textCurate = Q(
    "text_curate",
    (s, d) => {
      val cfg = Curate.Config(minTokens = 30, minStopwordRatio = 0.02,
        nearDupThreshold = 0.8)
      Curate.curate(T.documents(s, d), "doc_id", "text", cfg)
        .select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $duckCurateChain
      SELECT k.doc_id, CAST(k.n_tokens AS BIGINT) AS n_tokens
      FROM kept2 k LEFT JOIN losers l ON l.b = k.doc_id
      WHERE l.b IS NULL ORDER BY doc_id"""))

  /** The cascade's funnel telemetry: one row per stage with the count
    * surviving it. The oracle replays the same chain and unions scalar
    * counts — so the per-stage shrink itself is verified, not only the
    * final kept set.
    */
  /** The release composition: the dataset card computed over the CURATED
    * keepers (quality gate → exact dedup → LSH near-dup) — what actually
    * ships with a corpus release. The card's n_dup_docs column doubles as
    * an end-to-end assertion: on a post-exact-dedup set it must be 0 in
    * every language row, and the oracle proves it from first principles
    * by replaying the whole cascade before the ROLLUP.
    */
  val textCuratedCard = Q(
    "text_curated_card",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cfg = Curate.Config(minTokens = 30, minStopwordRatio = 0.02,
        nearDupThreshold = 0.8)
      val keptIds = Curate.curate(T.documents(s, d), "doc_id", "text", cfg)
        .select("doc_id")
      val f = T.documents(s, d).join(keptIds, Seq("doc_id"))
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
    Some(s"""
      WITH $duckCurateChain,
      keptf AS (
        SELECT d.lang, d.source, d.n_chars, d.text
        FROM documents d
        JOIN kept2 k ON k.doc_id = d.doc_id
        LEFT JOIN losers l ON l.b = d.doc_id
        WHERE l.b IS NULL),
      f AS (
        SELECT lang, source, n_chars,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                 AS ws_tokens,
               COUNT(*) OVER (PARTITION BY sha256(text)) AS n_same
        FROM keptf)
      SELECT COALESCE(lang, 'ALL') AS lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
             ROUND(AVG(n_chars), 2) AS avg_chars
      FROM f GROUP BY ROLLUP(lang) ORDER BY lang"""))

  val textCurateReport = Q(
    "text_curate_report",
    (s, d) => {
      val cfg = Curate.Config(minTokens = 30, minStopwordRatio = 0.02,
        nearDupThreshold = 0.8)
      Curate.curateReport(T.documents(s, d), "doc_id", "text", cfg)
        .orderBy(col("stage"))
    },
    Some(s"""
      WITH $duckCurateChain
      SELECT * FROM (
        SELECT '0_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        UNION ALL
        SELECT '1_quality', CAST(COUNT(*) AS BIGINT) FROM kept1
        UNION ALL
        SELECT '2_exact_dedup', CAST(COUNT(*) AS BIGINT) FROM kept2
        UNION ALL
        SELECT '3_near_dup', CAST(COUNT(*) AS BIGINT)
        FROM kept2 k LEFT JOIN losers l ON l.b = k.doc_id
        WHERE l.b IS NULL)
      ORDER BY stage"""))

  /** The scale-path cascade: same quality gate and exact dedup, but the
    * near-dup verify is minhash-signature agreement
    * (Config.estimatedVerify) instead of exact Jaccard over shingle sets —
    * no corpus-wide shingle re-join (BASELINE.md §e measured the exact
    * verify as this cascade's linear-boundary stage). The oracle swaps the
    * common/sizes CTEs for the per-seed agreement count.
    */
  val textCurateEst = Q(
    "text_curate_est",
    (s, d) => {
      val cfg = Curate.Config(minTokens = 30, minStopwordRatio = 0.02,
        nearDupThreshold = 0.5, estimatedVerify = true)
      Curate.curate(T.documents(s, d), "doc_id", "text", cfg)
        .select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tok0 AS (
        SELECT doc_id, text,
               regexp_split_to_array(text, '\s+') AS w,
               regexp_split_to_array(lower(text), '\s+') AS wl
        FROM documents),
      qual AS (
        SELECT doc_id, text, len(w) AS n_tokens,
               len(list_filter(wl, x -> x = 'the'))
                 + len(list_filter(wl, x -> x = 'a'))
                 + len(list_filter(wl, x -> x = 'of'))
                 + len(list_filter(wl, x -> x = 'and'))
                 + len(list_filter(wl, x -> x = 'is'))
                 + len(list_filter(wl, x -> x = 'to'))
                 + len(list_filter(wl, x -> x = 'in')) AS stop_hits
        FROM tok0),
      kept1 AS (
        SELECT doc_id, text, n_tokens FROM qual
        WHERE n_tokens >= 30 AND stop_hits * 1.0 / n_tokens >= 0.02),
      kept2 AS (
        SELECT k.doc_id, k.text, k.n_tokens FROM kept1 k
        JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keeper
              FROM kept1 GROUP BY 1) e ON e.keeper = k.doc_id),
      t2 AS (
        SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM kept2),
      shx AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM t2 WHERE len(w) >= 2),
      sh AS (
        SELECT DISTINCT doc_id AS id,
               w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS shingle
        FROM shx),
      seeds AS (SELECT unnest(generate_series(1, 8)) AS seed),
      mh AS (
        SELECT id, seed,
               MIN(substr(md5(((seed - 1) // 4) || ':' || shingle),
                          CAST(((seed - 1) % 4) * 8 + 1 AS INT), 8)) AS minhash
        FROM sh, seeds GROUP BY 1, 2),
      banded AS (
        SELECT id, CAST((seed - 1) // 2 AS INT) AS band,
               md5(string_agg(seed || ':' || minhash, '|'
                              ORDER BY seed || ':' || minhash)) AS bucket
        FROM mh GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT l.id AS a, r.id AS b
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
      est AS (
        SELECT c.a, c.b,
               SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END)
                 * 1.0 / 8 AS ej
        FROM cand c
        JOIN mh ma ON ma.id = c.a
        JOIN mh mb ON mb.id = c.b AND mb.seed = ma.seed
        GROUP BY 1, 2),
      losers AS (SELECT DISTINCT b FROM est WHERE ej >= 0.5)
      SELECT k.doc_id, CAST(k.n_tokens AS BIGINT) AS n_tokens
      FROM kept2 k LEFT JOIN losers l ON l.b = k.doc_id
      WHERE l.b IS NULL ORDER BY doc_id"""))

  /** Per-source token-length percentiles: Spark's exact `percentile` and
    * DuckDB's `quantile_cont` share the (n-1)·p linear interpolation, so
    * the profile hash-matches exactly.
    */
  val textLengthProfile = Q(
    "text_length_profile",
    (s, d) => {
      TextAnalysis.lengthProfile(T.documents(s, d), "text", "source")
        .select(col("source"), col("n_docs"),
          round(col("p50"), 4).as("p50"), round(col("p90"), 4).as("p90"),
          round(col("p99"), 4).as("p99"))
        .orderBy(col("source"))
    },
    Some("""
      WITH t AS (
        SELECT source,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
        FROM documents)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             ROUND(quantile_cont(n_tokens, 0.5), 4) AS p50,
             ROUND(quantile_cont(n_tokens, 0.9), 4) AS p90,
             ROUND(quantile_cont(n_tokens, 0.99), 4) AS p99
      FROM t GROUP BY source ORDER BY source"""))

  /** BM25 top-k retrieval (Lucene idf form): the oracle replays tf, df,
    * doc-length normalization, and the scoring sum, with the same
    * (score DESC, doc_id) tie-break before the LIMIT.
    */
  val textBm25 = Q(
    "text_bm25",
    (s, d) => {
      TextAnalysis.bm25(T.documents(s, d), "doc_id", "text",
        Seq("hash", "join", "vector"), k1 = 1.2, b = 0.75, topK = 20)
        .select(col("id").as("doc_id"), round(col("score"), 4).as("score"),
          col("n_matched"))
        .orderBy(col("score").desc, col("doc_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id AS id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        FROM documents),
      t AS (SELECT id, tok FROM tok WHERE length(tok) > 0),
      dl AS (SELECT id, COUNT(*) AS dl FROM t GROUP BY 1),
      stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
      tf AS (SELECT id, tok, COUNT(*) AS tf FROM t
             WHERE tok IN ('hash', 'join', 'vector') GROUP BY 1, 2),
      dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      sc AS (
        SELECT tf.id,
               SUM(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                   * (tf.tf * (1.2 + 1))
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
                 AS score,
               CAST(COUNT(*) AS BIGINT) AS n_matched
        FROM tf JOIN dfq USING (tok) JOIN dl USING (id), stats s
        GROUP BY 1)
      SELECT id AS doc_id, ROUND(score, 4) AS score, n_matched
      FROM sc ORDER BY score DESC, doc_id LIMIT 20"""))

  /** Persisted-inverted-index BM25: build on 90% of the corpus, append
    * the rest, search the STORED artifact (partition-pruned posting
    * fetch). The oracle scores the full corpus directly — the index
    * round trip, the append fold, and the delta-row stats must be
    * invisible. Different terms from text_bm25 so the rows differ.
    */
  val textBm25Indexed = Q(
    "text_bm25_indexed",
    (s, d) => {
      val docs = T.documents(s, d)
      val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
      TextAnalysis.buildBm25Index(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", dir, nBuckets = 64)
      TextAnalysis.appendToBm25Index(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", dir)
      TextAnalysis.searchBm25Indexed(s, dir, Seq("scan", "merge", "batch"),
        k1 = 1.2, b = 0.75, topK = 20)
        .select(col("id").as("doc_id"), round(col("score"), 4).as("score"),
          col("n_matched"))
        .orderBy(col("score").desc, col("doc_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id AS id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        FROM documents),
      t AS (SELECT id, tok FROM tok WHERE length(tok) > 0),
      dl AS (SELECT id, COUNT(*) AS dl FROM t GROUP BY 1),
      stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
      tf AS (SELECT id, tok, COUNT(*) AS tf FROM t
             WHERE tok IN ('scan', 'merge', 'batch') GROUP BY 1, 2),
      dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      sc AS (
        SELECT tf.id,
               SUM(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                   * (tf.tf * (1.2 + 1))
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
                 AS score,
               CAST(COUNT(*) AS BIGINT) AS n_matched
        FROM tf JOIN dfq USING (tok) JOIN dl USING (id), stats s
        GROUP BY 1)
      SELECT id AS doc_id, ROUND(score, 4) AS score, n_matched
      FROM sc ORDER BY score DESC, doc_id LIMIT 20"""))

  /** Winnowing rolling-hash fingerprints (MOSS): the oracle recomputes each
    * gram's polynomial hash directly (precomputed powers of 257 mod 2^31-1,
    * so sums stay in int64) and replays the per-window (hash, pos) argmin.
    */
  val textWinnow = Q(
    "text_winnow",
    (s, d) => {
      T.documents(s, d)
        .select(col("doc_id"),
          explode(TextAnalysis.winnowFingerprints(col("text"), 8, 4)).as("f"))
        .select(col("doc_id"), col("f.pos").as("pos"), col("f.hash").as("hash"))
        .orderBy(col("doc_id"), col("pos"))
    },
    Some("""
      WITH pw(j, p) AS (VALUES (0, 1), (1, 257), (2, 66049), (3, 16974593),
        (4, 67503107), (5, 168429323), (6, 336663071), (7, 623063367)),
      d AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
        FROM documents WHERE length(text) >= 11),
      grams AS (
        SELECT doc_id, text,
               unnest(generate_series(0, CAST(len AS INT) - 8)) AS pos
        FROM d),
      gh AS (
        SELECT doc_id, CAST(pos AS INT) AS pos,
               CAST(SUM(CAST(unicode(substr(text, CAST(pos + t.jj AS INT) + 1, 1))
                        AS BIGINT) * p.p) AS BIGINT) % 2147483647 AS hash
        FROM grams, (SELECT unnest(generate_series(0, 7)) AS jj) t
        JOIN pw p ON p.j = 7 - t.jj
        GROUP BY doc_id, pos),
      win AS (
        SELECT doc_id,
               unnest(generate_series(0, CAST(len AS INT) - 11)) AS wj
        FROM d),
      cand AS (
        SELECT w.doc_id, g.pos, g.hash,
               ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.wj
                                  ORDER BY g.hash, g.pos) AS rn
        FROM win w
        JOIN gh g ON g.doc_id = w.doc_id
               AND g.pos BETWEEN CAST(w.wj AS INT) AND CAST(w.wj AS INT) + 3)
      SELECT DISTINCT doc_id, pos, hash FROM cand WHERE rn = 1
      ORDER BY doc_id, pos"""))

  /** Unigram-LM perplexity with the corpus as its own LM: token MLE probs
    * from global counts, per-doc mean negative log-prob, exponentiated.
    * Both engines sum identical log terms over the same token multiset.
    */
  val textLmPpl = Q(
    "text_lm_ppl",
    (s, d) => {
      TextAnalysis.lmPerplexity(T.documents(s, d), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("ppl"), 2).as("ppl"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id AS id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      t2 AS (SELECT * FROM tok WHERE length(tok) > 0),
      counts AS (SELECT tok, COUNT(*) AS tf FROM t2 GROUP BY 1),
      tot AS (SELECT SUM(tf) AS n FROM counts),
      sc AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               AVG(-LN(tf * 1.0 / n)) AS nll
        FROM t2 JOIN counts USING (tok) CROSS JOIN tot
        GROUP BY 1)
      SELECT id AS doc_id, n_tokens, ROUND(EXP(nll), 2) AS ppl
      FROM sc ORDER BY doc_id"""))

  /** Gopher repetition rules: the oracle replays 2-gram occurrence stats
    * and the duplicated-5-gram interval-union coverage per doc.
    */
  val textRepetition = Q(
    "text_repetition",
    (s, d) => {
      TextAnalysis.repetitionStats(T.documents(s, d), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("dup_2gram_frac"), 4).as("dup_2gram_frac"),
          round(col("top_2gram_frac"), 4).as("top_2gram_frac"),
          round(col("dup_5gram_token_frac"), 4).as("dup_5gram_token_frac"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id AS id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents),
      base AS (SELECT id, CAST(len(w) AS BIGINT) AS n_tokens FROM tok),
      g2x AS (
        SELECT id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS g
        FROM (SELECT id, w, unnest(generate_series(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 2)),
      g2 AS (
        SELECT id, SUM(c) AS total2, COUNT(*) AS distinct2, MAX(c) AS max2
        FROM (SELECT id, g, COUNT(*) AS c FROM g2x GROUP BY 1, 2)
        GROUP BY 1),
      g5x AS (
        SELECT id, CAST(i - 1 AS BIGINT) AS pos,
               w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] || ' ' ||
               w[CAST(i AS INT) + 2] || ' ' || w[CAST(i AS INT) + 3] || ' ' ||
               w[CAST(i AS INT) + 4] AS g
        FROM (SELECT id, w, unnest(generate_series(1, len(w) - 4)) AS i
              FROM tok WHERE len(w) >= 5)),
      dpos AS (
        SELECT id, pos FROM g5x
        QUALIFY COUNT(*) OVER (PARTITION BY id, g) >= 2),
      m AS (
        SELECT id, pos,
               MAX(pos + 4) OVER (PARTITION BY id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS max_prev_end
        FROM dpos),
      f AS (
        SELECT id, pos,
               CASE WHEN max_prev_end IS NULL OR pos > max_prev_end
                    THEN 1 ELSE 0 END AS newspan
        FROM m),
      sp AS (
        SELECT id, CAST(SUM(newspan) OVER (PARTITION BY id ORDER BY pos) AS BIGINT) AS span,
               pos
        FROM f),
      cov AS (
        SELECT id, CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
        FROM (SELECT id, span, MIN(pos) AS s, MAX(pos) + 4 AS e
              FROM sp GROUP BY 1, 2)
        GROUP BY 1)
      SELECT b.id AS doc_id, b.n_tokens,
             ROUND(COALESCE((total2 - distinct2) * 1.0 / total2, 0), 4)
               AS dup_2gram_frac,
             ROUND(LEAST(1.0, COALESCE(max2 * 2.0 / b.n_tokens, 0)), 4)
               AS top_2gram_frac,
             ROUND(COALESCE(dup_tokens * 1.0 / b.n_tokens, 0), 4)
               AS dup_5gram_token_frac
      FROM base b
      LEFT JOIN g2 ON g2.id = b.id
      LEFT JOIN cov ON cov.id = b.id
      ORDER BY doc_id"""))

  /** Heaps-law vocabulary growth over id-order corpus slices: per decile,
    * docs, token occurrences, first-seen token types, cumulative vocab.
    * The oracle mirrors the bucket formula (double math, floor, clamp)
    * and the min-first-bucket per type.
    */
  val textVocabGrowth = Q(
    "text_vocab_growth",
    (s, d) => {
      TextAnalysis.vocabGrowth(T.documents(s, d), "doc_id", "text",
        nBuckets = 10)
        .orderBy(col("bucket"))
    },
    Some("""
      WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
      toks AS (
        SELECT doc_id,
               CAST(LEAST(FLOOR(doc_id * 10.0 / (m + 1.0)), 9) AS INT) AS bucket,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        FROM documents, mx),
      t AS (SELECT * FROM toks WHERE length(token) > 0),
      pb AS (
        SELECT bucket, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM t GROUP BY 1),
      fs AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM (
          SELECT token, MIN(bucket) AS bucket FROM t GROUP BY 1)
        GROUP BY 1)
      SELECT pb.bucket, pb.n_docs, pb.n_tokens,
             CAST(COALESCE(fs.new_types, 0) AS BIGINT) AS new_types,
             CAST(SUM(COALESCE(fs.new_types, 0))
               OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_vocab
      FROM pb LEFT JOIN fs USING (bucket)
      ORDER BY bucket"""))

  /** Interpolated bigram LM self-scoring (Jelinek-Mercer lambda=0.75);
    * the oracle replays both gram orders and the first-token unigram
    * term with the same expression shapes.
    */
  val textLmPplBigram = Q(
    "text_lm_ppl_bigram",
    (s, d) => {
      TextAnalysis.lmPerplexityInterp(T.documents(s, d), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("ppl"), 2).as("ppl"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH arrs AS (
        SELECT doc_id AS id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> length(x) > 0) AS a
        FROM documents),
      base AS (SELECT * FROM arrs WHERE len(a) > 0),
      uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS uf
              FROM (SELECT unnest(a) AS tok FROM base) GROUP BY 1),
      tot AS (SELECT CAST(SUM(uf) AS BIGINT) AS n FROM uni),
      bi AS (SELECT id, a[i] AS prev, a[i + 1] AS cur
             FROM (SELECT id, a, unnest(range(1, len(a))) AS i FROM base)),
      bc AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS bf
             FROM bi GROUP BY 1, 2),
      bs AS (
        SELECT id, -LN(0.75 * bf / pf + 0.25 * cf / n) AS nll
        FROM bi
        JOIN bc USING (prev, cur)
        JOIN (SELECT tok AS prev, uf AS pf FROM uni) USING (prev)
        JOIN (SELECT tok AS cur, uf AS cf FROM uni) USING (cur)
        CROSS JOIN tot),
      fs AS (
        SELECT id, -LN(uf * 1.0 / n) AS nll
        FROM (SELECT id, a[1] AS tok FROM base)
        JOIN uni USING (tok) CROSS JOIN tot),
      u AS (SELECT * FROM fs UNION ALL SELECT * FROM bs),
      sc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                    AVG(nll) AS nll FROM u GROUP BY 1)
      SELECT id AS doc_id, n_tokens, ROUND(EXP(nll), 2) AS ppl
      FROM sc ORDER BY doc_id"""))

  /** Kneser-Ney bigram perplexity — the smoothing KenLM ships. The
    * oracle replays the full KN chain: bigram types, per-context
    * continuation counts N1+(v·)/N1+(·w), the add-one-smoothed
    * continuation distribution, and the discounted interpolation, with
    * float operation shapes mirrored term by term.
    */
  val textLmPplKn = Q(
    "text_lm_ppl_kn",
    (s, d) => {
      TextAnalysis.lmPerplexityKn(T.documents(s, d), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("ppl"), 2).as("ppl"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH arrs AS (
        SELECT doc_id AS id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> length(x) > 0) AS a
        FROM documents),
      base AS (SELECT * FROM arrs WHERE len(a) > 0),
      uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS uf
              FROM (SELECT unnest(a) AS tok FROM base) GROUP BY 1),
      bi AS (SELECT id, a[i] AS prev, a[i + 1] AS cur
             FROM (SELECT id, a, unnest(range(1, len(a))) AS i FROM base)),
      bc AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS bf
             FROM bi GROUP BY 1, 2),
      fol AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS fol
              FROM bc GROUP BY 1),
      pre AS (SELECT cur, CAST(COUNT(*) AS BIGINT) AS pre
              FROM bc GROUP BY 1),
      ntv AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM bc),
      nvv AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM uni),
      bs AS (
        SELECT id,
               -LN(GREATEST(bf - 0.75, 0.0) / pf
                   + 0.75 * fol / pf
                     * ((COALESCE(pre, 0) + 1) / (nt + nv))) AS nll
        FROM bi
        JOIN bc USING (prev, cur)
        JOIN (SELECT tok AS prev, uf AS pf FROM uni) USING (prev)
        JOIN fol USING (prev)
        LEFT JOIN pre USING (cur)
        CROSS JOIN ntv CROSS JOIN nvv),
      fs AS (
        SELECT id, -LN((COALESCE(pre, 0) + 1) / (nt + nv)) AS nll
        FROM (SELECT id, a[1] AS cur FROM base)
        LEFT JOIN pre USING (cur)
        CROSS JOIN ntv CROSS JOIN nvv),
      u AS (SELECT * FROM fs UNION ALL SELECT * FROM bs),
      sc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                    AVG(nll) AS nll FROM u GROUP BY 1)
      SELECT id AS doc_id, n_tokens, ROUND(EXP(nll), 2) AS ppl
      FROM sc ORDER BY doc_id"""))

  /** First BPE statistics pass: char-pair frequencies (with end-of-word
    * marker) over the unique-word table — "what would the first merges be".
    * The oracle mirrors the word-count-weighted pair expansion.
    */
  val textBpePairs = Q(
    "text_bpe_pairs",
    (s, d) => Bpe.pairCounts(T.documents(s, d), "text", topK = 50),
    Some("""
      WITH w AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wf FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
          FROM documents)
        WHERE length(word) > 0 GROUP BY 1),
      p AS (
        SELECT substring(word, i, 1) AS lhs,
               CASE WHEN i = length(word) THEN '</w>'
                    ELSE substring(word, i + 1, 1) END AS rhs,
               wf
        FROM (SELECT word, wf, unnest(range(1, length(word) + 1)) AS i FROM w))
      SELECT lhs, rhs, CAST(SUM(wf) AS BIGINT) AS cnt
      FROM p GROUP BY 1, 2
      ORDER BY cnt DESC, lhs, rhs
      LIMIT 50"""))

  /** Word2vec phrase detection (Mikolov et al. 2013 delta-discounted
    * collocation score). Raw double score: both engines compute the same
    * ((cnt-d)*N)/(ca*cb) expression tree, so the doubles are bit-identical
    * (the lm_ppl precedent).
    */
  val textPmiPhrases = Q(
    "text_pmi_phrases",
    (s, d) => TextAnalysis.phraseScores(T.documents(s, d), "doc_id", "text",
      minCount = 5L, delta = 5.0, topK = 40),
    Some("""
      WITH arrs AS (
        SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> length(x) > 0) AS a
        FROM documents),
      uni AS (SELECT unnest(a) AS tok FROM arrs),
      uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM uni),
      bi AS (
        SELECT a[i] AS lhs, a[i + 1] AS rhs
        FROM (SELECT a, unnest(range(1, len(a))) AS i FROM arrs)),
      bc AS (SELECT lhs, rhs, CAST(COUNT(*) AS BIGINT) AS pair_cnt
             FROM bi GROUP BY 1, 2)
      SELECT bc.lhs, bc.rhs, bc.pair_cnt,
             (bc.pair_cnt - 5.0) * n.n_total / (ul.c * ur.c) AS score
      FROM bc, n
      JOIN uc ul ON ul.tok = bc.lhs
      JOIN uc ur ON ur.tok = bc.rhs
      WHERE bc.pair_cnt >= 5
      ORDER BY score DESC, lhs, rhs
      LIMIT 40"""))

  /** Intra-document consecutive-duplicate collapse; the oracle replays the
    * keep-unless-equal-to-predecessor rule with a lag window.
    */
  val textCollapseRuns = Q(
    "text_collapse_runs",
    (s, d) => TextAnalysis.collapseRuns(T.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      u AS (SELECT doc_id, unnest(a) AS tok,
                   unnest(range(1, len(a) + 1)) AS i FROM t),
      k AS (SELECT doc_id, tok, i,
                   lag(tok) OVER (PARTITION BY doc_id ORDER BY i) AS prev
            FROM u)
      SELECT doc_id,
        COALESCE(string_agg(tok, ' ' ORDER BY i)
          FILTER (WHERE prev IS NULL OR tok IS DISTINCT FROM prev), '')
          AS clean_text,
        CAST(COUNT(*) FILTER (WHERE prev IS NOT NULL
          AND tok IS NOT DISTINCT FROM prev) AS BIGINT) AS n_removed
      FROM k GROUP BY doc_id ORDER BY doc_id"""))

  /** DSIR importance resampling toward the English sub-corpus: hashed
    * unigram+bigram buckets (md5, the cross-engine hash), Laplace-smoothed
    * target/source log-ratios, per-doc weight, deterministic-Gumbel top-k.
    * The oracle replays the full cascade; log-weight sums are rounded in
    * both engines before use (double-sum order sensitivity).
    */
  val textDsir = Q(
    "text_dsir",
    (s, d) => TextAnalysis.dsirSelect(T.documents(s, d), "doc_id", "text",
      col("lang") === "en", nBuckets = 256, alpha = 1.0, topK = 60),
    Some("""
      WITH arrs AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> length(x) > 0) AS a
        FROM documents),
      feats AS (
        SELECT doc_id, lang = 'en' AS is_t, unnest(a) AS f FROM arrs
        UNION ALL
        SELECT doc_id, lang = 'en' AS is_t, a[i] || ' ' || a[i + 1] AS f
        FROM (SELECT doc_id, lang, a, unnest(range(1, len(a))) AS i
              FROM arrs)),
      fb AS (
        SELECT doc_id, is_t,
               ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b
        FROM feats),
      bc AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS cs,
               CAST(COUNT(*) FILTER (WHERE is_t) AS BIGINT) AS ct
        FROM fb GROUP BY 1),
      tot AS (SELECT CAST(SUM(cs) AS BIGINT) AS ts,
                     CAST(SUM(ct) AS BIGINT) AS tt FROM bc),
      ratio AS (
        SELECT b, ln(((ct + 1.0) / (tt + 256.0))
                     / ((cs + 1.0) / (ts + 256.0))) AS lw
        FROM bc, tot),
      dw AS (
        SELECT doc_id, ROUND(SUM(lw), 4) AS log_w
        FROM fb JOIN ratio USING (b) GROUP BY 1)
      SELECT doc_id, log_w,
             ROUND(log_w + -ln(-ln(
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  ::BIGINT % 1000000000 AS DOUBLE) + 0.5) / 1000000000.0)),
               4) AS score
      FROM dw
      ORDER BY score DESC, doc_id
      LIMIT 60"""))

  /** The persisted-index face of DSIR: build distributions on the 90%
    * slice (temp dir, inside the query so the STORED artifact round-trip
    * is what's verified), score the held-out 10% against them. Buckets
    * the index never saw take the all-smoothing default ratio — the
    * oracle replays that via COALESCE after its LEFT join.
    */
  val textDsirIndexed = Q(
    "text_dsir_indexed",
    (s, d) => {
      val docs = T.documents(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dsir_idx").toString
      TextAnalysis.buildDsirIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", col("lang") === "en", dir, nBuckets = 256)
      TextAnalysis.scoreDsirIndexed(s, dir,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH arrs AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> length(x) > 0) AS a
        FROM documents),
      feats AS (
        SELECT doc_id, lang = 'en' AS is_t, unnest(a) AS f FROM arrs
        UNION ALL
        SELECT doc_id, lang = 'en' AS is_t, a[i] || ' ' || a[i + 1] AS f
        FROM (SELECT doc_id, lang, a, unnest(range(1, len(a))) AS i
              FROM arrs)),
      fb AS (
        SELECT doc_id, is_t,
               ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b
        FROM feats),
      bc AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS cs,
               CAST(COUNT(*) FILTER (WHERE is_t) AS BIGINT) AS ct
        FROM fb WHERE doc_id % 10 != 0 GROUP BY 1),
      tot AS (SELECT CAST(SUM(cs) AS BIGINT) AS ts,
                     CAST(SUM(ct) AS BIGINT) AS tt FROM bc),
      probe AS (SELECT doc_id, b FROM fb WHERE doc_id % 10 = 0),
      scored AS (
        SELECT probe.doc_id,
               COALESCE(ln(((bc.ct + 1.0) / (tt + 256.0))
                           / ((bc.cs + 1.0) / (ts + 256.0))),
                        ln((ts + 256.0) / (tt + 256.0))) AS lw
        FROM probe LEFT JOIN bc USING (b), tot)
      SELECT doc_id, ROUND(SUM(lw), 4) AS log_w
      FROM scored GROUP BY 1 ORDER BY doc_id"""))

  /** Trained-classifier filtering: multinomial NB self-classification of
    * the corpus by language label. Scores are exact integer micro-nats
    * (see [[TextAnalysis.nbClassify]]), so the oracle replays the whole
    * train+score cascade bit-for-bit: counting, add-one likelihoods,
    * micro-rounding, integer sums, argmax with class tie-break.
    */
  val textNbClassify = Q(
    "text_nb_classify",
    (s, d) => {
      val docs = T.documents(s, d)
      TextAnalysis.nbClassify(docs, docs, "doc_id", "text", "lang")
        .select(col("id").as("doc_id"), col("pred"), col("score_micro"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH ttok AS (
        SELECT lang AS cls,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      t2 AS (SELECT * FROM ttok WHERE length(tok) > 0),
      ctc AS (SELECT cls, tok, COUNT(*) AS cf FROM t2 GROUP BY 1, 2),
      ctot AS (SELECT cls, SUM(cf) AS ctot FROM ctc GROUP BY 1),
      vs AS (SELECT COUNT(DISTINCT tok) AS v FROM ctc),
      pri AS (SELECT lang AS cls, COUNT(*) AS nd FROM documents GROUP BY 1),
      nall AS (SELECT SUM(nd) AS n_docs FROM pri),
      clst AS (
        SELECT c.cls, c.ctot, vs.v,
               CAST(ROUND(LN(p.nd * 1.0 / nall.n_docs) * 1e6) AS BIGINT)
                 AS prior_micro
        FROM ctot c JOIN pri p USING (cls), vs, nall),
      stok AS (
        SELECT doc_id AS id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      s2 AS (SELECT * FROM stok WHERE length(tok) > 0),
      scored AS (
        SELECT s.id, c.cls, c.prior_micro,
               CAST(ROUND(LN((COALESCE(x.cf, 0) + 1.0) / (c.ctot + c.v))
                          * 1e6) AS BIGINT) AS llh
        FROM s2 s CROSS JOIN clst c
        LEFT JOIN ctc x ON x.tok = s.tok AND x.cls = c.cls),
      pc AS (
        SELECT id, cls,
               CAST(prior_micro + SUM(llh) AS BIGINT) AS score_micro
        FROM scored GROUP BY id, cls, prior_micro),
      r AS (
        SELECT id AS doc_id, cls AS pred, score_micro,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY score_micro DESC, cls) AS rn
        FROM pc)
      SELECT doc_id, pred, score_micro FROM r WHERE rn = 1
      ORDER BY doc_id"""))

  /** Sketch-screened frequent n-grams: CMS has one-sided error, so the
    * screen keeps every truly-heavy gram and the exact recount removes
    * collisions — the oracle is the PLAIN groupBy-HAVING, proving the
    * sketch invisible (the [[Curate.decontaminateBloom]] structure).
    */
  val textHeavyGrams = Q(
    "text_heavy_grams",
    (s, d) => {
      TextAnalysis.heavyGrams(T.documents(s, d), "text", n = 3, minCount = 5)
        .select(col("gram"), col("cnt"))
        .orderBy(col("gram"))
    },
    Some("""
      WITH tok AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      shx AS (
        SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM tok WHERE len(w) >= 3),
      g AS (
        SELECT w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] || ' ' ||
               w[CAST(i AS INT) + 2] AS gram
        FROM shx)
      SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g
      GROUP BY 1 HAVING COUNT(*) >= 5 ORDER BY gram"""))

  /** The text-clustering oracle CTE chain through `a2` (doc labels) —
    * tokenize, integer micro-idf, md5 feature hashing, dense-vector
    * assembly, the shared unrolled 2-iteration Lloyd chain. Shared by
    * the cluster row and the c-TF-IDF labeling row.
    */
  private val textClusterCtes = s"""tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents),
      t2 AS (SELECT doc_id, tok FROM tok WHERE length(tok) > 0),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
      dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      idf AS (
        SELECT tok,
               CAST(ROUND(LN((nd.n_docs + 1.0) / (df + 1.0)) * 1e6) AS BIGINT)
                 + 1000000 AS idf_micro
        FROM dfq, nd),
      wtd AS (
        SELECT f.doc_id,
               CAST(('0x' || substr(md5(f.tok), 1, 15))::BIGINT % 64 AS INT)
                 AS bkt,
               f.tf * i.idf_micro AS w
        FROM tf f JOIN idf i USING (tok)),
      grid AS (
        SELECT doc_id, unnest(generate_series(0, 63)) AS bkt
        FROM (SELECT DISTINCT doc_id FROM wtd)),
      bw AS (
        SELECT g.doc_id, g.bkt,
               CAST(COALESCE(SUM(w.w), 0) AS DOUBLE) AS val
        FROM grid g LEFT JOIN wtd w
          ON w.doc_id = g.doc_id AND w.bkt = g.bkt
        GROUP BY 1, 2),
      e AS (
        SELECT doc_id AS vec_id, list(val ORDER BY bkt) AS v
        FROM bw GROUP BY 1),
      ${SimilarityQueries.duckKmeansChain("")}"""

  /** Cluster-based curation: k-means over hashed TF-IDF vectors. The
    * oracle replays the ENTIRE cascade — tokenize, integer micro-idf,
    * md5 feature hashing, dense-vector assembly, then the shared
    * unrolled 2-iteration Lloyd chain (seeding, cosine argmax, mean
    * update, reassignment) — so the featurizer and the clustering are
    * both hash-verified, not just the label histogram.
    */
  val textCluster = Q(
    "text_cluster",
    (s, d) => {
      TextAnalysis.textClusters(T.documents(s, d), "doc_id", "text",
        k = 10, iters = 2, dim = 64)
        .select(col("doc_id"), col("label").cast("int").as("label"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $textClusterCtes
      SELECT vec_id AS doc_id, CAST(label AS INT) AS label
      FROM a2 ORDER BY doc_id"""))

  /** c-TF-IDF cluster labeling (Grootendorst 2022, BERTopic §2.3): the
    * top terms per text cluster by class-based TF-IDF — term frequency
    * within the cluster × log(1 + A / corpus tf), A = mean tokens per
    * cluster. THE standard way to name unsupervised document clusters;
    * the oracle replays clustering AND labeling.
    */
  val textClusterLabels = Q(
    "text_cluster_labels",
    (s, d) => {
      TextAnalysis.clusterTopTerms(T.documents(s, d), "doc_id", "text",
        k = 10, iters = 2, dim = 64, topN = 3)
        .select(col("label").cast("int").as("label"), col("rank"),
          col("tok"), round(col("score"), 6).as("score"))
        .orderBy(col("label"), col("rank"))
    },
    Some(s"""
      WITH $textClusterCtes,
      lab AS (SELECT vec_id AS doc_id, label FROM a2),
      ctf AS (
        SELECT l.label, t.tok, COUNT(*) AS tf
        FROM t2 t JOIN lab l USING (doc_id) GROUP BY 1, 2),
      alltf AS (SELECT tok, COUNT(*) AS atf FROM t2 GROUP BY 1),
      avga AS (
        SELECT AVG(n) AS a FROM (
          SELECT label, COUNT(*) AS n
          FROM t2 JOIN lab USING (doc_id) GROUP BY 1)),
      scored AS (
        SELECT c.label, c.tok,
               c.tf * LN(1.0 + avga.a / alltf.atf) AS score
        FROM ctf c JOIN alltf USING (tok) CROSS JOIN avga),
      rk AS (
        SELECT label, tok, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY score DESC, tok) AS INT) AS rank
        FROM scored)
      SELECT CAST(label AS INT) AS label, rank, tok,
             ROUND(score, 6) AS score
      FROM rk WHERE rank <= 3 ORDER BY label, rank"""))

  /** Per-JVM prebuilt index fixtures, keyed by sfDir — the text-side twin
    * of `SimilarityQueries.ensureAnnFixture`. The `*_probe` queries below
    * time (and verify) the per-query SEARCH path alone — partition-pruned
    * posting fetch, stored-stats scoring — which is what runs per query in
    * production; `text_bm25_indexed` / `text_dsir_indexed` keep timing the
    * whole build→persist→search cascade. Build params match those queries
    * EXACTLY (same 90/10 split, same append fold), so their oracles verify
    * the probe rows too. Builds run once per JVM, outside any timed window
    * (Bench warms the fixtures before pass 1).
    */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensureBm25Fixture(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    fixtureCache.computeIfAbsent(s"bm25:$d", { _ =>
      val docs = T.documents(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_bm25_fixture").toString
      TextAnalysis.buildBm25Index(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", dir, nBuckets = 64)
      TextAnalysis.appendToBm25Index(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", dir)
      dir
    })

  def ensureDsirFixture(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    fixtureCache.computeIfAbsent(s"dsir:$d", { _ =>
      val docs = T.documents(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dsir_fixture").toString
      TextAnalysis.buildDsirIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", col("lang") === "en", dir, nBuckets = 256)
      dir
    })

  val textBm25Probe = Q(
    "text_bm25_probe",
    (s, d) =>
      TextAnalysis.searchBm25Indexed(s, ensureBm25Fixture(s, d),
        Seq("scan", "merge", "batch"), k1 = 1.2, b = 0.75, topK = 20)
        .select(col("id").as("doc_id"), round(col("score"), 4).as("score"),
          col("n_matched"))
        .orderBy(col("score").desc, col("doc_id")),
    textBm25Indexed.oracle)

  def ensurePhraseFixture(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    fixtureCache.computeIfAbsent(s"phrase:$d", { _ =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_phrase_fixture").toString
      TextAnalysis.buildPositionalIndex(T.documents(s, d), "doc_id", "text",
        dir, nBuckets = 64)
      dir
    })

  /** ONE phrase oracle shared by the in-memory scan row and the indexed
    * probe row — the two paths must agree bit-for-bit by construction.
    */
  private val phraseOracle = Some("""
      WITH tok AS (
        SELECT doc_id, w, pos FROM (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '\s+')) AS w,
                 generate_subscripts(regexp_split_to_array(lower(text), '\s+'), 1) AS pos
          FROM documents)
        WHERE w IN ('table', 'hash'))
      SELECT a.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_matches
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        AND a.w = 'table' AND b.w = 'hash'
      GROUP BY 1 ORDER BY 1""")

  /** Phrase probe: the partition-pruned positional-index search path,
    * hash-matched against the in-memory phrase scan's oracle.
    */
  val textPhraseProbe = Q(
    "text_phrase_probe",
    (s, d) =>
      TextAnalysis.searchPhraseIndexed(s, ensurePhraseFixture(s, d),
          Seq("table", "hash"))
        .orderBy(col("id")),
    phraseOracle)

  val textDsirProbe = Q(
    "text_dsir_probe",
    (s, d) =>
      TextAnalysis.scoreDsirIndexed(s, ensureDsirFixture(s, d),
        T.documents(s, d).filter(col("doc_id") % 10 === 0),
        "doc_id", "text")
        .orderBy(col("doc_id")),
    textDsirIndexed.oracle)

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, window 2):
    * PageRank over the corpus-level adjacent-token co-occurrence graph —
    * high-rank tokens sit centrally in the corpus's phrase structure
    * (the graph-centrality alternative to [[textIdf]]'s frequency
    * weighting). All tokens emit with their rank (no top-k cut: a cutoff
    * at a float boundary would make the hash compare depend on last-ulp
    * sum order); the oracle replays the edge build and the same 3-round
    * recurrence.
    */
  val textTextrank = Q(
    "text_textrank",
    (s, d) => {
      val edges = TextAnalysis.cooccurrenceEdges(T.documents(s, d), "text")
      Graph.pageRank(edges, iterations = 3, damping = 0.85)
        .select(col("node").as("token"), round(col("rank"), 6).as("rank"))
        .orderBy(col("token"))
    },
    Some(s"""
      WITH tok AS (
        SELECT regexp_split_to_array(lower(text), '\\s+') AS w
        FROM documents),
      px AS (
        SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM tok WHERE len(w) >= 2),
      pairsq AS (
        SELECT DISTINCT w[CAST(i AS INT)] AS a, w[CAST(i AS INT) + 1] AS b
        FROM px WHERE w[CAST(i AS INT)] <> w[CAST(i AS INT) + 1]),
      edges AS (
        SELECT a, b FROM pairsq UNION SELECT b AS a, a AS b FROM pairsq),
      ${Graph.duckPageRankSql(3)}
      SELECT node AS token, ROUND(r, 6) AS rank FROM r3 ORDER BY token"""))

  /** Gopher rule battery (Rae et al. 2021): per-rule verdicts + features,
    * the standard pretraining quality gate with attribution.
    */
  val textGopherRules = Q(
    "text_gopher_rules",
    (s, d) =>
      TextAnalysis.gopherRules(T.documents(s, d), "doc_id", "text")
        .orderBy(col("id")),
    Some("""
      WITH f AS (
        SELECT doc_id,
               regexp_split_to_array(text, '\s+') AS w,
               regexp_split_to_array(lower(text), '\s+') AS wl,
               length(text) - length(replace(text, '#', '')) AS hashes,
               (length(text) - length(replace(text, '...', ''))) // 3 AS ellipses
        FROM documents),
      g AS (
        SELECT doc_id AS id,
               CAST(len(w) AS BIGINT) AS n_words,
               ROUND(list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w), 4) AS mean_word_len,
               ROUND((hashes + ellipses) * 1.0 / len(w), 4) AS symbol_ratio,
               ROUND(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 / len(w), 4) AS alpha_frac,
               CAST(list_contains(wl, 'the')::INT + list_contains(wl, 'be')::INT
                 + list_contains(wl, 'to')::INT + list_contains(wl, 'of')::INT
                 + list_contains(wl, 'and')::INT + list_contains(wl, 'that')::INT
                 + list_contains(wl, 'have')::INT + list_contains(wl, 'with')::INT
                 AS INT) AS stop_hits
        FROM f)
      SELECT id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
             n_words >= 50 AND n_words <= 100000 AS ok_words,
             mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS ok_mean_len,
             symbol_ratio <= 0.1 AS ok_symbols,
             alpha_frac >= 0.8 AS ok_alpha,
             stop_hits >= 2 AS ok_stops,
             ok_words AND ok_mean_len AND ok_symbols AND ok_alpha AND ok_stops AS pass
      FROM g ORDER BY id"""))

  /** Positional phrase search — consecutive-token match counts, the
    * postings-intersection query a bag-of-words index cannot answer.
    */
  val textPhraseSearch = Q(
    "text_phrase_search",
    (s, d) =>
      TextAnalysis.phraseSearch(T.documents(s, d), "doc_id", "text",
          Seq("table", "hash"))
        .orderBy(col("id")),
    phraseOracle)

  /** RAG-style overlapping chunking (16-token windows every 8): the
    * oracle replays the tokenize → start-offset fan-out → slice cascade;
    * chunk text itself is compared, so slicing must agree to the token.
    */
  val textChunkOverlap = Q(
    "text_chunk_overlap",
    (s, d) => TextAnalysis.chunkOverlap(
        T.documents(s, d), "doc_id", "text", chunkSize = 16, stride = 8)
      .orderBy(col("id"), col("chunk_id")),
    Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> len(x) > 0) AS w
        FROM documents),
      t2 AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
      c AS (
        SELECT doc_id, w, n,
               CAST(unnest(generate_series(0,
                 CAST(CEIL(n * 1.0 / 8) AS INT) - 1)) AS INT) AS chunk_id
        FROM t2)
      SELECT doc_id AS id, chunk_id,
             array_to_string(w[chunk_id * 8 + 1 : chunk_id * 8 + 16], ' ')
               AS chunk,
             CAST(LEAST(16, n - chunk_id * 8) AS BIGINT) AS n_tokens
      FROM c ORDER BY id, chunk_id"""))

  /** RAG retrieval composition: overlapping chunks ([[TextAnalysis
    * .chunkOverlap]]) become the retrieval units, BM25 ranks THEM — the
    * actual retrieval-augmented-generation pattern (passage-level
    * retrieval, not document-level). The oracle replays chunking AND the
    * full BM25 chain over the chunk table; the composite chunk key
    * (doc_id·10⁴ + chunk_id) is derived row-locally both ways.
    */
  val textRagRetrieve = Q(
    "text_rag_retrieve",
    (s, d) => {
      val chunks = TextAnalysis.chunkOverlap(
          T.documents(s, d), "doc_id", "text", chunkSize = 16, stride = 8)
        .select((col("id") * 10000 + col("chunk_id")).as("chunk_key"),
          col("chunk"))
      // top-k cut on the ROUNDED score: chunk-level BM25 produces dense
      // tie groups (identical tf/dl patterns), so a raw-double cut sits
      // on engine float-path noise; rounding first makes the boundary
      // engine-stable and the id tie-break total (oracle cuts the same)
      TextAnalysis.bm25(chunks, "chunk_key", "chunk",
          Seq("hash", "join", "vector"), k1 = 1.2, b = 0.75,
          topK = Int.MaxValue)
        .withColumn("score", round(col("score"), 4))
        .orderBy(col("score").desc, col("id")).limit(20)
        .select(expr("id div 10000").as("doc_id"),
          (col("id") % 10000).cast("int").as("chunk_id"),
          col("score"), col("n_matched"))
        .orderBy(col("score").desc, col("doc_id"), col("chunk_id"))
    },
    Some("""
      WITH t0 AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> len(x) > 0) AS w
        FROM documents),
      t1 AS (SELECT doc_id, w, len(w) AS n FROM t0 WHERE len(w) > 0),
      cg AS (
        SELECT doc_id, w,
               CAST(unnest(generate_series(0,
                 CAST(CEIL(n * 1.0 / 8) AS INT) - 1)) AS INT) AS chunk_id
        FROM t1),
      ch AS (
        SELECT doc_id * 10000 + chunk_id AS id,
               array_to_string(w[chunk_id * 8 + 1 : chunk_id * 8 + 16], ' ')
                 AS chunk
        FROM cg),
      tok AS (
        SELECT id, unnest(regexp_split_to_array(lower(chunk), '\s+')) AS tok
        FROM ch),
      t AS (SELECT id, tok FROM tok WHERE length(tok) > 0),
      dl AS (SELECT id, COUNT(*) AS dl FROM t GROUP BY 1),
      stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
      tf AS (SELECT id, tok, COUNT(*) AS tf FROM t
             WHERE tok IN ('hash', 'join', 'vector') GROUP BY 1, 2),
      dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      sc AS (
        SELECT tf.id,
               SUM(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                   * (tf.tf * (1.2 + 1))
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
                 AS score,
               CAST(COUNT(*) AS BIGINT) AS n_matched
        FROM tf JOIN dfq USING (tok) JOIN dl USING (id), stats s
        GROUP BY 1),
      cut AS (
        SELECT id, ROUND(score, 4) AS score, n_matched FROM sc
        ORDER BY ROUND(score, 4) DESC, id LIMIT 20)
      SELECT id // 10000 AS doc_id, CAST(id % 10000 AS INT) AS chunk_id,
             score, n_matched
      FROM cut ORDER BY score DESC, doc_id, chunk_id"""))

  /** Full BPE TRAINING loop under an oracle (completes the tokenizer
    * family: text_bpe_pairs was the statistics pass only): 5 merge rounds
    * over the unique-word table, each round one vocab-sized aggregation +
    * a 1-row argmax collect. The oracle replays the loop as an unrolled
    * CTE chain whose merge application is the relational form of greedy
    * left-to-right matching (candidate runs + even-offset keep — equal to
    * the engine's left fold; `Bpe.duckRound`). Corpus-scale work is the
    * word count only; every round runs on vocab-sized state — the 100 TB
    * shape of subword-nmt/SentencePiece training re-expressed
    * relationally.
    */
  val textBpeTrain = Q(
    "text_bpe_train",
    (s, d) => Bpe.train(T.documents(s, d), "text", nMerges = 5),
    Some(Bpe.duckTrainSql(5)))

  /** The trained tokenizer APPLIED back to the corpus: per-document
    * subword counts under the same unrolled oracle — the oracle segments
    * via the final vocab table (train's end state IS every corpus word's
    * segmentation; the engine's memoized `segmentWord` replays the merges
    * per word, so equality here pins the train/apply consistency
    * invariant end-to-end at corpus scale).
    */
  val textBpeSegment = Q(
    "text_bpe_segment",
    (s, d) => {
      val docs = T.documents(s, d)
      val merges = Bpe.train(docs, "text", nMerges = 5)
        .collect() // 5 rows — the tokenizer artifact, driver-bounded
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.applyBpe(docs, "doc_id", "text", merges)
        .select(col("doc_id"), col("n_subwords"))
        .orderBy(col("doc_id"))
    },
    Some(Bpe.duckSegmentSql(5)))

  // ---- logistic-regression classifier (Classifier.scala) ----
  // Shared feature set: intercept + ln-length + punct ratio + ascii-word
  // density; label = (lang = 'en'). 5 full-batch GD rounds at step 1.0 —
  // the oracle unrolls the identical recurrence (pagerank convention).
  private def lrFeats = Seq(
    log(col("n_chars") + 1),
    size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)))
      .cast("double") / col("n_chars"),
    size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0)))
      * lit(10.0) / col("n_chars"))

  private def lrLabel = when(col("lang") === "en", 1.0).otherwise(0.0)

  private val lrOracleCtes = {
    val z = (k: Int) => s"w$k.w0*x0 + w$k.w1*x1 + w$k.w2*x2 + w$k.w3*x3"
    val rounds = (1 to 5).map { r =>
      val gs = (0 to 3).map(i =>
        s"AVG((1/(1+EXP(-(${z(r - 1)})))-y)*x$i) AS g$i").mkString(", ")
      val ws = (0 to 3).map(i =>
        s"w${r - 1}.w$i - 1.0*g$r.g$i AS w$i").mkString(", ")
      s"g$r AS (SELECT $gs FROM f, w${r - 1}),\n" +
        s"w$r AS (SELECT $ws FROM w${r - 1}, g$r)"
    }.mkString(",\n")
    """WITH f AS (
      SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             1.0 AS x0,
             LN(n_chars + 1) AS x1,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
               / n_chars AS x2,
             len(regexp_extract_all(text, '[A-Za-z]+')) * 10.0
               / n_chars AS x3
      FROM documents),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
    """ + rounds
  }

  val textLrTrain = Q(
    "text_lr_train",
    (s, d) => {
      import s.implicits._
      Classifier.logitTrain(T.documents(s, d), lrLabel, lrFeats,
        rounds = 5, step = 1.0)
        .map { case (r, w) => (r, w(0), w(1), w(2), w(3)) }
        .toDF("round", "w0", "w1", "w2", "w3")
        .select(col("round"),
          round(col("w0"), 6).as("w0"), round(col("w1"), 6).as("w1"),
          round(col("w2"), 6).as("w2"), round(col("w3"), 6).as("w3"))
        .orderBy(col("round"))
    },
    Some(lrOracleCtes + "\n" + (1 to 5).map(r =>
      s"SELECT $r AS round, ROUND(w0,6) AS w0, ROUND(w1,6) AS w1, " +
        s"ROUND(w2,6) AS w2, ROUND(w3,6) AS w3 FROM w$r")
      .mkString("", " UNION ALL ", " ORDER BY round")))

  val textLrScore = Q(
    "text_lr_score",
    (s, d) => {
      val w = Classifier.logitTrain(T.documents(s, d), lrLabel, lrFeats,
        rounds = 5, step = 1.0).last._2
      T.documents(s, d)
        .select(col("doc_id"),
          round(Classifier.logitScore(lrFeats, w), 6).as("p_en"),
          (Classifier.logitScore(lrFeats, w) >= 0.5).as("pred_en"))
        .orderBy(col("doc_id"))
    },
    Some(lrOracleCtes + """
      SELECT doc_id,
             ROUND(1/(1+EXP(-(w5.w0*1.0 + w5.w1*LN(n_chars+1)
               + w5.w2*(CAST(len(regexp_extract_all(text,'[.,;:!?]')) AS DOUBLE)/n_chars)
               + w5.w3*(len(regexp_extract_all(text,'[A-Za-z]+'))*10.0/n_chars)))), 6) AS p_en,
             1/(1+EXP(-(w5.w0*1.0 + w5.w1*LN(n_chars+1)
               + w5.w2*(CAST(len(regexp_extract_all(text,'[.,;:!?]')) AS DOUBLE)/n_chars)
               + w5.w3*(len(regexp_extract_all(text,'[A-Za-z]+'))*10.0/n_chars)))) >= 0.5 AS pred_en
      FROM documents, w5
      ORDER BY doc_id"""))

  /** [[Curate.curateWithDq]] — the DQ battery wired IN FRONT of the
    * curation cascade: rows violating any row-local rule (null text,
    * out-of-range length, unexpected language) route to a quarantine
    * channel with their `dq_fail` tags; clean rows flow through the full
    * quality/exact-dedup/near-dup cascade. BOTH channels are hash-gated:
    * the oracle replays the tagging, gates the corpus, and re-runs the
    * whole cascade over the gated rows — so a routing bug on either side
    * (a bad row curated, or a good row quarantined) breaks the hash.
    */
  val textCurateDq = Q(
    "text_curate_dq",
    (s, d) => {
      val rules = Seq(
        DataQuality.NotNull("text"),
        DataQuality.InRange("n_chars", 100, 1000000),
        DataQuality.InSet("lang", Seq("en", "de", "es", "fr")))
      val cfg = Curate.Config(minTokens = 30, minStopwordRatio = 0.02,
        nearDupThreshold = 0.8)
      val (kept, quarantined) =
        Curate.curateWithDq(T.documents(s, d), "doc_id", "text", rules, cfg)
      kept.select(lit("kept").as("channel"), col("doc_id"),
          lit("").as("dq_fail"))
        .unionByName(quarantined.select(lit("quarantined").as("channel"),
          col("doc_id"), col("dq_fail")))
        .orderBy(col("channel"), col("doc_id"))
    },
    Some(s"""
      WITH tagged AS (
        -- COALESCE: DuckDB array_to_string([]) is NULL, Spark array_join
        -- of an empty array is '' — the clean tag must compare equal
        SELECT doc_id,
               COALESCE(array_to_string(list_sort(list_filter([
                 CASE WHEN text IS NULL THEN 'not_null:text' END,
                 CASE WHEN n_chars IS NOT NULL
                       AND (n_chars < 100 OR n_chars > 1000000)
                      THEN 'in_range:n_chars' END,
                 CASE WHEN lang IS NOT NULL
                       AND lang NOT IN ('en', 'de', 'es', 'fr')
                      THEN 'in_set:lang' END], x -> x IS NOT NULL)), ','),
                 '') AS dq_fail
        FROM documents),
      gated AS (
        SELECT d.* FROM documents d
        JOIN tagged t ON t.doc_id = d.doc_id
        WHERE t.dq_fail = ''),
      ${duckCurateChain.replace("FROM documents", "FROM gated")}
      SELECT 'kept' AS channel, k.doc_id, '' AS dq_fail
      FROM kept2 k LEFT JOIN losers l ON l.b = k.doc_id
      WHERE l.b IS NULL
      UNION ALL
      SELECT 'quarantined', doc_id, dq_fail FROM tagged WHERE dq_fail <> ''
      ORDER BY channel, doc_id"""))

  def all: Seq[Q] = Seq(textQuality, textLangId, textTokenCount,
    textFingerprint, textScrub, textSampleStratified, textIdf, textCurate,
    textCurateReport, textCurateEst, textBm25, textLengthProfile, textWinnow,
    textLmPpl, textLmPplBigram, textRepetition, textVocabGrowth,
    textBpePairs, textPmiPhrases, textCollapseRuns, textDsir,
    textDsirIndexed, textNbClassify, textCluster, textHeavyGrams,
    textBm25Indexed, textBm25Probe, textDsirProbe, textTextrank,
    textGopherRules, textPhraseSearch, textPhraseProbe, textClusterLabels,
    textLmPplKn, textChunkOverlap, textRagRetrieve, textBpeTrain,
    textBpeSegment, textLrTrain, textLrScore, textTfidfRelated,
    textCuratedCard, textHashEmbed, textCurateDq)
}

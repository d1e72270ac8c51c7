package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the standard training-data cleaning cascade
  * composed from the primitive operators, cheap stages first —
  *
  *   1. quality gate (per-row projection, scan speed),
  *   2. exact dedup (hash groupBy, keep smallest id),
  *   3. near-dup removal (MinHash-LSH candidates + Jaccard verify, greedy
  *      keep-lowest-id),
  *
  * so each stage shrinks the input of the next, exactly like the bio
  * prefilter→align cascade. Fully deterministic — a re-run (or another
  * engine) keeps the same rows.
  */
object Curate {

  final case class Config(
      minTokens: Int = 5,
      minStopwordRatio: Double = 0.0,
      shingleSize: Int = 2,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      nearDupThreshold: Double = 0.8,
      /** Verify near-dup candidates by exact Jaccard over shingle sets
        * (engine-reproducible, re-joins the corpus-wide shingle table
        * twice) or by minhash-signature agreement
        * ([[Dedup.nearDuplicatesEstimated]] — row-local after one
        * aggregation, the right verify once the shingle table dwarfs
        * memory; threshold granularity becomes 1/numHashes). The 10×
        * scale spot-bench (BASELINE.md §e) measured the exact verify as
        * the one ~linear-boundary stage of this cascade.
        */
      estimatedVerify: Boolean = false)

  /** Quality-gate predicate over [[TextAnalysis.qualityFeatures]] columns. */
  def qualityPred(cfg: Config): Column =
    col("n_tokens") >= cfg.minTokens &&
      col("stopword_ratio") >= cfg.minStopwordRatio

  /** Returns the kept rows of `df` (original columns). */
  def curate(df: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    cascade(df, idCol, textCol, cfg)._3

  /** DQ-gated curation: a [[DataQuality]] battery of row-local rules runs
    * IN FRONT of the cascade — rows violating any rule route to a
    * quarantine channel (with their `dq_fail` tags), and only clean rows
    * enter the quality/dedup stages. This is the reference's hard input
    * aborts (`src/sra/convert2sradb.cpp:113-116`) generalized: at 100 TB
    * one malformed shard must divert, not kill the run. Returns
    * (curated keepers, quarantined rows).
    */
  def curateWithDq(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[DataQuality.Rule],
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val (clean, quarantined) = DataQuality.route(df, rules)
    (curate(clean, idCol, textCol, cfg), quarantined)
  }

  /** Per-stage survivor counts of the [[curate]] cascade — the funnel
    * telemetry a production curation run reports ("how much did each
    * filter remove?"). One row per stage: 0_input, 1_quality,
    * 2_exact_dedup, 3_near_dup; `n_docs` is the count SURVIVING that
    * stage. Stage prefixes replay within one plan (AQE exchange reuse
    * dedupes the shared subtrees; the exact-deduped frame is cached by
    * the cascade either way).
    */
  def curateReport(df: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val (qualityDocs, exactDeduped, kept) = cascade(df, idCol, textCol, cfg)
    def c(stage: String, d: DataFrame) =
      d.agg(count(lit(1)).cast("long").as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    c("0_input", df)
      .unionByName(c("1_quality", qualityDocs))
      .unionByName(c("2_exact_dedup", exactDeduped))
      .unionByName(c("3_near_dup", kept))
  }

  /** The cascade's three stage outputs (quality-gated, exact-deduped,
    * near-dup-removed), shared by [[curate]] and [[curateReport]].
    */
  private def cascade(df: DataFrame, idCol: String, textCol: String,
      cfg: Config): (DataFrame, DataFrame, DataFrame) = {
    // 1. quality gate, INLINE: the gate only reads n_tokens and
    // stopword_ratio, both pure per-row expressions over the text —
    // filtering the corpus directly replaces the old features-then-
    // left-semi-join shape (one exchange + a second corpus scan per
    // cascade, guide §2.4) with a scan-speed predicate. Expressions are
    // shared with qualityFeatures (TextAnalysis.wsToks/stopHitsOf), so
    // the kept row set is identical by construction PROVIDED idCol is
    // unique (the corpus contract — doc_id is a key): with duplicate ids
    // the old join kept every row sharing a passing id, the inline gate
    // keeps only rows that pass themselves. widen: the gate +
    // md5 dedup map side otherwise runs at the scan's partition count.
    val toks = TextAnalysis.wsToks(col(textCol))
    val qualityDocs = graft.Par.widen(df).filter(
      size(toks) >= cfg.minTokens &&
        (TextAnalysis.stopHitsOf(toks).cast("double") / size(toks))
          >= cfg.minStopwordRatio)

    // 2. exact dedup: keep the smallest id per identical text
    val keepers = qualityDocs
      .groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    // cached: feeds BOTH the shingle pipeline and the final anti-join —
    // uncached, the quality+dedup join chain replays per consumer. Lifetime
    // is CALLER-OWNED (the returned frame is lazy; unpersisting here would
    // evict before the caller's action): materialize, then clearCache() —
    // or unpersist implicitly when the session ends.
    val exactDeduped = qualityDocs.join(keepers, Seq(idCol), "left_semi")
      .cache()

    // 3. near-dup removal (greedy keep-lowest-id over verified pairs)
    val pairs =
      if (cfg.estimatedVerify)
        Dedup.nearDuplicatesEstimated(exactDeduped, idCol, textCol,
          cfg.shingleSize, cfg.numHashes, cfg.rowsPerBand, cfg.nearDupThreshold)
      else
        Dedup.nearDuplicates(exactDeduped, idCol, textCol,
          cfg.shingleSize, cfg.numHashes, cfg.rowsPerBand, cfg.nearDupThreshold)
    (qualityDocs, exactDeduped, Dedup.applyNearDups(exactDeduped, idCol, pairs))
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minShared` distinct word-`shingleSize`-grams with the eval slice
    * (`evalPred` rows). The standard test-set-overlap scrub run before
    * training; eval docs themselves are never flagged. Returns
    * (id, n_shared) for flagged docs.
    *
    * Scale shape: the eval side collapses to its DISTINCT gram set first —
    * a benchmark is tiny next to the corpus, so that set broadcasts and
    * the corpus-side probe is a scan-speed semi-join, never a corpus-level
    * shuffle by gram. Real deployments use long grams (8-13 words), which
    * also keeps any single gram's document frequency — and thus join
    * fan-out — low.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      evalPred: Column, shingleSize: Int = 3, minShared: Int = 3): DataFrame = {
    val sh = Dedup.shingles(corpus, idCol, textCol, shingleSize)
    val evalIds = corpus.filter(evalPred).select(col(idCol).as("id"))
    val evalGrams = sh.join(evalIds, Seq("id"), "left_semi")
      .select(col("shingle")).distinct()
    sh.join(evalIds, Seq("id"), "left_anti")
      .join(evalGrams, Seq("shingle"))
      // shingle rows are distinct per (id, shingle), so the count IS the
      // distinct shared-gram count
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Attribution variant of [[decontaminate]]: per (corpus doc, eval doc)
    * pair the count of distinct shared grams — the "WHICH benchmark did
    * this doc leak from" report an audit wants, where the flag alone
    * isn't actionable. Same scale shape as [[decontaminate]] except the
    * eval gram table keeps its eval-doc id (it cannot collapse to a
    * distinct gram set), so join fan-out is gram × eval docs containing
    * it — bounded by the benchmark side, which is small by construction.
    * Returns (id, eval_id, n_shared); eval docs are never on the left.
    */
  def decontaminateAttribution(corpus: DataFrame, idCol: String,
      textCol: String, evalPred: Column, shingleSize: Int = 3,
      minShared: Int = 3): DataFrame = {
    val sh = Dedup.shingles(corpus, idCol, textCol, shingleSize)
    val evalIds = corpus.filter(evalPred).select(col(idCol).as("eval_id"))
    val evalGrams = sh
      .join(evalIds, sh("id") === evalIds("eval_id"))
      .select(col("eval_id"), col("shingle"))
    sh.join(evalIds, sh("id") === evalIds("eval_id"), "left_anti")
      .join(evalGrams, Seq("shingle"))
      // shingle rows are distinct per (id, shingle) and evalGrams per
      // (eval_id, shingle), so the count IS the distinct shared-gram count
      .groupBy(col("id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Drop flagged docs (the apply step of [[decontaminate]]). */
  def removeContaminated(corpus: DataFrame, idCol: String,
      flagged: DataFrame): DataFrame =
    corpus.join(flagged.select(col("id").as(idCol)), Seq(idCol), "left_anti")

  /** Sketch-accelerated [[decontaminate]]: a Bloom filter over the eval
    * slice's gram set screens corpus grams at SCAN speed before the
    * exact-verify join. Output is IDENTICAL to [[decontaminate]] — Bloom
    * filters have no false negatives, so the prefilter can only drop
    * rows the join would drop anyway, and the surviving candidates are
    * verified against the true gram set (false positives die there, not
    * in the output).
    *
    * When it matters: [[decontaminate]] ships every corpus (id, gram)
    * row into the probe join. At 100 TB that join's corpus side is the
    * whole exploded gram table — even as a broadcast-hash probe, every
    * row reaches the operator. Here the ~fpp-of-corpus survivors reach
    * it instead; the gram explosion itself stays, but the join input
    * (and any shuffle fallback if the eval side ever outgrows
    * broadcast) shrinks by ~1/fpp. The sketch is built with ONE bounded
    * driver action (the eval vocabulary count — benchmark-scale by
    * construction) + a treeAggregate, then broadcast once: at fpp=0.01
    * a 100M-gram eval suite costs ~120 MB, well inside executor
    * memory; size scales as n·ln(1/fpp), so cap fpp no lower than the
    * memory budget allows. The probe is a deterministic scalar UDF —
    * off-codegen, but branch-free hashing per row, no shuffle.
    */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
      evalPred: Column, shingleSize: Int = 3, minShared: Int = 3,
      fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    // eval side explodes ONLY the eval slice (predicate reaches the scan).
    // localCheckpoint, not cache: eagerly materialized for the three
    // consumers (count, sketch build, verify join) and released by the
    // ContextCleaner once unreferenced — a long-lived service never
    // accumulates pinned eval-gram blocks across calls
    val evalGrams = Dedup.shingles(corpus.filter(evalPred), idCol, textCol,
      shingleSize).select(col("shingle")).distinct().localCheckpoint()
    val nGrams = math.max(evalGrams.count(), 1L)
    val bloom = evalGrams.stat.bloomFilter("shingle", nGrams, fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val bloomHit = udf((s: String) => bloomB.value.mightContain(s))
    val evalIds = corpus.filter(evalPred).select(col(idCol).as("id"))
    Dedup.shingles(corpus, idCol, textCol, shingleSize)
      .join(evalIds, Seq("id"), "left_anti")
      .filter(bloomHit(col("shingle")))
      .join(evalGrams, Seq("shingle"))
      // both join sides are distinct per (id, shingle) / shingle, so the
      // row count IS the distinct shared-gram count
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}

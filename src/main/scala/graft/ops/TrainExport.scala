package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-export operators: the last mile of a data pipeline — turn a
  * curated corpus into the deterministically-shuffled, shard-partitioned,
  * context-packed form a trainer consumes.
  *
  * Scale design (100 TB):
  *  - the "global shuffle" is hash-derived, not a sort: shard and in-shard
  *    order come from md5(id), so no operator ever needs a total order over
  *    the corpus — assignment is a per-row projection, and the only sort is
  *    within-shard (parallel across shards, exactly what a sorted
  *    partitioned write costs anyway);
  *  - md5 makes the shuffle reproducible across runs AND engines (same
  *    portable-hash trick as the minhash family), so an interrupted export
  *    resumes per-shard with identical contents;
  *  - context packing is a window partitioned BY SHARD — state never
  *    crosses shard boundaries, so packing parallelizes with the shard
  *    count (pick nShards >> executor count).
  */
object TrainExport {

  /** Deterministic pseudo-random shard assignment: `shard = md5(id) mod n`,
    * plus the full digest as `sort_key` — ordering by it inside a shard IS
    * the global shuffle, without any global sort. Adds (sort_key, shard) to
    * `df`'s columns.
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("sort_key", md5(col(idCol).cast("string")))
      // 15 hex chars < 2^60: positive in a signed long, so % n is safe
      .withColumn("shard",
        (conv(substring(col("sort_key"), 1, 15), 16, 10).cast("long")
          % nShards).cast("int"))
  }

  /** Write the corpus as `nShards` shard directories, each sorted by
    * `sort_key` (= shuffled order). One shuffle, parallel sorted writes;
    * re-running produces byte-identical shards.
    */
  def writeShards(df: DataFrame, idCol: String, path: String,
      nShards: Int): Unit =
    assignShards(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Deterministic mixture balancing (the Pile/Dolma-style source
    * reweighting): downsample groups so the output approaches the target
    * proportions, keeping the LARGEST corpus that satisfies them — output
    * size M = min over groups of supply/target-share (the binding group
    * survives whole), per-group keep fraction = target*M/supply, and the
    * keep decision is an md5-hash threshold on the id (reproducible across
    * runs and engines: a doc's fate depends only on its id and its group's
    * recomputed keep fraction, never on scan order). Groups not in
    * `targets` are dropped.
    *
    * Scale: one count aggregation (collapses to |groups| driver scalars),
    * then a scan-speed filter — no shuffle of the corpus itself.
    */
  def sampleToMixture(df: DataFrame, idCol: String, groupCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive shares")
    val inTargets = col(groupCol).isin(targets.keys.toSeq: _*)
    val counts = df.filter(inTargets)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a group with zero supply forces M = 0 (cannot hit its share at all)
    val m = targets.keys.map(g => counts.getOrElse(g, 0L) / targets(g)).min
    val keepFrac = targets.foldLeft(lit(0.0)) { case (acc, (g, t)) =>
      when(col(groupCol) === g,
        lit(t * m / math.max(1L, counts.getOrElse(g, 1L)).toDouble))
        .otherwise(acc)
    }
    // uniform [0,1) hash fraction from the 60-bit md5 prefix of the id
    val frac = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(2, 60))
    df.filter(inTargets).filter(frac < keepFrac)
  }

  /** Temperature-based mixture sampling (the multilingual-training
    * standard: Conneau & Lample 2019 §3.1; also mT5's α-sampling): target
    * share of group s is `q_s ∝ n_s^alpha`, flattening the natural size
    * distribution toward uniform as alpha → 0 and leaving it untouched at
    * alpha = 1. Downsample-only without replacement, so the achievable
    * output is `M = min_s n_s/q_s` — at that M the SMALLEST group is kept
    * in full and every larger group thins toward its temperature share.
    * Keep decisions use the same md5-hash-threshold rule as
    * [[sampleToMixture]]: deterministic across runs, engines, and
    * partitionings; no rand().
    *
    * alpha = 1 is the identity (every keep rate is exactly 1.0 — spec
    * pinned), which makes the knob safe to leave in a pipeline config.
    *
    * Scale: one count aggregation collapsing to |groups| driver scalars
    * (house convention: scalar aggregates may surface to the driver),
    * then a scan-speed projection filter — the corpus itself never
    * shuffles.
    */
  def sampleTemperature(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "sampleTemperature: empty input")
    // sorted fold: float addition is order-sensitive; a fixed order keeps
    // z bit-identical run-over-run (the oracle sums the same few doubles)
    val z = counts.toSeq.sortBy(_._1)
      .map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val m = counts.values.map(n => z * math.pow(n.toDouble, 1.0 - alpha)).min
    val keepFrac = counts.foldLeft(lit(0.0)) { case (acc, (g, n)) =>
      val q = math.pow(n.toDouble, alpha) / z
      when(col(groupCol) === g, lit(math.min(1.0, q * m / n))).otherwise(acc)
    }
    val frac = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(2, 60))
    df.filter(frac < keepFrac)
  }

  /** Greedy sequential context packing (GPT-style document packing): walk
    * each shard in shuffled order, accumulate whitespace-token counts, and
    * cut a new context every `tokenBudget` tokens —
    * `ctx_id = floor(preceding_tokens / tokenBudget)`. Documents may
    * straddle a budget boundary (the trainer's concat-and-split handles
    * that); what matters is that contexts are deterministic, size-balanced,
    * and computable without cross-shard state. Adds (sort_key, shard,
    * tokens, ctx_id).
    */
  def packContexts(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, tokenBudget: Int): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("sort_key"), col(idCol))
    assignShards(df, idCol, nShards)
      // same whitespace-token formula as TextAnalysis.tokenCounts
      .withColumn("tokens",
        size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .withColumn("_cum", sum(col("tokens")).over(w))
      .withColumn("ctx_id",
        floor((col("_cum") - col("tokens")) / lit(tokenBudget.toLong)))
      .drop("_cum")
  }

  /** Near-dup-aware train/eval split: all docs of one near-dup COMPONENT
    * land on the same side, so no eval doc has a training-set twin (the
    * leakage a plain random split causes whenever the corpus still
    * contains near-dups — the reason decontamination pipelines split by
    * cluster, not by doc). `pairs` is any near-dup pair table (a, b) —
    * LSH, SimHash, or estimated; transitive closure comes from
    * [[Dedup.components]], singleton docs are their own cluster. The side
    * is an md5-hash threshold on the CLUSTER label (deterministic across
    * runs and engines, same rule as [[sampleToMixture]]); expected eval
    * share = `evalFrac` of clusters (by mass if cluster sizes are
    * id-independent). Adds (cluster, split) to every input row.
    *
    * Scale: components runs over the pairs table (small), its labels
    * hash-join back to the corpus by id, the hash threshold is a per-row
    * projection — no corpus shuffle beyond the one label join.
    */
  def splitByComponent(df: DataFrame, idCol: String, pairs: DataFrame,
      evalFrac: Double): DataFrame = {
    require(evalFrac > 0 && evalFrac < 1, s"evalFrac in (0,1), got $evalFrac")
    val labels = Dedup.components(pairs)
      .select(col("node").as(idCol), col("component"))
    val frac = conv(substring(md5(concat(lit("split:"),
      col("cluster").cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(2, 60))
    df.join(labels, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol)))
      .withColumn("split",
        when(frac < evalFrac, lit("eval")).otherwise(lit("train")))
      .drop("component")
  }

  /** Curriculum ordering: assign each row a difficulty PHASE by exact
    * score quantile (phase 0 = easiest quartile … phases−1 = hardest),
    * then a deterministic shuffled position within (phase, shard) — the
    * export shape for curriculum training, where the trainer consumes
    * phases in order but each phase is internally shuffled.
    *
    * Scale: the cut points are ONE exact-percentile aggregation
    * collapsing to `phases−1` driver scalars (swap in
    * `percentile_approx` beyond memory-comfortable corpus sizes — the
    * exact variant exists here for oracle parity); phase assignment is a
    * per-row comparison against broadcast cuts; the position window is
    * partitioned by (phase, shard), so state is bounded by
    * corpus/(phases·nShards) per task and parallelism scales with the
    * shard count. Rows exactly ON a cut land in the lower phase.
    * Output: input columns + (sort_key, shard, phase, pos).
    */
  def curriculumOrder(df: DataFrame, idCol: String, score: Column,
      phases: Int, nShards: Int): DataFrame = {
    require(phases >= 2, s"phases must be >= 2, got $phases")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val fracs = (1 until phases).map(_.toDouble / phases)
    val cuts = df.select(score.cast("double").as("_s"))
      .agg(expr(s"percentile(_s, array(${fracs.mkString(", ")}))"))
      .head().getSeq[Double](0)
    val phase = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(score.cast("double") > lit(c), lit(1)).otherwise(lit(0))
    }
    val w = Window.partitionBy(col("phase"), col("shard"))
      .orderBy(col("sort_key"), col(idCol))
    assignShards(df, idCol, nShards)
      .withColumn("phase", phase.cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Uniform [0,1) fraction derived from md5(seedTag + id) — the shared
    * deterministic-randomness primitive (60-bit prefix, +0.5 so u is
    * never exactly 0 and ln(u) stays finite).
    */
  private def hashU(idCol: String, seedTag: Column): Column =
    (conv(substring(md5(concat(seedTag, col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long").cast("double") + lit(0.5)) /
      lit(math.pow(2, 60))

  /** Deterministic weighted sampling WITHOUT replacement — exactly `k`
    * rows, selection probability proportional to `weightCol` (Efraimidis–
    * Spirakis exponential keys: rank by `ln(u)/w` with u a uniform hash
    * of (seed, id); the k largest keys are a weighted sample without
    * replacement). The quality-weighted cousin of [[sampleToMixture]]'s
    * proportion sampling: "give me the best-k docs, biased by score but
    * not a hard top-k" — a hard top-k overfits the scorer, weighted
    * sampling keeps tail diversity while still favoring quality.
    *
    * Determinism: u depends only on (seed, id) — reproducible across
    * runs, engines (the md5 trick), and partitionings. Zero/negative
    * weights are excluded (they have probability 0).
    *
    * Scale: `orderBy(key).limit(k)` compiles to TakeOrderedAndProject —
    * a per-partition top-k heap + driver merge of k·partitions rows,
    * never a global sort. Keep k ≤ ~100k at corpus scale; for larger
    * draws, sample per group with [[weightedSamplePerGroup]] and union.
    * Output: input columns + `samp_key` (the selection key, for audit).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn("_w", weight.cast("double"))
      .filter(col("_w") > 0)
      .withColumn("samp_key", log(hashU(idCol, lit(s"$seed:"))) / col("_w"))
      .orderBy(col("samp_key").desc, col(idCol))
      .limit(k)
      .drop("_w")
  }

  /** Group-wise [[weightedSample]]: `k` rows per `groupCol` value via a
    * rank window partitioned by group — state bounded per group, scales
    * with the group count (the shape for "k docs per domain/language").
    */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, weight: Column,
      k: Int, seed: String, groupCol: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("samp_key").desc, col(idCol))
    df.withColumn("_w", weight.cast("double"))
      .filter(col("_w") > 0)
      .withColumn("samp_key", log(hashU(idCol, lit(s"$seed:"))) / col("_w"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_w", "_rk")
  }
}

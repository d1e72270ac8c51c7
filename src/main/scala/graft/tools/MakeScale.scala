package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Dev tool: derive a K×-larger synthetic corpus from an existing sf dir
  * by unioning K salted replicas (the BASELINE.md §e scale spot-bench).
  *
  * Each replica salts every NON-stopword token with a per-replica suffix.
  * Token salting is a bijection on the token vocabulary, so WITHIN a
  * replica every shingle-set relation — and therefore the near-dup pair
  * structure — is EXACTLY the source corpus's; ACROSS replicas docs share
  * only stopword-stopword bigrams (far below any Jaccard threshold), so
  * pair volume scales linearly with the corpus (as real corpora do)
  * instead of exploding quadratically from replication artifacts. The
  * stopwords (TextAnalysis.qualityFeatures' marker set) survive verbatim,
  * so token-level quality gates (n_tokens, stopword_ratio) behave
  * identically per replica and the curation cascade stays meaningful.
  * (Rejected alternatives, measured: a single trailing salt token left
  * replicas ~0.9-Jaccard near-dups of their originals — 1000× the pairs;
  * per-replica token SORTING canonicalized docs onto each other — 17000×.)
  * Compare k=10 against a k=1 run of the SAME construction so numerator
  * and denominator share their character.
  * Ids offset by a stride that is a multiple of every %-modulus the
  * registry queries use (10, 20), preserving query/probe subset ratios.
  * Embeddings get a per-replica alternating-sign perturbation so replica
  * directions differ (no artificial cosine-duplicate explosion either).
  *
  * Usage: runMain graft.tools.MakeScale [srcSfDir] [dstDir] [k]
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/scale/sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stride = 1000000L
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    val docsK = (0 until k).map { i =>
      val salted = F.array_join(
        F.transform(F.split(F.col("text"), "\\s+"), t =>
          F.when(F.lower(t).isin(stop: _*), t)
            .otherwise(F.concat(t, F.lit(s"z$i")))),
        " ")
      docs.select(
        (F.col("doc_id") + F.lit(i * stride)).as("doc_id"),
        salted.as("text"),
        F.col("lang"), F.col("source"), F.col("n_chars"))
    }.reduce(_ unionByName _)
    docsK.repartition(32).write.mode("overwrite")
      .parquet(s"$dst/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embK = (0 until k).map { i =>
      emb.select(
        (F.col("vec_id") + F.lit(i * stride)).as("vec_id"),
        F.transform(F.col("embedding"), (x, j) =>
          x + F.lit(0.02f * i) * F.when(j % 2 === 0, F.lit(1.0f))
            .otherwise(F.lit(-1.0f))).as("embedding"),
        F.col("label"))
    }.reduce(_ unionByName _)
    embK.repartition(32).write.mode("overwrite")
      .parquet(s"$dst/embeddings.parquet")
    // events replicate on the USER axis (user_id + replica stride,
    // event_id re-keyed, ts untouched): every per-user construct —
    // windows, sessions, funnels, SCD2 histories, as-of matches — is
    // EXACTLY the source corpus's within each replica and disjoint
    // across replicas, so event-family outputs scale linearly with no
    // cross-replica interference and no artificial time densification
    // (per-hour window groups keep k× the rows, the shuffle's real
    // scale axis). Closes the standing "events rows have no ×10 leg"
    // gap (BASELINE §e).
    val ev = spark.read.parquet(s"$src/events.parquet")
    val evK = (0 until k).map { i =>
      ev.select(
        (F.col("event_id") + F.lit(i * stride)).as("event_id"),
        F.col("ts"),
        (F.col("user_id") + F.lit(i * stride)).as("user_id"),
        F.col("event_type"), F.col("value"), F.col("props"))
    }.reduce(_ unionByName _)
    evK.repartition(32).write.mode("overwrite")
      .parquet(s"$dst/events.parquet")
    println(s"[makescale] wrote ${k}x $src -> $dst")
    spark.stop()
  }
}

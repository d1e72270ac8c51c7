package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content about spark engines"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "der schnelle braune fuchs und die katze ist hier")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under one keeper") {
    val r = Dedup.exact(docs, "doc_id", Seq(col("text"))).collect()
    assert(r.length == 4) // 5 docs, one exact pair
    val dup = r.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keeper_id") == 0L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup always collides
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L }) // unrelated
  }

  test("jaccard: exact dup = 1.0, near dup high, via ngramJaccard") {
    val r = Dedup.ngramJaccard(docs, "doc_id", "text", col("doc_id") === 0,
      shingleSize = 2, minCommon = 1, maxDocFreq = 100)
      .select("tid", "jaccard").as[(Long, Double)].collect().toMap
    assert(r(3L) == 1.0)
    assert(r(1L) > 0.7 && r(1L) < 1.0)
    assert(!r.contains(2L))
  }

  test("ngramJaccard fractional doc-freq cap scales with the corpus") {
    import spark.implicits._
    // "boiler plate" appears in 6/10 docs (60%); each doc also carries a
    // unique tail so only the planted near-pair shares rare shingles
    val c = (0L until 10L).map { i =>
      val common = if (i < 6) "boiler plate " else ""
      (i, s"${common}unique$i tail$i extra$i")
    } ++ Seq((100L, "shared alpha beta gamma one"),
      (101L, "shared alpha beta gamma two"))
    val cdf = c.toDF("doc_id", "text")
    // frac 0.8: the 60%-shingle survives the gate -> boilerplate docs pair up
    val loose = Dedup.ngramJaccard(cdf, "doc_id", "text", col("doc_id") < 6,
      shingleSize = 2, minCommon = 1, maxDocFreqFrac = Some(0.8))
      .select("qid", "tid").as[(Long, Long)].collect().toSet
    assert(loose.exists { case (q, t) => q < 6 && t < 6 })
    // frac 0.25: 60% > 25% of the corpus -> the boilerplate shingle drops,
    // only genuinely-rare overlap (the planted pair) can match
    val tight = Dedup.ngramJaccard(cdf, "doc_id", "text", col("doc_id") >= 100,
      shingleSize = 2, minCommon = 1, maxDocFreqFrac = Some(0.25))
      .select("qid", "tid").as[(Long, Long)].collect().toSet
    assert(tight == Set((100L, 101L), (101L, 100L)))
    val none = Dedup.ngramJaccard(cdf, "doc_id", "text", col("doc_id") < 6,
      shingleSize = 2, minCommon = 1, maxDocFreqFrac = Some(0.25))
      .select("qid", "tid").as[(Long, Long)].collect().toSet
    assert(none.isEmpty)
  }

  test("containmentPairs flags short-inside-long that Jaccard misses") {
    import spark.implicits._
    // a 6-token quote embedded verbatim inside a 200-token page: every
    // quote shingle appears in the page, but the union is dominated by
    // the page, so Jaccard ~ 5/199 while containment = 1.0
    val quote = "alpha bravo charlie delta echo foxtrot"
    val page = quote + " " + (0 until 194).map(i => s"w$i").mkString(" ")
    val cdf = Seq((0L, quote), (1L, page), (2L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(cdf, "doc_id", "text",
      col("doc_id") === 0, shingleSize = 2, minCommon = 3, threshold = 0.8)
      .select("tid", "containment").as[(Long, Double)].collect().toMap
    assert(cont == Map(1L -> 1.0),
      s"quote fully contained in page, nothing else: $cont")
    val jac = Dedup.ngramJaccard(cdf, "doc_id", "text", col("doc_id") === 0,
      shingleSize = 2, minCommon = 3)
      .select("tid", "jaccard").as[(Long, Double)].collect().toMap
    assert(jac(1L) < 0.05, s"Jaccard must stay tiny for the same pair: $jac")
    // orientation: the PAGE as query is barely contained in the quote
    val rev = Dedup.containmentPairs(cdf, "doc_id", "text",
      col("doc_id") === 1, shingleSize = 2, minCommon = 3, threshold = 0.8)
      .count()
    assert(rev == 0, "containment is directional: page !⊆ quote")
  }

  test("applyNearDupsBest keeps one argmax-rank survivor per cluster") {
    import spark.implicits._
    // chain 1-2, 2-3 = one cluster; 10-11 another; 50 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val corpus = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 2L), (11L, 7L),
      (50L, 1L)).toDF("doc_id", "quality")
    val kept = Dedup.applyNearDupsBest(corpus, "doc_id", pairs, col("quality"))
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2,3}: max quality 9 tied between 2 and 3 -> smallest id 2;
    // cluster {10,11}: 11 wins on quality; 50 survives untouched
    assert(kept == Set(2L, 11L, 50L))
  }

  test("applyNearDups keeps the lowest id of each duplicate pair") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
    val kept = Dedup.applyNearDups(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L) && !kept.contains(3L)) // exact pair (0,3)
    assert(kept.contains(2L) && kept.contains(4L)) // unrelated survive
  }

  test("simhash: identical texts get identical hashes; hamming near for near-dups") {
    val h = Dedup.simhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(h(0L) == h(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(1L)) < ham(h(0L), h(2L)))
  }

  test("cosine top-k: nearest neighbor of a vector is its near-copy") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.99, 0.1, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)), (3L, Array(0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val r = Similarity.cosineTopK(vecs, vecs.filter($"vec_id" === 0), 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(r.find(_._2 == 1).map(_._1).contains(1L))
  }

  test("IVF routes to nearest clusters and finds in-cluster neighbors") {
    val vecs = Seq(
      (0L, 0, Array(1.0, 0.0)), (1L, 0, Array(0.95, 0.05)),
      (2L, 1, Array(0.0, 1.0)), (3L, 1, Array(0.05, 0.95))
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0), "label",
      k = 1, nprobe = 1)
      .select("neighbor_id").as[Long].collect()
    assert(r.toSeq == Seq(1L)) // probe stays in cluster 0
  }

  test("repetitionStats: Gopher rules on planted repetitive docs") {
    val reps = Seq(
      (0L, "spam spam spam spam spam spam"),
      (1L, "a b c a b c a b"),
      (2L, "all tokens here are fully distinct words")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(reps, "doc_id", "text")
      .select("id", "n_tokens", "dup_2gram_frac", "top_2gram_frac",
        "dup_5gram_token_frac")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    // doc 0: one distinct 2-gram occurring 5x -> dup 4/5, top capped at 1,
    // both 5-gram windows identical -> full coverage
    assert(r(0L)._2 == 6 && math.abs(r(0L)._3 - 0.8) < 1e-9)
    assert(r(0L)._4 == 1.0 && r(0L)._5 == 1.0)
    // doc 1: counts {ab:3, bc:2, ca:2} -> dup 4/7, top 6/8; dup 5-grams at
    // 0 and 3 -> union [0,7] = whole doc
    assert(math.abs(r(1L)._3 - 4.0 / 7) < 1e-9)
    assert(math.abs(r(1L)._4 - 0.75) < 1e-9)
    assert(r(1L)._5 == 1.0)
    // doc 2: no repetition anywhere
    assert(r(2L)._3 == 0.0 && r(2L)._4 == 2.0 / 7 && r(2L)._5 == 0.0)
  }

  test("duplicateSpans: planted cross-doc substring and self-repeat found") {
    val shared = "one two three four five six seven eight nine ten"
    val corpus = Seq(
      (0L, s"prefix words here $shared and a tail"),
      (1L, s"different opening $shared closing words"),
      (2L, "totally unrelated text with no repeats at all whatsoever"),
      (3L, "a b c d e f g h X a b c d e f g h") // self-repeat, gap of 1
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, "doc_id", "text",
      w = 8, minOccurrences = 2)
      .select("id", "span_start", "span_end", "n_windows")
      .as[(Long, Int, Int, Long)].collect().toSet
    // docs 0/1: the 10-token shared run -> one merged span each, exactly
    // covering the shared region (3 windows of 8 tokens)
    assert(spans.contains((0L, 3, 12, 3L)))
    assert(spans.contains((1L, 2, 11, 3L)))
    // doc 3: the repeated 8-gram at 0 and 9 -> two spans (gap prevents merge)
    assert(spans.contains((3L, 0, 7, 1L)))
    assert(spans.contains((3L, 9, 16, 1L)))
    assert(!spans.exists(_._1 == 2L))
    assert(spans.size == 4)

    // apply step: spans stripped, order preserved, unflagged docs absent
    val clean = Dedup.stripSpans(corpus, "doc_id", "text",
      Dedup.duplicateSpans(corpus, "doc_id", "text", w = 8,
        minOccurrences = 2))
      .select("id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(clean.keySet == Set(0L, 1L, 3L))
    assert(clean(0L)._3 == "prefix words here and a tail" &&
      clean(0L)._2 == 10)
    assert(clean(1L)._3 == "different opening closing words")
    // doc 3: both spans removed -> only the gap token survives
    assert(clean(3L)._3 == "X" && clean(3L)._2 == 16)
  }

  test("duplicateSpansKeepOne: canonical occurrence survives the strip") {
    val shared = "one two three four five six seven eight nine ten"
    val corpus = Seq(
      (0L, s"prefix words here $shared and a tail"),
      (1L, s"different opening $shared closing words"),
      (2L, "totally unrelated text with no repeats at all whatsoever"),
      (3L, "a b c d e f g h X a b c d e f g h") // self-repeat, gap of 1
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpansKeepOne(corpus, "doc_id", "text",
      w = 8, minOccurrences = 2)
    val got = spans.select("id", "span_start", "span_end", "n_windows")
      .as[(Long, Int, Int, Long)].collect().toSet
    // winners: doc 0 keeps the shared run (lowest id), doc 3 keeps its
    // FIRST copy (earliest start) — only the non-canonical occurrences flag
    assert(got == Set((1L, 2, 11, 3L), (3L, 9, 16, 1L)))

    // strip: every duplicated substring still exists exactly once somewhere
    val clean = Dedup.stripSpans(corpus, "doc_id", "text", spans)
      .select("id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(clean.keySet == Set(1L, 3L))
    assert(clean(1L)._3 == "different opening closing words" &&
      clean(1L)._2 == 10)
    assert(clean(3L)._3 == "a b c d e f g h X" && clean(3L)._2 == 8)
  }

  test("semDedup: within-cluster pairs equal brute force restricted to clusters") {
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 60L).map { i =>
      val base = Array.tabulate(8)(j =>
        if (j == (i % 3).toInt * 2) 1.0 else 0.1 * rnd.nextDouble())
      (i, base)
    }.toDF("vec_id", "embedding")
    val pairs = Similarity.semDedup(vecs, k = 3, iters = 2, threshold = 0.9)
      .select("a", "b", "label").as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    // verify against brute force over the SAME labels: every emitted pair
    // is same-cluster with cosine >= threshold, and none is missing
    val labels = Similarity.kmeans(vecs, 3, 2)
      .as[(Long, Int)].collect().toMap
    val v = vecs.as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val brute = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      if labels(a) == labels(b) && cos(v(a), v(b)) >= 0.9
    } yield (a, b, labels(a))).toSet
    assert(pairs.toSet == brute)
    spark.catalog.clearCache()
  }

  test("lmPerplexity: rare-token docs score higher; uniform corpus is exact") {
    // 4 docs over a skewed vocab: 'common' appears 6x, rares once each
    val lm = Seq(
      (0L, "common common common"),
      (1L, "common rare1"),
      (2L, "rare2 rare3 common"),
      (3L, "common common")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.lmPerplexity(lm, "doc_id", "text")
      .select("id", "n_tokens", "ppl")
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(0L)._1 == 3 && r(1L)._1 == 2)
    // doc 0 = all-common tokens -> lowest ppl; doc 2 has two rares -> highest
    assert(r(0L)._2 < r(1L)._2 && r(1L)._2 < r(2L)._2)
    // exact value: p(common)=7/10 -> ppl(doc0) = 10/7
    assert(math.abs(r(0L)._2 - 10.0 / 7.0) < 1e-9)
  }

  test("text analysis: langid markers, token counts, fingerprint invariance") {
    val r = docs.select($"doc_id", TextAnalysis.langId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(r(0L) == "en" && r(4L) == "de")
    val tc = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(tc(0L)._1 == 9 && tc(0L)._2 == 9) // pure words: ws == bpe-ish
    // fingerprint is word-order insensitive
    val fp = Seq((0L, "b a c"), (1L, "c b a")).toDF("id", "t")
      .select(TextAnalysis.fingerprint($"t")).as[String].collect()
    assert(fp(0) == fp(1))
  }

  test("vocabGrowth: types count where first seen, cumulative vocab saturates") {
    val spark = TestSpark.spark
    import spark.implicits._
    // bucket 0 (ids 0-9): vocabulary {a b c}; bucket 1 (ids 10-19): the
    // same vocabulary plus {d} — only d is new in the second slice
    val docs = ((0 until 10).map(i => (i.toLong, "a b c a")) ++
      (10 until 20).map(i => (i.toLong, "a b c d"))).toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", nBuckets = 2)
      .orderBy("bucket")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq((0, 10L, 40L, 3L, 3L), (1, 10L, 40L, 1L, 4L)))
    // empty corpus: zero rows, not a null-max crash
    assert(TextAnalysis.vocabGrowth(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", nBuckets = 2).count() == 0)
  }

  test("lengthProfile: fractional percentiles get unique labels") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (0 until 20)
      .map(i => (i.toLong, "src", ("tok " * (i + 1)).trim))
      .toDF("id", "source", "text")
    // 0.995 and 1.0 both rounded to "p100" before the fix -> duplicate
    // output columns and a runtime AnalysisException
    val cols = TextAnalysis.lengthProfile(docs, "text", "source",
      Seq(0.5, 0.995, 1.0)).columns.toSeq
    assert(cols == Seq("source", "n_docs", "p50", "p0_995", "p100"))
    // genuinely equal percentiles still fail loudly, not with dup columns
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.lengthProfile(docs, "text", "source", Seq(0.5, 0.5))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("multimodal: stub decode plumbing produces stable features") {
    val media = Multimodal.mediaFromDocuments(spark,
      docs.select($"doc_id", $"text", length($"text").as("n_chars")))
    val f = Multimodal.extractFeatures(media).collect().map(x => x.id -> x).toMap
    assert(f(0L).n_bytes == 43)
    assert(f(0L).checksum == "the quick brown fox jumps over the lazy dog".map(_.toInt).sum)
    assert(f(0L).histo_head.sum == 43)
    assert(f(0L).frames_sampled == 11)
    assert(f(0L).checksum == f(3L).checksum) // identical payloads
  }

  test("curate cascade: quality gate, exact dedup, near-dup removal compose") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup
      (2L, "tiny"), // fails token gate
      (3L, "the quick brown fox jumps over the lazy dog and runs away slow"), // near dup of 0
      (4L, "completely different content with its own words and is unique here today")
    ).toDF("doc_id", "text")
    val kept = Curate.curate(corpus, "doc_id", "text",
      Curate.Config(minTokens = 5, minStopwordRatio = 0.0,
        nearDupThreshold = 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L)) // survivor of both dup groups
    assert(!kept.contains(1L)) // exact dup dropped
    assert(!kept.contains(2L)) // quality-gated
    assert(!kept.contains(3L)) // near dup dropped
    assert(kept.contains(4L))
  }

  test("multimodal: nearest-neighbor resize geometry") {
    // 4x2 plane resized to 2x2: picks (0,0) (2,0) (0,1) (2,1)
    val plane = Array[Byte](10, 11, 12, 13, 20, 21, 22, 23)
    val r = Multimodal.resizePlane(plane, 4, 2, 2, 2)
    assert(r.toSeq == Seq[Byte](10, 12, 20, 22))
    // identity resize is a no-op
    assert(Multimodal.resizePlane(plane, 4, 2, 4, 2).toSeq == plane.toSeq)
    // reads past a short payload come back 0
    val short = Multimodal.resizePlane(Array[Byte](1, 2), 4, 2, 2, 2)
    assert(short.toSeq == Seq[Byte](1, 0, 0, 0))
  }
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training, phrase detection, and run-collapse specs. The BPE tests
  * run a differential against an independent naive Scala implementation
  * (per-word symbol lists, hand-rolled pair counting and greedy merge) so
  * the distributed fold is checked against first principles, not itself.
  */
class TokenizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- naive reference BPE (independent of the Spark code) ----
  private def naiveVocab(texts: Seq[String]): Map[Vector[String], Long] =
    texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector :+ Bpe.EndMarker) -> ws.size.toLong
      }

  private def naivePairs(v: Map[Vector[String], Long]): Map[(String, String), Long] =
    v.toSeq.flatMap { case (syms, wf) =>
      syms.zip(syms.tail).map(p => p -> wf)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  private def naiveMergeWord(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def naiveTrain(texts: Seq[String], n: Int): Seq[(String, String, Long)] = {
    var v = naiveVocab(texts)
    (1 to n).flatMap { _ =>
      val ps = naivePairs(v)
      if (ps.isEmpty) None
      else {
        val ((l, r), c) = ps.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        v = v.toSeq.map { case (syms, wf) => naiveMergeWord(syms, l, r) -> wf }
          .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
        Some((l, r, c))
      }
    }
  }

  // the BPE-paper-shaped corpus: low x2, lower x1, newest x3, widest x1
  private def corpus = Seq(
    (0L, "low low lower newest newest"),
    (1L, "newest widest low low lower"),
    (2L, "low newest")
  ).toDF("doc_id", "text")

  test("pairCounts matches the naive word-frequency-weighted pair count") {
    val texts = corpus.select("text").as[String].collect().toSeq
    val expected = naivePairs(naiveVocab(texts))
    val got = Bpe.pairCounts(corpus, "text", topK = 1000)
      .as[(String, String, Long)].collect()
      .map { case (l, r, c) => (l, r) -> c }.toMap
    assert(got == expected)
  }

  test("train reproduces the naive greedy merge sequence (ties broken lexically)") {
    val texts = corpus.select("text").as[String].collect().toSeq
    val expected = naiveTrain(texts, 8)
    val got = Bpe.train(corpus, "text", nMerges = 8)
      .select("lhs", "rhs", "cnt").as[(String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("train on a run-heavy word merges non-overlapping left-to-right") {
    // "aaaa": pairs (a,a)=3 from one word of freq 2 -> 6; greedy merge gives
    // [aa, aa, </w>], NOT [aa, a, a, </w>] or overlap-counted variants
    val df = Seq((0L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", nMerges = 2)
      .select("lhs", "rhs", "cnt").as[(String, String, Long)].collect()
    assert(merges(0) == ("a", "a", 6L))
    // after merge 1 every word is [aa, aa, </w>] x2 -> (aa,aa)=2, (aa,</w>)=2;
    // lexical tie-break: "</w>" < "aa", so rhs "</w>" sorts first
    assert(merges(1) == ("aa", "</w>", 2L))
  }

  test("train stops early when fully merged") {
    val df = Seq((0L, "ab ab")).toDF("doc_id", "text")
    // ab -> [a,b,</w>]: merges (a,b), (ab,</w>), then nothing left
    val merges = Bpe.train(df, "text", nMerges = 10).collect()
    assert(merges.length == 2)
  }

  test("applyBpe segments corpus words into train's final vocab state") {
    // evolve the naive vocab through the trained merges; every corpus
    // word's segmentation must equal its end-state symbol sequence
    val texts = corpus.select("text").as[String].collect().toSeq
    val mergeList = Bpe.train(corpus, "text", nMerges = 5)
      .select("lhs", "rhs").as[(String, String)].collect().toSeq
    var v = naiveVocab(texts).keys.map(s => s -> s).toMap // start -> current
    mergeList.foreach { case (l, r) =>
      v = v.map { case (k, s) => k -> naiveMergeWord(s, l, r) }
    }
    val expectedByWord = v.map { case (orig, fin) =>
      orig.dropRight(1).mkString -> fin // key: the word without end marker
    }
    val got = Bpe.applyBpe(corpus, "doc_id", "text", mergeList)
      .select("doc_id", "subwords").as[(Long, Seq[String])].collect().toMap
    val docs = corpus.select("doc_id", "text").as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val expect = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => expectedByWord(w)).toSeq
      assert(got(id) == expect, s"doc $id")
    }
  }

  test("applyBpe handles OOV words and empty merge lists") {
    val mergeList = Seq(("l", "o"), ("lo", "w"))
    val df = Seq((0L, "low lox zzz")).toDF("doc_id", "text")
    val r = Bpe.applyBpe(df, "doc_id", "text", mergeList)
      .select("subwords").as[Seq[String]].head()
    // "low" fully merges, "lox" partially (lo+x), "zzz" not at all
    assert(r == Seq("low", "</w>", "lo", "x", "</w>", "z", "z", "z", "</w>"))
    val none = Bpe.applyBpe(df, "doc_id", "text", Nil)
      .select("n_subwords").as[Long].head()
    assert(none == 3 + 1 + 3 + 1 + 3 + 1)
  }

  test("phraseScores ranks a planted collocation above loosely-associated pairs") {
    // "zz qq": both tokens occur ONLY in this bigram (perfect association).
    // "uu vv": each occurs 20 times but adjacent in only 5 docs.
    // "big"/"data": frequent, never adjacent -> must be absent entirely.
    val rows =
      (0 until 10).map(i => (i.toLong, "zz qq big table data")) ++
      (10 until 15).map(i => (i.toLong, "uu vv big row data")) ++
      (15 until 30).map(i => (i.toLong, "uu lake vv data big"))
    val df = rows.toDF("doc_id", "text")
    val r = TextAnalysis.phraseScores(df, "doc_id", "text",
      minCount = 2L, delta = 0.0, topK = 20)
      .select("lhs", "rhs", "score").as[(String, String, Double)].collect()
    val byPair = r.map(p => (p._1, p._2) -> p._3).toMap
    assert((r.head._1, r.head._2) == ("zz", "qq"))
    assert(byPair(("zz", "qq")) > byPair(("uu", "vv")))
    assert(!byPair.contains(("big", "data")))
  }

  test("phraseScores score formula matches hand computation") {
    // corpus: "a b" x4 plus "a" x4, "b" x4 as singles -> c_a=8, c_b=8,
    // c_ab=4, N=16; delta=1 -> score = (4-1)*16/(8*8) = 0.75
    val df = ((0 until 4).map(i => (i.toLong, "a b")) ++
      (4 until 8).map(i => (i.toLong, "a")) ++
      (8 until 12).map(i => (i.toLong, "b"))).toDF("doc_id", "text")
    val r = TextAnalysis.phraseScores(df, "doc_id", "text",
      minCount = 1L, delta = 1.0, topK = 5)
      .select("lhs", "rhs", "pair_cnt", "score")
      .as[(String, String, Long, Double)].collect()
    assert(r.length == 1)
    assert(r.head == ("a", "b", 4L, 0.75))
  }

  test("bigram LM: hand-computed interpolated perplexity") {
    // corpus: "a b" x2, "a c" x1 -> uni a=3 b=2 c=1, N=6;
    // bigrams (a,b)=2, (a,c)=1
    val df = Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.lmPerplexityInterp(df, "doc_id", "text", lambda = 0.75)
      .select("id", "n_tokens", "ppl").as[(Long, Long, Double)]
      .collect().map(x => x._1 -> (x._2, x._3)).toMap
    val pFirstA = 3.0 / 6
    val pAB = 0.75 * 2 / 3 + 0.25 * (2.0 / 6)
    val pAC = 0.75 * 1 / 3 + 0.25 * (1.0 / 6)
    val ppl0 = math.exp((-math.log(pFirstA) - math.log(pAB)) / 2)
    val ppl2 = math.exp((-math.log(pFirstA) - math.log(pAC)) / 2)
    assert(r(0L)._1 == 2L && math.abs(r(0L)._2 - ppl0) < 1e-9)
    assert(math.abs(r(2L)._2 - ppl2) < 1e-9)
    // the rarer continuation must cost more
    assert(r(2L)._2 > r(0L)._2)
  }

  test("bigram LM: rare continuation prices higher, stays finite") {
    // self-scoring: (b,a) occurs once (from doc 2 itself) vs (a,b) twice;
    // the interpolation floor keeps even count-1 grams finite
    val df = Seq((0L, "a b"), (1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val r = TextAnalysis.lmPerplexityInterp(df, "doc_id", "text")
      .select("id", "ppl").as[(Long, Double)].collect().toMap
    assert(r(2L).isFinite && r(2L) > r(0L))
  }

  test("Kneser-Ney bigram: hand-computed discounted perplexity") {
    // corpus: "a b" x2, "a c", "d" -> uni a=3 b=2 c=1 d=1 (nv=4);
    // bigram types (a,b) bf=2, (a,c) bf=1 (nt=2); fol(a)=2;
    // pre(b)=pre(c)=1, pre(a)=pre(d)=0 -> pcont=(pre+1)/6
    val df = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "d"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.lmPerplexityKn(df, "doc_id", "text", discount = 0.75)
      .select("id", "n_tokens", "ppl").as[(Long, Long, Double)]
      .collect().map(x => x._1 -> (x._2, x._3)).toMap
    val pFirstA = 1.0 / 6 // pcont(a)
    val pAB = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (2.0 / 6)
    val pAC = (1 - 0.75) / 3 + 0.75 * 2 / 3 * (2.0 / 6)
    val ppl0 = math.exp((-math.log(pFirstA) - math.log(pAB)) / 2)
    val ppl2 = math.exp((-math.log(pFirstA) - math.log(pAC)) / 2)
    assert(r(0L)._1 == 2L && math.abs(r(0L)._2 - ppl0) < 1e-9)
    assert(math.abs(r(2L)._2 - ppl2) < 1e-9)
    // rarer continuation prices higher under the discount too
    assert(r(2L)._2 > r(0L)._2)
    // doc-initial-only word: the add-one continuation floor keeps it
    // finite — pcont(d) = 1/6, so ppl = 6 exactly
    assert(r(3L)._1 == 1L && math.abs(r(3L)._2 - 6.0) < 1e-9)
  }

  test("dsir: target-like documents outweigh off-target ones") {
    // target = lang 'en'; doc 10 is English-vocab but UNLABELED (lang 'xx'),
    // doc 11 is German-vocab. DSIR should weight 10 above 11 even though
    // neither is in the target set.
    val df = (
      (0 until 8).map(i => (i.toLong, "the quick brown fox runs fast", "en")) ++
      (8 until 10).map(i => (i.toLong, "der schnelle braune fuchs hier", "de")) ++
      Seq((10L, "the quick brown fox runs fast", "xx"),
          (11L, "der schnelle braune fuchs hier", "xx"))
    ).toDF("doc_id", "text", "lang")
    val w = TextAnalysis.dsirWeights(df, "doc_id", "text",
      col("lang") === "en", nBuckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w(10L) > w(11L))
    assert(w(0L) > 0.0 && w(8L) < 0.0)
  }

  test("dsir: target == source collapses every weight to zero") {
    val df = Seq((0L, "a b c"), (1L, "d e f"), (2L, "a a a")).toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(df, "doc_id", "text", lit(true))
      .as[(Long, Double)].collect()
    assert(w.length == 3 && w.forall(_._2 == 0.0))
  }

  test("dsirSelect is deterministic and honors topK") {
    val df = (0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) "alpha beta gamma" else "delta epsilon zeta",
        if (i % 4 == 0) "en" else "xx")).toDF("doc_id", "text", "lang")
    val s1 = TextAnalysis.dsirSelect(df, "doc_id", "text",
      col("lang") === "en", nBuckets = 64, topK = 10).collect()
    val s2 = TextAnalysis.dsirSelect(df, "doc_id", "text",
      col("lang") === "en", nBuckets = 64, topK = 10).collect()
    assert(s1.length == 10)
    assert(s1.map(_.toString).toSeq == s2.map(_.toString).toSeq)
    // target-vocab docs (even ids) should dominate the selection
    val evens = s1.map(_.getLong(0)).count(_ % 2 == 0)
    assert(evens >= 8)
  }

  test("dsir index: scoring the build corpus equals in-memory dsirWeights") {
    val df = (0 until 30).map(i =>
      (i.toLong, if (i % 3 == 0) "alpha beta gamma delta" else "epsilon zeta eta",
        if (i % 3 == 0) "en" else "xx")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("dsir_idx_spec").toString
    TextAnalysis.buildDsirIndex(df, "doc_id", "text", col("lang") === "en",
      dir, nBuckets = 64)
    val stored = TextAnalysis.scoreDsirIndexed(spark, dir, df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    val mem = TextAnalysis.dsirWeights(df, "doc_id", "text",
      col("lang") === "en", nBuckets = 64).as[(Long, Double)].collect().toMap
    assert(stored == mem) // every in-corpus bucket is stored -> identical
  }

  test("dsir index: build+append equals build-on-union; OOV priced not dropped") {
    val a = (0 until 20).map(i => (i.toLong, "alpha beta gamma", "en"))
      .toDF("doc_id", "text", "lang")
    val b = (20 until 30).map(i => (i.toLong, "delta epsilon zeta", "xx"))
      .toDF("doc_id", "text", "lang")
    val probe = Seq((100L, "alpha beta unseen tokens here"))
      .toDF("doc_id", "text")
    val d1 = java.nio.file.Files.createTempDirectory("dsir_inc").toString
    TextAnalysis.buildDsirIndex(a, "doc_id", "text", col("lang") === "en",
      d1, nBuckets = 64)
    TextAnalysis.appendToDsirIndex(b, "doc_id", "text",
      col("lang") === "en", d1)
    val d2 = java.nio.file.Files.createTempDirectory("dsir_full").toString
    TextAnalysis.buildDsirIndex(a.unionByName(b), "doc_id", "text",
      col("lang") === "en", d2, nBuckets = 64)
    val s1 = TextAnalysis.scoreDsirIndexed(spark, d1, probe, "doc_id", "text")
      .as[(Long, Double)].head()
    val s2 = TextAnalysis.scoreDsirIndexed(spark, d2, probe, "doc_id", "text")
      .as[(Long, Double)].head()
    assert(s1 == s2)
    assert(s1._2 != 0.0) // OOV features contribute the smoothing default
  }

  test("dsir streaming sink: redelivered batch folds nothing (exactly-once)") {
    import graft.streaming.DedupStream
    val dir = java.nio.file.Files.createTempDirectory("dsir_stream").toString
    val b0 = (0 until 10).map(i => (i.toLong, "alpha beta", "en"))
      .toDF("doc_id", "text", "lang")
    val b1 = (10 until 20).map(i => (i.toLong, "gamma delta", "xx"))
      .toDF("doc_id", "text", "lang")
    TextAnalysis.buildDsirIndex(b0.limit(0), "doc_id", "text",
      col("lang") === "en", dir, nBuckets = 64)
    DedupStream.processDsirBatch(b0, 0L, "doc_id", "text",
      col("lang") === "en", dir)
    DedupStream.processDsirBatch(b1, 1L, "doc_id", "text",
      col("lang") === "en", dir)
    val probe = Seq((99L, "alpha beta gamma")).toDF("doc_id", "text")
    val before = TextAnalysis.scoreDsirIndexed(spark, dir, probe,
      "doc_id", "text").as[(Long, Double)].head()
    // replay both batches: high-watermark must swallow them
    DedupStream.processDsirBatch(b0, 0L, "doc_id", "text",
      col("lang") === "en", dir)
    DedupStream.processDsirBatch(b1, 1L, "doc_id", "text",
      col("lang") === "en", dir)
    val after = TextAnalysis.scoreDsirIndexed(spark, dir, probe,
      "doc_id", "text").as[(Long, Double)].head()
    assert(before == after)
  }

  test("collapseRuns removes consecutive repeats only") {
    val df = Seq(
      (0L, "the the the quick fox fox"),
      (1L, "a b a b a"), // alternation: nothing to remove
      (2L, "x"),
      (3L, "y y y y y")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.collapseRuns(df, "doc_id", "text")
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(r(0) == (0L, "the quick fox", 3L))
    assert(r(1) == (1L, "a b a b a", 0L))
    assert(r(2) == (2L, "x", 0L))
    assert(r(3) == (3L, "y", 4L))
  }

  test("collapseRuns is idempotent and preserves non-run content order") {
    val df = Seq((0L, "k1 k1 k2 k3 k3 k3 k2 k2 k1")).toDF("doc_id", "text")
    val once = TextAnalysis.collapseRuns(df, "doc_id", "text")
    val c1 = once.select("clean_text").as[String].head()
    assert(c1 == "k1 k2 k3 k2 k1")
    val twice = TextAnalysis.collapseRuns(
      once.withColumnRenamed("clean_text", "text"), "doc_id", "text")
    assert(twice.select("clean_text").as[String].head() == c1)
    assert(twice.select("n_removed").as[Long].head() == 0L)
  }

  private def microNats(x: Double): Long = math.round(math.log(x) * 1e6)

  test("nbClassify: hand-computed micro-nat scores and argmax") {
    // train: en {the x2, cat, dog} ctot=4; de {der, hund} ctot=2; V=5;
    // priors en 2/3, de 1/3. Score "the":
    //   en: micro(2/3) + micro((2+1)/(4+5)); de: micro(1/3) + micro(1/7)
    val train = Seq((0L, "the cat", "en"), (1L, "the dog", "en"),
      (2L, "der hund", "de")).toDF("doc_id", "text", "lang")
    val score = Seq((10L, "the")).toDF("doc_id", "text")
    val r = TextAnalysis.nbClassify(train, score, "doc_id", "text", "lang")
      .select("id", "pred", "score_micro").as[(Long, String, Long)]
      .collect()
    assert(r.length == 1)
    val expEn = microNats(2.0 / 3) + microNats(3.0 / 9)
    assert(r.head == (10L, "en", expEn))
  }

  test("nbClassify: exact tie breaks on the smallest class") {
    // two classes with identical token distributions and priors -> equal
    // integer scores; argmax must pick the lexicographically first class
    val train = Seq((0L, "x y", "b"), (1L, "x y", "a"))
      .toDF("doc_id", "text", "lang")
    val score = Seq((5L, "x y x")).toDF("doc_id", "text")
    val r = TextAnalysis.nbClassify(train, score, "doc_id", "text", "lang")
      .select("pred").as[String].collect()
    assert(r.toSeq == Seq("a"))
  }

  test("nbClassify: unseen tokens price at the smoothing floor; empty docs drop") {
    val train = Seq((0L, "the cat sat", "en"), (1L, "der hund lief", "de"))
      .toDF("doc_id", "text", "lang")
    val score = Seq((7L, "zzz qqq"), (8L, "  "), (9L, "der der"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.nbClassify(train, score, "doc_id", "text", "lang")
      .select("id", "pred").as[(Long, String)].collect().toMap
    assert(!out.contains(8L)) // no tokens -> no row
    assert(out(9L) == "de")
    // both classes have ctot=3, V=6: the unseen floor is identical, so the
    // all-unseen doc falls back to the (equal) prior and the class tie-break
    assert(out(7L) == "de")
  }

  test("heavyGrams == exact groupBy-having; sloppy sketch stays exact") {
    val docs = (0L until 60L).map { i =>
      // planted boilerplate every third doc; the rest is low-frequency
      val body = if (i % 3 == 0) "all rights reserved by us"
      else (0 until 5).map(j => s"u${i}x$j").mkString(" ")
      (i, s"doc $i starts $body")
    }.toDF("doc_id", "text")
    def grams(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getAs[String]("gram") -> r.getAs[Long]("cnt")).toMap
    val exact = docs.select(explode(expr(
      "transform(sequence(0, size(split(trim(text), '\\\\s+')) - 3), " +
        "j -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), j + 1, 3)))"))
      .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 4).collect()
      .map(r => r.getAs[String]("gram") -> r.getAs[Long]("cnt")).toMap
    val sk = grams(TextAnalysis.heavyGrams(docs, "text", 3, 4))
    assert(sk == exact)
    assert(sk.contains("all rights reserved") && sk("all rights reserved") == 20L)
    // a sketch too small to separate anything still cannot change the
    // output: collisions only ADD candidates, and the recount drops them
    val sloppy = grams(TextAnalysis.heavyGrams(docs, "text", 3, 4, eps = 0.5))
    assert(sloppy == exact)
  }

  private def md5Bucket(tok: String, dim: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (BigInt(d.substring(0, 15), 16) % dim).toInt
  }

  test("tfidfHashedVectors: hand-computed integer micro-weights at md5 buckets") {
    // 2 docs: "a a b" and "c". idf_micro(a)=idf_micro(b)=
    //   round(ln(3/2)*1e6)+1e6 (df=1 of n=2); same for c
    val df = Seq((0L, "a a b"), (1L, "c")).toDF("doc_id", "text")
    val idfM = math.round(math.log(3.0 / 2.0) * 1e6) + 1000000L
    val vecs = TextAnalysis.tfidfHashedVectors(df, "doc_id", "text", dim = 64)
      .select("vec_id", "embedding").as[(Long, Array[Double])]
      .collect().toMap
    val exp0 = Array.fill(64)(0.0)
    exp0(md5Bucket("a", 64)) += 2.0 * idfM
    exp0(md5Bucket("b", 64)) += 1.0 * idfM
    val exp1 = Array.fill(64)(0.0)
    exp1(md5Bucket("c", 64)) += 1.0 * idfM
    assert(vecs(0L).sameElements(exp0))
    assert(vecs(1L).sameElements(exp1))
  }

  test("tfidfHashedVectors: partitioning-invariant (exact integer sums)") {
    val df = (0L until 40L)
      .map(i => (i, (0 until 12).map(j => s"t${(i * 7 + j) % 19}").mkString(" ")))
      .toDF("doc_id", "text")
    def vecs(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.tfidfHashedVectors(d, "doc_id", "text", 64)
        .select("vec_id", "embedding").as[(Long, Array[Double])]
        .collect().toMap
    val a = vecs(df.repartition(1))
    val b = vecs(df.repartition(17, col("text")))
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    assert(a.forall { case (k, v) => v.sameElements(b(k)) })
  }

  test("textClusters: disjoint-vocabulary families separate at k=2") {
    val docs = ((0L until 10L).map(i =>
      (i, (0 until 10).map(j => s"alpha${j}x").mkString(" "))) ++
      (10L until 20L).map(i =>
        (i, (0 until 10).map(j => s"beta${j}y").mkString(" "))))
      .toDF("doc_id", "text")
    val lab = TextAnalysis.textClusters(docs, "doc_id", "text", k = 2)
      .select("doc_id", "label").as[(Long, Int)].collect().toMap
    val fam0 = (0L until 10L).map(lab).toSet
    val fam1 = (10L until 20L).map(lab).toSet
    assert(fam0.size == 1 && fam1.size == 1 && fam0 != fam1,
      s"families not separated: $fam0 vs $fam1")
  }

  test("nbClassify: self-classification recovers the training label on clean classes") {
    val train = ((0 until 6).map(i => (i.toLong, "the cat sat on the mat", "en")) ++
      (6 until 12).map(i => (i.toLong, "der hund lief im park schnell", "de")))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.nbClassify(train, train, "doc_id", "text", "lang")
      .select("id", "pred").as[(Long, String)].collect()
    assert(r.length == 12)
    assert(r.forall { case (id, p) => if (id < 6) p == "en" else p == "de" })
  }
}

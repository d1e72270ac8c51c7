package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher rule battery + positional phrase search. */
class TextGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gopherRules: each rule fires on its own violation") {
    val good = (Seq.fill(20)("the quick brown fox and that dog have fun with") :+ "end")
      .mkString(" ") // 201 words, all alphabetic, stopword-rich
    val docs = Seq(
      (1L, good),
      (2L, "too short to pass"),                      // ok_words fails
      (3L, Seq.fill(60)("a").mkString(" ")),          // mean len 1 < 3
      (4L, Seq.fill(60)("### #### ##").mkString(" ")), // symbols + alpha fail
      (5L, Seq.fill(60)("zz9 qq8 ww7").mkString(" ")) // no required stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .orderBy("id").collect()
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[Boolean]("pass"))
    assert(!byId(2L).getAs[Boolean]("ok_words") && !byId(2L).getAs[Boolean]("pass"))
    assert(!byId(3L).getAs[Boolean]("ok_mean_len"))
    assert(!byId(4L).getAs[Boolean]("ok_symbols"))
    assert(!byId(4L).getAs[Boolean]("ok_alpha"))
    assert(!byId(5L).getAs[Boolean]("ok_stops"))
    // feature sanity: doc 3 mean word length is exactly 1
    assert(byId(3L).getAs[Double]("mean_word_len") == 1.0)
    assert(byId(1L).getAs[Int]("stop_hits") >= 2)
  }

  test("gopherRules: symbol ratio counts # chars and ... runs") {
    val docs = Seq((1L, "a b ... c # ## ...")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text").collect().head
    // 7 words; 3 hash marks + 2 ellipses = 5 symbols
    assert(r.getAs[Long]("n_words") == 7L)
    assert(math.abs(r.getAs[Double]("symbol_ratio") - 5.0 / 7.0) < 1e-3)
  }

  test("phraseSearch counts overlapping consecutive-token matches") {
    val docs = Seq(
      (1L, "x table hash y table hash"),
      (2L, "table y hash"),          // non-adjacent: no match
      (3L, "TABLE HASH"),            // case-insensitive
      (4L, "hash table"),            // wrong order
      (5L, "table table hash")       // one match at pos 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearch(docs, "doc_id", "text",
        Seq("table", "hash"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_matches"))
      .toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 5L -> 1L))
  }

  test("searchPhraseIndexed == phraseSearch on the same corpus") {
    val docs = Seq(
      (1L, "x table hash y table hash"),
      (2L, "table y hash"),
      (3L, "TABLE HASH mixed case"),
      (4L, "no match here at all")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("phraseidx").toString
    TextAnalysis.buildPositionalIndex(docs, "doc_id", "text", dir, nBuckets = 8)
    val mem = TextAnalysis.phraseSearch(docs, "doc_id", "text",
      Seq("table", "hash")).orderBy("id").collect().toSeq
    val idx = TextAnalysis.searchPhraseIndexed(spark, dir,
      Seq("table", "hash")).orderBy("id").collect().toSeq
    assert(mem == idx)
    // pruning: the plan reads only the phrase terms' tb partitions
    val plan = TextAnalysis.searchPhraseIndexed(spark, dir,
      Seq("table", "hash")).queryExecution.executedPlan.toString
    assert(plan.contains("tb"))
  }

  test("appendToPositionalIndex folds a batch; search == full rebuild") {
    val first = Seq((1L, "table hash x"), (2L, "y table hash"))
      .toDF("doc_id", "text")
    val batch = Seq((3L, "table hash table hash")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("phraseappend").toString
    TextAnalysis.buildPositionalIndex(first, "doc_id", "text", dir, nBuckets = 8)
    TextAnalysis.appendToPositionalIndex(batch, "doc_id", "text", dir)
    val got = TextAnalysis.searchPhraseIndexed(spark, dir, Seq("table", "hash"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_matches"))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("phraseSearch matches a driver-side sliding-window count on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c", "d")
    for (round <- 0 until 3) {
      val docs = (0 until 40).map { i =>
        (i.toLong, Array.fill(5 + rnd.nextInt(30))(
          vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val phrase = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.length)))
      val expected = docs.flatMap { case (id, text) =>
        val w = text.split(" ")
        val n = w.sliding(phrase.length).count(_.sameElements(phrase))
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      val got = TextAnalysis.phraseSearch(docs.toDF("doc_id", "text"),
          "doc_id", "text", phrase)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_matches"))
        .toMap
      assert(got == expected, s"round $round phrase=${phrase.mkString(" ")}")
    }
  }

  test("phraseSearch three-term phrase intersects all position lists") {
    val docs = Seq(
      (1L, "a b c a b c a b"),
      (2L, "a b x c"),
      (3L, "c b a")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearch(docs, "doc_id", "text",
        Seq("a", "b", "c"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_matches"))
      .toMap
    assert(out == Map(1L -> 2L))
  }
}

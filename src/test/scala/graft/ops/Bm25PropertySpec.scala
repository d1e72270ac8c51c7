package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential check of the relational BM25 against a plain
  * Scala reference implementation: random corpora and (k1, b) parameters,
  * exact agreement on the matched-doc set and 1e-9 agreement on scores —
  * the fixed-corpus unit test's sweep-across-parameter-space companion.
  */
class Bm25PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceBm25(docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double, b: Double): Map[Long, (Double, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.length).sum / n
    val tq = terms.map(_.toLowerCase)
    val df = tq.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    docs.flatMap { case (id, _) =>
      val dl = toks(id).length.toDouble
      val matched = tq.filter(t => toks(id).contains(t))
      if (matched.isEmpty) None
      else {
        val score = matched.map { t =>
          val tf = toks(id).count(_ == t).toDouble
          math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
            tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        }.sum
        Some(id -> (score, matched.size.toLong))
      }
    }.toMap
  }

  test("bm25 == scala reference over random corpora and parameters") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 30).map(i => s"w$i")
    for (trial <- 0 until 4) {
      val k1 = 0.5 + rnd.nextDouble() * 2
      val b = rnd.nextDouble()
      val docs = (0L until 50L).map { i =>
        val len = 3 + rnd.nextInt(20)
        (i, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val terms = Seq(vocab(rnd.nextInt(vocab.size)),
        vocab(rnd.nextInt(vocab.size)), "neverpresent")
      val want = referenceBm25(docs, terms, k1, b)
      // topK = corpus size: every matched doc must appear, exactly once
      val got = TextAnalysis.bm25(docs.toDF("doc_id", "text"), "doc_id",
        "text", terms, k1 = k1, b = b, topK = docs.size)
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Double]("score"), r.getAs[Long]("n_matched"))).toMap
      assert(got.keySet == want.keySet, s"trial $trial (k1=$k1, b=$b)")
      got.foreach { case (id, (s, m)) =>
        assert(m == want(id)._2, s"trial $trial doc $id n_matched")
        assert(math.abs(s - want(id)._1) < 1e-9,
          s"trial $trial doc $id score $s vs ${want(id)._1}")
      }
      assert(want.nonEmpty)
    }
  }

  test("indexed BM25 == in-memory bm25; appends fold; partitions prune; replay appends nothing") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0L until 120L).map { i =>
      (i, (0 until 6 + rnd.nextInt(20))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val terms = Seq("w3", "w17", "w31")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("id", "score", "n_matched")
      .as[(Long, Double, Long)].collect().toSeq
    val mem = rows(TextAnalysis.bm25(docs.toDF("doc_id", "text"),
      "doc_id", "text", terms, topK = 200))

    val dir = java.nio.file.Files.createTempDirectory("bm25prop").toString
    TextAnalysis.buildBm25Index(docs.take(80).toDF("doc_id", "text"),
      "doc_id", "text", dir, nBuckets = 16)
    TextAnalysis.appendToBm25Index(docs.drop(80).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val idx = TextAnalysis.searchBm25Indexed(spark, dir, terms, topK = 200)
    assert(rows(idx) == mem && mem.nonEmpty)

    // the posting scan must carry a tb partition filter (directory prune)
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb"),
      "posting scan lost its bucket partition filter")

    // exactly-once streaming ingest: a redelivered batch folds nothing
    val dir2 = java.nio.file.Files.createTempDirectory("bm25sink").toString
    TextAnalysis.buildBm25Index(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      dir2, nBuckets = 16)
    graft.streaming.DedupStream.processBm25Batch(
      docs.take(80).toDF("doc_id", "text"), 0L, "doc_id", "text", dir2)
    graft.streaming.DedupStream.processBm25Batch(
      docs.drop(80).toDF("doc_id", "text"), 1L, "doc_id", "text", dir2)
    val once = rows(TextAnalysis.searchBm25Indexed(spark, dir2, terms,
      topK = 200))
    assert(once == mem)
    graft.streaming.DedupStream.processBm25Batch(
      docs.drop(80).toDF("doc_id", "text"), 1L, "doc_id", "text", dir2)
    assert(rows(TextAnalysis.searchBm25Indexed(spark, dir2, terms,
      topK = 200)) == mem, "replayed batch changed the index")
  }
}

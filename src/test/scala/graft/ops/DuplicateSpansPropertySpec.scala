package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential test: Dedup.duplicateSpans vs an independent
  * naive single-machine implementation (brute-force hash-map windows +
  * linear interval merge). The DuckDB oracle replays the same relational
  * construction, so this spec is the check that the CONSTRUCTION itself
  * matches the intended semantics.
  */
class DuplicateSpansPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Naive reference: every w-window string, global occurrence count,
    * per-doc merge of duplicate windows (overlap OR adjacency).
    */
  private def naive(docs: Seq[(Long, String)], w: Int)
      : Set[(Long, Int, Int, Long)] = {
    val wins = docs.flatMap { case (id, text) =>
      val t = text.split("\\s+")
      (0 to t.length - w).map(i => (id, i, t.slice(i, i + w).mkString(" ")))
    }
    val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
    wins.filter(r => occ(r._3) >= 2)
      .groupBy(_._1)
      .flatMap { case (id, rs) =>
        val starts = rs.map(_._2).sorted
        val spans = scala.collection.mutable.ListBuffer[(Int, Int, Long)]()
        for (s <- starts) {
          val e = s + w - 1
          if (spans.nonEmpty && s <= spans.last._2 + 1) {
            val (ls, le, ln) = spans.remove(spans.length - 1)
            spans += ((ls, math.max(le, e), ln + 1))
          } else spans += ((s, e, 1L))
        }
        spans.map { case (s, e, n) => (id, s, e, n) }
      }.toSet
  }

  test("duplicateSpans == naive implementation on random repetitive corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val vocab = (0 until 6).map(i => s"t$i") // small vocab -> collisions
      val docs = (0L until 20L).map { id =>
        val n = 5 + rnd.nextInt(25)
        (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val w = 3 + rnd.nextInt(3) // 3..5
      val expected = naive(docs, w)
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", w = w, minOccurrences = 2)
        .select("id", "span_start", "span_end", "n_windows")
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(got == expected, s"trial $trial (w=$w) diverged")
    }
  }
}

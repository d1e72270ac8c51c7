package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Blocked edit-distance fuzzy pairs. */
class EditDistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("editDistancePairs finds typo-scale pairs inside a block only") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta epsilon"),
      (2L, "en", "alpha beta gamma delta epsilom"),   // 1 edit from 1
      (3L, "en", "alpha completely different text here"), // same block, far
      (4L, "de", "alpha beta gamma delta epsilon"),   // other lang: blocked out
      (5L, "en", "zeta beta gamma delta epsilon")     // other first token
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text",
        blockCols = Seq("lang"), prefixLen = 60, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 1)))
  }

  test("length banding drops pairs whose lengths differ by > one bucket") {
    val docs = Seq(
      (1L, "en", "aa " + ("x" * 10)),
      (2L, "en", "aa " + ("x" * 200)) // same first word, 4 buckets apart
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), prefixLen = 10, maxDist = 10, lenBucket = 50)
    assert(out.count() == 0)
  }

  test("pairs are canonical a < b and respect maxDist exactly") {
    val docs = Seq(
      (10L, "en", "w abcde"),
      (7L, "en", "w abxde"),   // ed 1 on prefix
      (9L, "en", "w vwxyz")    // ed 5
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text",
        blockCols = Seq("lang"), prefixLen = 10, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.forall { case (a, b, _) => a < b })
    // 7↔9 is 4 substitutions (abxde→vwxyz) — just over the budget
    assert(out.toSet == Set((7L, 10L, 1)))
  }
}

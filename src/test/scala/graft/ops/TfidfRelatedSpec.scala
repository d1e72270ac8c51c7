package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TF-IDF related docs: hand-checkable neighbor structure and the df-cap
  * guard (hot terms carry no pairs).
  */
class TfidfRelatedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // docs 1/2 share rare "alpha beta"; 3 shares only the hot "the" with
  // them; 4 is disjoint
  private def docs() = Seq(
    (1L, "the alpha beta one"),
    (2L, "the alpha beta two"),
    (3L, "the gamma delta"),
    (4L, "epsilon zeta")
  ).toDF("doc_id", "text")

  test("rare shared terms pair docs; hot terms above dfCap do not") {
    val got = TextAnalysis.tfidfRelated(docs(), "doc_id", "text", 4L,
      k = 3, dfCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1 <-> 2 via alpha/beta; "the" (df=3 > cap) must NOT pair 3 with 1/2
    assert(got == Set((1L, 2L), (2L, 1L)))
  }

  test("top-1 neighbor weighs tf: the alpha-heavy doc wins the tie") {
    val extra = docs().union(Seq((5L, "alpha alpha alpha beta five"))
      .toDF("doc_id", "text"))
    val got = TextAnalysis.tfidfRelated(extra, "doc_id", "text", 5L,
      k = 1, dfCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // cos(1,5) = 0.249 > cos(1,2) = 0.232 (hand-computed): 5's tf = 3 on
    // "alpha" outweighs 2's identical-but-flat profile
    assert(got(1L) == 5L && got(2L) == 5L)
    assert(Set(1L, 2L).contains(got(5L)))
  }

  test("self-pairs never appear and rank starts at 1") {
    val df = TextAnalysis.tfidfRelated(docs(), "doc_id", "text", 4L,
      k = 3, dfCap = 10)
    assert(df.filter(col("doc_id") === col("related_id")).count() == 0)
    assert(df.groupBy("doc_id").agg(min("rank")).collect()
      .forall(_.getInt(1) == 1))
  }
}

package graft.bio

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5 properties: count-filter monotonicity and exact ⊆ expanded
  * hit-set containment, through the real prefilter.
  */
class PrefilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seqsDf = {
    val rnd = new scala.util.Random(5)
    val A = Matrices.KmerAlphabet
    // families of related sequences: mutate a base sequence
    val base = Array.fill(80)(A(rnd.nextInt(20)))
    val seqs = (0 until 10).map { i =>
      val s = base.clone()
      (0 until i * 3).foreach(_ => s(rnd.nextInt(80)) = A(rnd.nextInt(20)))
      (i.toLong, new String(s), 80)
    }
    seqs.toDF("seqId", "seq", "seqLen")
  }

  test("count-filter is monotone in requiredKmerMatches") {
    val df = seqsDf.cache()
    val index = KmerIndex.buildWithPos(df)
    val qk = Prefilter.queryKmers(df)
    def pairs(min: Int) =
      Prefilter.runWithDiag(qk, index, min)
        .select("targetId", "queryId").distinct()
        .as[(Long, Long)].collect().toSet
    val p2 = pairs(2)
    val p5 = pairs(5)
    assert(p5.subsetOf(p2))
    assert(p2.nonEmpty)
  }

  test("exact-match hit set is a subset of the expanded hit set") {
    val df = seqsDf.cache()
    val index = KmerIndex.buildWithPos(df)
    val exact = QueryTable.build(spark, df,
      QueryTable.Config(exactKmerMatching = true, maskMode = false,
        biasCorrection = false))
    val expanded = QueryTable.build(spark, df,
      QueryTable.Config(maskMode = false, biasCorrection = false))
    def hits(qk: org.apache.spark.sql.DataFrame) =
      Prefilter.runWithDiag(qk, index, 2)
        .select("targetId", "queryId").distinct()
        .as[(Long, Long)].collect().toSet
    val he = hits(exact)
    val hx = hits(expanded)
    assert(he.subsetOf(hx))
  }
}

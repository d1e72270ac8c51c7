package graft.bio

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Frozen end-to-end regression: the flagship self-search must reproduce
  * the exact (query, target, bits) hit set captured at round-1 freeze
  * (`golden_selfsearch.tsv`). Any intentional semantic change must
  * regenerate the golden file and say why in the commit.
  */
class GoldenRegressionSpec extends AnyFunSuite {
  test("self-search reproduces the frozen golden hit set") {
    val spark = TestSpark.spark
    import spark.implicits._
    val expected = {
      val src = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/golden_selfsearch.tsv"), "UTF-8")
      try src.getLines().toSet finally src.close()
    }
    val got = graft.SparkEntry.entry(spark)
      .select("qname", "tname", "bits").as[(String, String, Int)]
      .collect().map { case (q, t, b) => s"$q\t$t\t$b" }.toSet
    assert(got == expected,
      s"golden drift: missing=${(expected -- got).take(5)}, new=${(got -- expected).take(5)}")
  }
}

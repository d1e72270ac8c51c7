package graft.bio

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("header accession extraction handles db|ACC| style and plain tokens") {
    import spark.implicits._
    val rows = Seq(
      "sp|P12345|NAME_HUMAN some description",
      "plainName rest of header",
      "  leadingSpaces desc")
      .toDF("header")
      .select(Fasta.parseFastaHeaderCol($"header").as("name"))
      .as[String].collect()
    assert(rows.toSeq == Seq("P12345", "plainName", "leadingSpaces"))
  }

  test("toM8Custom rejects unknown columns with a clear error") {
    import spark.implicits._
    val seqs = Seq((0L, "h", "h", "MKVLATTPFG", 10))
      .toDF("seqId", "header", "name", "seq", "seqLen")
    val alis = PetaSearch.search(spark, seqs.cache(), seqs,
      PetaSearch.Params(query = QueryTable.Config(maskMode = false)))
    val e = intercept[IllegalArgumentException] {
      PetaSearch.toM8Custom(alis, seqs, seqs, Seq("query", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("empty query set produces empty results, not an error") {
    import spark.implicits._
    val targets = Seq((0L, "h", "h", "MKVLATTPFGWSDEWIRRQ", 19))
      .toDF("seqId", "header", "name", "seq", "seqLen").cache()
    val noQueries = targets.filter($"seqId" < 0)
    val alis = PetaSearch.search(spark, noQueries, targets)
    assert(alis.count() == 0)
  }

  test("sequences shorter than k contribute no k-mers and no hits") {
    import spark.implicits._
    val seqs = Seq((0L, "h", "h", "MKV", 3))
      .toDF("seqId", "header", "name", "seq", "seqLen").cache()
    assert(PetaSearch.search(spark, seqs, seqs).count() == 0)
  }

  test("SkewJoin with buckets=1 equals plain join") {
    import spark.implicits._
    val l = Seq(("k", 1), ("k", 2)).toDF("key", "lv")
    val r = Seq(("k", 9)).toDF("key", "rv")
    val plain = l.join(r, Seq("key")).count()
    assert(graft.ops.SkewJoin.salted(l, r, "key", 1).count() == plain)
  }
}

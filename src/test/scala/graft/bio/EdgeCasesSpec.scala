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

  test("empty inputs flow through the round-2 operators without errors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.ops.Dedup.components(noPairs).count() == 0)

    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.Dedup.simhashPairs(noDocs, "doc_id", "text",
      lit(true), 3).count() == 0)
    assert(graft.ops.TextAnalysis.scrub(noDocs, "doc_id", "text").count() == 0)
    assert(graft.ops.TextAnalysis.idfTable(noDocs, "doc_id", "text", 0).count() == 0)

    val noVecs = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    assert(graft.ops.Similarity.embeddingNearDup(noVecs, lit(true), 0.5,
      dims = 4).count() == 0)

    // profile search with an empty target set
    val prof = Profiles.fromAlignedSeqs(Seq("MKVLATTPFG"))
    val profiles = Seq((0L, "p", prof)).toDF("seqId", "header", "profile")
    val noTargets = Seq.empty[(Long, String, String, String, Int)]
      .toDF("seqId", "header", "name", "seq", "seqLen")
    assert(PetaSearch.searchProfiles(spark, profiles, noTargets).count() == 0)
  }

  test("SkewJoin with buckets=1 equals plain join") {
    import spark.implicits._
    val l = Seq(("k", 1), ("k", 2)).toDF("key", "lv")
    val r = Seq(("k", 9)).toDF("key", "rv")
    val plain = l.join(r, Seq("key")).count()
    assert(graft.ops.SkewJoin.salted(l, r, "key", 1).count() == plain)
  }
}

package graft.bio

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test on the reference's own fixture
  * (`tests/MSA_Cas7-11_multiline.fa`, 20 Cas7-11 proteins): self-search must
  * produce a full-length self-hit per sequence (FIXTURES.md §1.4 invariants).
  */
class PetaSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val fixture =
    getClass.getResource("/MSA_Cas7-11_multiline.fa").getPath

  /** The fixture is a gapped MSA; degap it (as the reference's
    * tests/reformat.pl would) into a plain FASTA for searching.
    */
  private lazy val degapped: String = {
    val src = scala.io.Source.fromFile(fixture)
    val out = try src.getLines().map { l =>
      if (l.startsWith(">")) l else l.replace("-", "").replace(".", "")
    }.mkString("\n") finally src.close()
    val f = java.io.File.createTempFile("cas711_degap", ".fa")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, out)
    f.getAbsolutePath
  }

  test("FASTA ingest: records, cleaning, dense ordinals") {
    val seqs = Fasta.read(spark, fixture)
    val rows = seqs.collect()
    assert(rows.length == 21)
    assert(rows.map(_.getAs[Long]("seqId")).sorted.toSeq == (0L until 21L))
    rows.foreach { r =>
      val seq = r.getAs[String]("seq")
      assert(seq.nonEmpty && !seq.contains('\n') && !seq.contains('*'))
      assert(r.getAs[String]("name").nonEmpty)
      assert(r.getAs[Int]("seqLen") == seq.length)
    }
  }

  test("self-search: every sequence self-hits at full length with fident 1") {
    import spark.implicits._
    val queries = Fasta.read(spark, degapped).cache()
    val alis = PetaSearch.search(spark, queries, queries)
    val self = alis.filter($"queryId" === $"targetId").as[Aligner.AlnResult]
      .collect().map(a => a.queryId -> a).toMap
    val lens = queries.select("seqId", "seqLen").as[(Long, Int)].collect().toMap
    assert(self.size == 21, s"expected 21 self-hits, got ${self.size}")
    self.values.foreach { a =>
      assert(a.fident == 1.0, s"seq ${a.queryId}: fident ${a.fident}")
      assert(a.qStart == 0 && a.tStart == 0)
      assert(a.qEnd == lens(a.queryId) - 1 && a.tEnd == lens(a.queryId) - 1)
      assert(a.eval < 1e-10, s"self e-value ${a.eval}")
      assert(a.mismatch == 0 && a.gapOpen == 0)
      assert(a.alnLen == lens(a.queryId))
    }
    // self-hit is the best hit of its query (sorted first within the query)
    val firstPerQuery = alis.collect()
      .groupBy(_.getAs[Long]("queryId"))
      .map { case (q, rows) => q -> rows.head.getAs[Long]("targetId") }
    firstPerQuery.foreach { case (q, t) => assert(q == t, s"query $q best hit $t") }
  }

  test("m8 output has 12 columns with 1-based coordinates") {
    val m8 = PetaSearch.easySearch(spark, degapped, degapped)
    assert(m8.columns.length == 12)
    val rows = m8.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("qstart") >= 1 && r.getAs[Int]("tstart") >= 1)
      val fid = r.getAs[String]("fident").toDouble
      assert(fid >= 0.0 && fid <= 1.0, s"fident $fid out of range")
    }
  }
}

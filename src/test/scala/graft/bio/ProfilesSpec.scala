package graft.bio

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ProfilesSpec extends AnyFunSuite {
  private val m = Matrices.blosum62

  /** Build a synthetic profile record: 25 bytes/position with query and
    * consensus ordinals planted at offsets 20/21.
    */
  private def profileBytes(query: String, consensus: String): Array[Byte] = {
    val out = new Array[Byte](query.length * Profiles.ReadInSize)
    query.indices.foreach { i =>
      out(i * Profiles.ReadInSize + Profiles.QueryOffset) =
        m.aa2num(query(i).toInt).toByte
      out(i * Profiles.ReadInSize + Profiles.ConsensusOffset) =
        m.aa2num(consensus(i).toInt).toByte
    }
    out
  }

  test("profile record decodes query and consensus strings") {
    val q = "MKVLATTPFG"
    val c = "MKVLATTPWG"
    val b = profileBytes(q, c)
    assert(Profiles.extractSequence(b, m) == q)
    assert(Profiles.extractConsensus(b, m) == c)
  }

  test("profile table converts to a searchable sequences table") {
    val spark = TestSpark.spark
    import spark.implicits._
    val q = "MKVLATTPFGWSDEWIRRQ"
    val profiles = Seq((0L, "prof1 test", profileBytes(q, q)))
      .toDF("seqId", "header", "profile")
    val seqs = Profiles.toSequences(spark, profiles)
    val row = seqs.collect().head
    assert(row.getAs[String]("seq") == q)
    assert(row.getAs[String]("name") == "prof1")
    assert(row.getAs[Int]("seqLen") == q.length)
    // and it flows through the search pipeline
    val alis = PetaSearch.search(spark, seqs.cache(), seqs,
      PetaSearch.Params(query = QueryTable.Config(maskMode = false)))
    assert(alis.count() >= 1)
  }
}

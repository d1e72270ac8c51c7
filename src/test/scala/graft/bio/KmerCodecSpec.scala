package graft.bio

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmerCodecSpec extends AnyFunSuite {
  private val A = Matrices.KmerAlphabet // "ACDEFGHIKLMNPQRSTVWY"

  test("encode is the base-20 polynomial with first char least significant") {
    // Indexer.h:20-86: code = sum ord(c_i) * 20^i
    val lut = KmerCodec.lutFor(A)
    assert(KmerCodec.encodeBytes("AAAAAAAAA".getBytes, lut, 20) == 0L)
    assert(KmerCodec.encodeBytes("CAAAAAAAA".getBytes, lut, 20) == 1L)
    assert(KmerCodec.encodeBytes("ACAAAAAAA".getBytes, lut, 20) == 20L)
    assert(KmerCodec.encodeBytes("YYYYYYYYY".getBytes, lut, 20) ==
      (0 until 9).map(i => 19L * math.pow(20, i).toLong).sum)
  }

  test("k-mers containing X (or any non-alphabet char) encode to -1") {
    val lut = KmerCodec.lutFor(A)
    assert(KmerCodec.encodeBytes("AAAAXAAAA".getBytes, lut, 20) == -1L)
    assert(KmerCodec.encodeBytes("AAAA*AAAA".getBytes, lut, 20) == -1L)
  }

  test("decode inverts encode") {
    val lut = KmerCodec.lutFor(A)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (1 to 9).map(_ => A(rnd.nextInt(A.length))).mkString
      val code = KmerCodec.encodeBytes(s.getBytes, lut, 20)
      assert(KmerCodec.decode(code, A, 9) == s)
    }
  }

  test("expression works in a DataFrame plan and nulls out X k-mers") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("ACDEFGHIK", "AXAAAAAAA").toDF("s")
      .select(KmerCodec.kmerEncode($"s", A).as("code"))
    val rows = df.collect()
    val lut = KmerCodec.lutFor(A)
    assert(rows(0).getLong(0) == KmerCodec.encodeBytes("ACDEFGHIK".getBytes, lut, 20))
    assert(rows(1).isNullAt(0))
  }

  test("rolling generator matches naive substring-encode on random strings with X") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val alphaX = A + "X"
    val rows = (0 until 50).map { i =>
      (i.toLong, (0 until 5 + rnd.nextInt(40)).map(_ => alphaX(rnd.nextInt(alphaX.length))).mkString)
    }
    val df = rows.toDF("seqId", "seq")
    val fast = KmerCodec.explodeKmers(df, "seq", 9, A)
      .select("seqId", "kmerPos", "kmer").as[(Long, Int, Long)].collect().toSet
    // naive reference: substring + encode
    val lut = KmerCodec.lutFor(A)
    val naive = rows.flatMap { case (id, s) =>
      (0 to s.length - 9).flatMap { p =>
        val code = KmerCodec.encodeBytes(s.substring(p, p + 9).getBytes, lut, 20)
        if (code < 0) None else Some((id, p, code))
      }
    }.toSet
    assert(fast == naive)
  }

  test("explodeKmers yields L-k+1 windows minus X windows, positions 0-based") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "ACDEFGHIKLMN", 12)).toDF("seqId", "seq", "seqLen")
    val out = KmerCodec.explodeKmers(df, "seq", 9, A).select("kmerPos", "kmer").collect()
    assert(out.length == 4) // 12-9+1
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // with an X at position 4: windows 0..4 all cover it except those past it
    val df2 = Seq((1L, "ACDEXGHIKLMN", 12)).toDF("seqId", "seq", "seqLen")
    val out2 = KmerCodec.explodeKmers(df2, "seq", 9, A).select("kmerPos").collect()
    assert(out2.isEmpty) // every 9-window of a 12-char seq covers position 4
  }
}

package graft.bio

import org.scalatest.funsuite.AnyFunSuite

class StorageCodecsSpec extends AnyFunSuite {

  test("pack5 round-trips all length residues mod 3, with end flag set") {
    Seq("MKV", "MKVL", "MKVLA", "A", "", "ACDEFGHIKLMNPQRSTVWY").foreach { s =>
      val packed = StorageCodecs.pack5(s)
      assert(StorageCodecs.unpack5(packed) == s)
      if (packed.nonEmpty) {
        assert((packed.last & 0x8000) != 0)
        assert(packed.init.forall(w => (w & 0x8000) == 0))
      }
    }
  }

  test("pack5 density: 16 bits per 3 residues") {
    val s = "MKVLATTPFGWS" // 12 residues
    assert(StorageCodecs.pack5(s).length == 4)
  }

  test("delta varint round-trips, including gaps over the 15-bit boundary") {
    val cases = Seq(
      Array(0L, 1L, 2L),
      Array(5L, 32767L, 32768L, 65536L, 1L << 40),
      Array(0L),
      Array(1L << 60))
    cases.foreach { a =>
      assert(StorageCodecs.deltaVarintDecode(StorageCodecs.deltaVarintEncode(a))
        .sameElements(a))
    }
  }

  test("property: delta varint round-trip on random ascending u64 sequences") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val a = Array.fill(rnd.nextInt(50))(math.abs(rnd.nextLong()) % (1L << 50)).sorted
      assert(StorageCodecs.deltaVarintDecode(StorageCodecs.deltaVarintEncode(a))
        .sameElements(a))
    }
  }

  test("property: kmer encode/decode inverse over the protein alphabet") {
    val A = Matrices.KmerAlphabet
    val lut = KmerCodec.lutFor(A)
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val s = Array.fill(9)(A(rnd.nextInt(A.length))).mkString
      val code = KmerCodec.encodeBytes(s.getBytes, lut, 20)
      assert(KmerCodec.decode(code, A, 9) == s)
    }
  }

  test("typical gap fits one uint16 (2 B/kmer index cost model)") {
    val dense = Array.tabulate(100)(i => i.toLong * 1000)
    val words = StorageCodecs.deltaVarintEncode(dense)
    assert(words.length == 100) // every gap < 2^15 -> single word
  }
}

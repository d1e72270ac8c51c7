package graft.bio

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Interop with the reference's on-disk formats: byte-level golden checks
  * of the writer (hand-computed from the format definition: pack5 shorts
  * LE + ascii offset index + "header\n\0" pairs + 4-byte dbtype; k-mer
  * table = 15-bit delta stream + uint32 ids), then reader round-trips and
  * search equivalence over an imported index.
  */
class SraInteropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("sradb").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def bytesOf(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  test("writeSraDb produces the exact reference byte layout") {
    import spark.implicits._
    val dir = tmpDir()
    val db = s"$dir/db"
    // "MKV" = one triplet: (M&31)<<10 | (K&31)<<5 | (V&31), end flag 0x8000
    // "AC"  = padded triplet (A,C,@): '@'&31 = 0
    val seqs = Seq((0L, "s1 first", "MKV"), (1L, "s2", "AC"))
      .toDF("seqId", "header", "seq")
    SraInterop.writeSraDb(seqs, db)

    val short0 = 0x8000 | ((('M' & 31) << 10) | (('K' & 31) << 5) | ('V' & 31))
    val short1 = 0x8000 | ((('A' & 31) << 10) | (('C' & 31) << 5))
    val expData = Array(
      short0 & 0xff, short0 >> 8, short1 & 0xff, short1 >> 8).map(_.toByte)
    assert(bytesOf(db).toSeq == expData.toSeq)
    assert(new String(bytesOf(s"$db.index"), "US-ASCII") == "0\n2\n")
    assert(new String(bytesOf(s"${db}_h"), "US-ASCII") == "s1 first\n\u0000s2\n\u0000")
    assert(new String(bytesOf(s"${db}_h.index"), "US-ASCII") == "0\n10\n")
    assert(bytesOf(s"$db.dbtype").toSeq == Seq[Byte](0, 0, 0, 0))
  }

  test("SRA DB round-trip: FASTA ingest == writeSraDb -> readSraDb") {
    import spark.implicits._
    val fa = java.io.File.createTempFile("interop", ".fa")
    fa.deleteOnExit()
    java.nio.file.Files.writeString(fa.toPath,
      ">seq1 desc here\nMKVLATTPFGWSDEWIRRQC\n" +
        ">sp|P12345|TEST second\nGWSDEWIRRQCMKVLATTPF\n" +
        ">seq3\nMKVLATT\n") // length 7: 2-char final triplet pad
    val direct = Fasta.read(spark, fa.getAbsolutePath).cache()
    val dir = tmpDir()
    SraInterop.writeSraDb(direct, s"$dir/db")
    val back = SraInterop.readSraDb(spark, s"$dir/db")
    val a = direct.select("seqId", "header", "name", "seq", "seqLen")
      .as[(Long, String, String, String, Int)].collect().sortBy(_._1)
    val b = back.select("seqId", "header", "name", "seq", "seqLen")
      .as[(Long, String, String, String, Int)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("k-mer table golden bytes + round-trip through import") {
    import spark.implicits._
    val dir = tmpDir()
    val tbl = s"$dir/ktable"
    // kmers 5 and 5+2^15 for id 7, 9: deltas 5 (one word, flagged) and
    // 32768 (two words: msb chunk 1, then flagged 0)
    val idx = Seq((5L, 7L), (5L + 32768L, 9L)).toDF("kmer", "seqId")
    SraInterop.writeKmerTable(idx, tbl)
    val exp = Array(
      0x05, 0x80, // 5 | END
      0x01, 0x00, // high chunk 1
      0x00, 0x80 // low chunk 0 | END
    ).map(_.toByte)
    assert(bytesOf(tbl).toSeq == exp.toSeq)
    assert(bytesOf(tbl + "_ids").toSeq ==
      Seq[Byte](7, 0, 0, 0, 9, 0, 0, 0))
    val back = SraInterop.readKmerTable(spark, tbl)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(back.toSeq == Seq((5L, 7L), (5L + 32768L, 9L)))
  }

  test("multi-split data files (<db>.0/.1) read with global offsets") {
    import spark.implicits._
    val dir = tmpDir()
    val db = s"$dir/split"
    // write a single-file DB, then split its data file in two by hand
    val seqs = Seq((0L, "h0", "MKVLAT"), (1L, "h1", "GWSDEW"),
      (2L, "h2", "IRRQCM")).toDF("seqId", "header", "seq")
    SraInterop.writeSraDb(seqs, db)
    val data = bytesOf(db)
    java.nio.file.Files.delete(java.nio.file.Paths.get(db))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$db.0"), data.take(4))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$db.1"), data.drop(4))
    // header file split too (uneven cut inside an entry)
    val hdr = bytesOf(s"${db}_h")
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"${db}_h"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"${db}_h.0"), hdr.take(5))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"${db}_h.1"), hdr.drop(5))
    val back = SraInterop.readSraDb(spark, db)
      .select("seqId", "seq", "header")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(back.toSeq == Seq((0L, "MKVLAT", "h0"), (1L, "GWSDEW", "h1"),
      (2L, "IRRQCM", "h2")))
  }

  test("imported reference index searches identically to a native index") {
    import spark.implicits._
    val fixture = getClass.getResourceAsStream("/MSA_Cas7-11_multiline.fa")
    val degapped = scala.io.Source.fromInputStream(fixture, "UTF-8").getLines()
      .map(l => if (l.startsWith(">")) l else l.replace("-", "").replace(".", ""))
      .mkString("\n")
    val fa = java.io.File.createTempFile("cas", ".fa")
    fa.deleteOnExit()
    java.nio.file.Files.writeString(fa.toPath, degapped)
    val seqs = Fasta.read(spark, fa.getAbsolutePath).cache()

    // export the native index in the reference's format, then re-import
    val nativeIndex = KmerIndex.buildWithPos(seqs, KmerIndex.DefaultK,
      Matrices.KmerAlphabet).cache()
    val dir = tmpDir()
    SraInterop.writeKmerTable(nativeIndex.select("kmer", "seqId"), s"$dir/tbl")
    val imported = SraInterop.importKmerTable(spark, s"$dir/tbl", seqs)

    // identical index content...
    val a = nativeIndex.select("kmer", "seqId", "seqLen", "tpos")
      .as[(Long, Long, Int, Int)].collect().sortBy(r => (r._1, r._2))
    val b = imported.select("kmer", "seqId", "seqLen", "tpos")
      .as[(Long, Long, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq == b.toSeq)

    // ...and identical search results end to end
    val qk = PetaSearch.buildQueryTable(spark, seqs, PetaSearch.Params())
    val pfNative = Prefilter.runWithDiag(qk, nativeIndex)
    val pfImported = Prefilter.runWithDiag(qk, imported)
    val direct = Align.run(spark, pfNative, seqs, seqs)
      .select("queryId", "targetId", "bits").as[(Long, Long, Int)].collect().toSet
    val viaImport = Align.run(spark, pfImported, seqs, seqs)
      .select("queryId", "targetId", "bits").as[(Long, Long, Int)].collect().toSet
    assert(direct == viaImport && direct.nonEmpty)
  }
}

package graft.bio

import org.apache.spark.sql.{DataFrame, SparkSession}

/** F4: HMM-profile record decoding (`Sequence::extractProfileConsensus`,
  * `lib/mmseqs/src/commons/Sequence.cpp:387-401`). Profile DBs store 25
  * bytes per position: 20 per-residue scores, the query residue ordinal
  * (byte 20), the consensus ordinal (byte 21), Neff and two gap bytes
  * (`Sequence.h:458-471`).
  *
  * `toSequences` turns a profile table into a searchable sequences table
  * using the consensus string — the same string the reference aligns
  * against in profile mode (`blockalign.cpp:313-323`). The per-position
  * profile SCORES are not yet used for alignment scoring (the reference
  * feeds them to block-aligner's profile mode); documented simplification.
  */
object Profiles {

  val ReadInSize = 25
  val QueryOffset = 20
  val ConsensusOffset = 21

  private def extract(data: Array[Byte], offset: Int, m: Matrices): String = {
    val sb = new StringBuilder(data.length / ReadInSize)
    var i = 0
    while (i + offset < data.length) {
      sb += m.alphabet(data(i + offset) & 0xff)
      i += ReadInSize
    }
    sb.toString
  }

  def extractSequence(data: Array[Byte], m: Matrices = Matrices.blosum62): String =
    extract(data, QueryOffset, m)

  def extractConsensus(data: Array[Byte], m: Matrices = Matrices.blosum62): String =
    extract(data, ConsensusOffset, m)

  /** profiles(seqId BIGINT, header STRING, profile BINARY) ->
    * sequences(seqId, header, name, seq, seqLen) with seq = consensus.
    */
  def toSequences(spark: SparkSession, profiles: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val consensusUdf = udf((b: Array[Byte]) => extractConsensus(b))
    profiles
      .withColumn("seq", consensusUdf(col("profile")))
      .withColumn("name", Fasta.parseFastaHeaderCol(col("header")))
      .withColumn("seqLen", length(col("seq")).cast("int"))
      .select("seqId", "header", "name", "seq", "seqLen")
  }

  /** Per-position profile score: stored int8 for residue ordinal `res` at
    * position `pos`, before the aligner's >>2 scaling.
    */
  def scoreAt(data: Array[Byte], pos: Int, res: Int): Int =
    data(pos * ReadInSize + res).toInt

  /** Encode a profile record from explicit per-position score rows (one
    * Array[Int] of `alphabetSize-1 = 20` scores per position, clamped to
    * int8), plus query and consensus strings. Inverse of [[extract]]; used
    * by profile builders and tests.
    */
  def encode(scoreRows: Seq[Array[Int]], query: String, consensus: String,
      m: Matrices = Matrices.blosum62): Array[Byte] = {
    require(scoreRows.length == query.length && query.length == consensus.length)
    val out = new Array[Byte](scoreRows.length * ReadInSize)
    var p = 0
    while (p < scoreRows.length) {
      val row = scoreRows(p)
      var r = 0
      while (r < QueryOffset) {
        val s = if (r < row.length) row(r) else 0
        out(p * ReadInSize + r) = math.max(-128, math.min(127, s)).toByte
        r += 1
      }
      out(p * ReadInSize + QueryOffset) = m.aa2num(query.charAt(p) & 0xff).toByte
      out(p * ReadInSize + ConsensusOffset) = m.aa2num(consensus.charAt(p) & 0xff).toByte
      // Neff + gap bytes: neutral defaults (not consumed by the aligner)
      out(p * ReadInSize + 22) = 1
      p += 1
    }
    out
  }

  /** Build a PSSM-style profile from an aligned sequence set (rows of equal
    * length; '-' = gap): per-position scores are the column-composition-
    * weighted average of matrix rows, scaled x4 so the aligner's >>2 recovers
    * matrix magnitude (the average-score PSSM construction; a single-sequence
    * profile reproduces 4x its matrix rows exactly). Consensus = most common
    * residue (ties -> alphabet order); query = first row's residue (gap ->
    * consensus).
    */
  def fromAlignedSeqs(rows: Seq[String],
      m: Matrices = Matrices.blosum62): Array[Byte] = {
    require(rows.nonEmpty && rows.forall(_.length == rows.head.length))
    val len = rows.head.length
    val nRes = QueryOffset // 20
    val scoreRows = new scala.collection.mutable.ArrayBuffer[Array[Int]](len)
    val query = new StringBuilder(len)
    val consensus = new StringBuilder(len)
    (0 until len).foreach { p =>
      val resCounts = Array.fill(nRes)(0)
      rows.foreach { r =>
        val c = r.charAt(p)
        if (c != '-' && c != '.') {
          val o = m.aa2num(c & 0xff)
          if (o < nRes) resCounts(o) += 1
        }
      }
      val total = resCounts.sum
      val row = Array.tabulate(nRes) { r =>
        if (total == 0) 0
        else {
          val avg = (0 until nRes).map(c =>
            resCounts(c).toDouble / total * m.scores(c)(r)).sum
          math.round(avg * 4).toInt
        }
      }
      scoreRows += row
      val consOrd =
        if (total == 0) nRes else (0 until nRes).maxBy(resCounts)
      val consChar = m.alphabet(if (consOrd >= nRes) nRes else consOrd)
      consensus += consChar
      val qc = rows.head.charAt(p)
      query += (if (qc == '-' || qc == '.') consChar else qc)
    }
    encode(scoreRows.toSeq, query.toString, consensus.toString, m)
  }
}

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
}

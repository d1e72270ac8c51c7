package graft.bio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FASTA/FASTQ ingest — the `convert2sradb` stage (S1/P1/P2/P3,
  * `src/sra/convert2sradb.cpp:96-157`, cleaning `src/commons/SRAUtil.cpp:18-45`).
  *
  * Distributed record splitting: `spark.read.text` with lineSep `"\n>"` cuts
  * exactly at record boundaries, so a 100 TB FASTA set splits across
  * executors without a driver-side parse. Header/sequence split, `'*'->'X'`,
  * `'@'` stripped, uppercased; the dense ordinal `seqId` (the reference's
  * implicit row key, `src/commons/SRADBReader.cpp:317-319`) is materialized
  * once at ingest via zipWithIndex.
  *
  * Output schema: `sequences(seqId BIGINT, header STRING, name STRING,
  * seq STRING, seqLen INT)` — headers inline (supersedes the `_h` store).
  */
object Fasta {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", "\n>").text(path)
    fromRecords(spark, raw)
  }

  /** Parse '>'-delimited records (header line + sequence lines). */
  private[bio] def fromRecords(spark: SparkSession, raw: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("seqId", LongType, nullable = false),
      StructField("header", StringType, nullable = false),
      StructField("seq", StringType, nullable = false)))
    // zipWithIndex: one extra narrow pass; assigns the dense file-order key
    val rows = raw.rdd
      .map(_.getString(0))
      .map(rec => if (rec.startsWith(">")) rec.drop(1) else rec)
      .filter(_.trim.nonEmpty)
      .zipWithIndex()
      .map { case (rec, id) =>
        val nl = rec.indexOf('\n')
        val (header, body) = if (nl < 0) (rec, "") else (rec.take(nl), rec.drop(nl + 1))
        val seq = cleanSequence(body)
        org.apache.spark.sql.Row(id, header.trim, seq)
      }
    spark.createDataFrame(rows, schema)
      .withColumn("name", parseFastaHeaderCol(col("header")))
      .filter(length(col("name")) > 0) // P3 empty-header validity
      .withColumn("seqLen", length(col("seq")).cast("int"))
      .select("seqId", "header", "name", "seq", "seqLen")
  }

  /** FASTQ ingest (4-line records: @header / seq / + / qual; quality lines
    * may START with '@', so records cannot be split by a delimiter —
    * instead lines are numbered and grouped by `lineNo / 4`, which is
    * boundary-safe under any partitioning. Gzipped files work transparently
    * (Spark's text source applies the codec before splitting, same
    * single-stream behavior as the reference's kseq+zlib,
    * `lib/mmseqs/src/commons/KSeqWrapper.h:37-84`).
    */
  def readFastq(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("seqId", LongType, nullable = false),
      StructField("header", StringType, nullable = false),
      StructField("seq", StringType, nullable = false),
      StructField("qual", StringType, nullable = false)))
    val rows = spark.read.text(path).rdd
      .map(_.getString(0))
      .zipWithIndex()
      .map { case (line, idx) => (idx / 4, (idx % 4, line)) }
      .groupByKey()
      .map { case (rec, parts) =>
        val m = parts.toMap
        val header = m.getOrElse(0L, "")
        require(header.startsWith("@"), s"malformed FASTQ record $rec: $header")
        require(m.getOrElse(2L, "").startsWith("+"), s"malformed FASTQ record $rec")
        org.apache.spark.sql.Row(rec, header.drop(1).trim,
          cleanSequence(m.getOrElse(1L, "")), m.getOrElse(3L, ""))
      }
    spark.createDataFrame(rows, schema)
      .withColumn("name", parseFastaHeaderCol(col("header")))
      .filter(length(col("name")) > 0)
      .withColumn("seqLen", length(col("seq")).cast("int"))
      .select("seqId", "header", "name", "seq", "seqLen", "qual")
  }

  /** P1 char sanitize (`src/commons/SRAUtil.cpp:18-45`): '*'->'X', strip
    * newlines and '@', uppercase.
    */
  def cleanSequence(body: String): String = {
    val sb = new StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '*') sb += 'X'
      else if (c != '\n' && c != '\r' && c != '@' && !c.isWhitespace)
        sb += c.toUpper
      i += 1
    }
    sb.toString
  }

  /** P2 header-id extraction (`Util::parseFastaHeader`,
    * `lib/mmseqs/src/commons/Util.cpp:189-197`): first whitespace-free token;
    * for `db|ACC|rest` style accessions keep the accession field.
    */
  def parseFastaHeaderCol(header: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val first = regexp_extract(header, "^\\s*(\\S+)", 1)
    when(first.rlike("^(sp|tr|gb|ref|pdb|emb|dbj|prf|pir)\\|"),
      regexp_extract(first, "^[^|]+\\|([^|]+)", 1))
      .otherwise(first)
  }
}

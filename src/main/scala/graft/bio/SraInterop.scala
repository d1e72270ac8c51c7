package graft.bio

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** On-disk interop with reference-produced databases, so existing indexes
  * can be reused without re-ingesting FASTA.
  *
  * Formats (all little-endian, x86 fwrite):
  *  - SRA DB (`convert2sradb`, `src/sra/convert2sradb.cpp:41-161`,
  *    `src/commons/SRADBWriter.cpp:205-247`): `<db>` data file holds one
  *    pack5 entry per sequence (uint16 triplets, 0x8000 end flag, NO null
  *    separator); `<db>.index` is ascii start offsets, one line per entry,
  *    entry id = line number (`SRADBReader.cpp:105-158`); `<db>_h`/
  *    `<db>_h.index` hold "name comment\n\0" headers the same way;
  *    `<db>.dbtype` is a 4-byte type code (`SRADBWriter.cpp:127-147`).
  *  - k-mer table (`createkmertable.cpp:164-245`): `<tbl>` is one
  *    cumulative 15-bit delta-varint stream over the ascending unique
  *    k-mers; `<tbl>_ids` is a parallel uint32 stream of representative
  *    sequence ids (A1 argmax already applied by `targetTableSort`).
  *
  * Scale posture: SRA DB reads are DISTRIBUTED — the text index ships as a
  * DataFrame, entry byte ranges are computed relationally, and executors
  * pread their ranges via the Hadoop filesystem (works for file://, hdfs://,
  * s3a://...). The k-mer table is a single cumulative delta stream —
  * unsplittable by construction — so it is decoded in one sequential pass
  * (exactly what the reference does, `comparekmertables.cpp`) and should be
  * ingested ONCE into the parquet index via [[importKmerTable]].
  */
object SraInterop {

  val DbTypeAminoAcids = 0 // Parameters.h:65
  val DbTypeGenericDb = 12 // Parameters.h:77

  // ------------------------------------------------------------- reading

  private def fsFor(path: String, conf: org.apache.hadoop.conf.Configuration) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(conf)

  /** Data files for a base name: `<base>` or the `<base>.0, <base>.1 ...`
    * splits an unmerged multi-thread writer leaves (`FileUtil::findDatafiles`).
    */
  private def dataFiles(base: String): Seq[String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = fsFor(base, conf)
    val p = new org.apache.hadoop.fs.Path(base)
    if (fs.exists(p)) Seq(base)
    else Iterator.from(0).map(i => s"$base.$i")
      .takeWhile(f => fs.exists(new org.apache.hadoop.fs.Path(f))).toSeq
  }

  /** (seqId, bytes) for every entry of a writer-format file pair: offsets
    * from the ascii index, ranges closed by the successor offset (relational
    * self-join — no driver materialization), bytes fetched by executors via
    * positioned reads, partition-range-ordered for sequential IO.
    */
  private def readEntries(spark: SparkSession, base: String): DataFrame = {
    val files = dataFiles(base)
    require(files.nonEmpty, s"no data file found for $base")
    val conf = new org.apache.hadoop.conf.Configuration()
    val sizes = files.map(f =>
      fsFor(f, conf).getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
    val cumSizes = sizes.scanLeft(0L)(_ + _)
    val totalSize = cumSizes.last

    import spark.implicits._
    val offsets = spark.read.text(s"$base.index").rdd
      .map(_.getString(0).trim.split("\\s+")(0).toLong)
      .zipWithIndex()
      .map { case (off, id) => (id, off) }
      .toDF("seqId", "start")
    val ends = offsets.select((col("seqId") - 1).as("seqId"), col("start").as("end"))
    val ranges = offsets.join(ends, Seq("seqId"), "left")
      .na.fill(Map("end" -> totalSize))

    val filesB = spark.sparkContext.broadcast((files, cumSizes))
    val fetched = ranges
      .repartitionByRange(col("start"))
      .sortWithinPartitions(col("start"))
      .select(col("seqId"), col("start"), col("end"))
      .as[(Long, Long, Long)]
      .mapPartitions { iter =>
        val (fileNames, cum) = filesB.value
        val cf = new org.apache.hadoop.conf.Configuration()
        val streams = scala.collection.mutable.Map.empty[Int, org.apache.hadoop.fs.FSDataInputStream]
        // close whatever we opened when the task finishes (success or not)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            streams.values.foreach(s => scala.util.Try(s.close()))))
        def openFile(fi: Int) = streams.getOrElseUpdate(fi, {
          val p = new org.apache.hadoop.fs.Path(fileNames(fi))
          p.getFileSystem(cf).open(p)
        })
        val it = iter.map { case (seqId, start, end) =>
          // locate the split holding this global offset; entries from the
          // native writer never span splits, but read across them anyway
          var fi = java.util.Arrays.binarySearch(cum.toArray, start)
          if (fi < 0) fi = -fi - 2
          if (fi >= fileNames.length) fi = fileNames.length - 1
          val buf = new Array[Byte]((end - start).toInt)
          var done = 0
          var pos = start
          while (done < buf.length) {
            val inFile = math.min(buf.length - done, (cum(fi + 1) - pos).toInt)
            openFile(fi).readFully(pos - cum(fi), buf, done, inFile)
            done += inFile
            pos += inFile
            if (done < buf.length) fi += 1
          }
          (seqId, buf)
        }
        it
      }
    fetched.toDF("seqId", "bytes")
  }

  private def shortsLE(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
      i += 1
    }
    out
  }

  /** Read a reference SRA DB (data + header pair) into the engine's
    * sequences schema (seqId, header, name, seq, seqLen).
    */
  def readSraDb(spark: SparkSession, dbPath: String): DataFrame = {
    import spark.implicits._
    val seqs = readEntries(spark, dbPath).as[(Long, Array[Byte])]
      .map { case (id, bytes) => (id, StorageCodecs.unpack5(shortsLE(bytes))) }
      .toDF("seqId", "seq")
    val hdrs = readEntries(spark, s"${dbPath}_h").as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val s = new String(bytes, "US-ASCII")
        (id, s.stripSuffix("\u0000").stripSuffix("\n"))
      }
      .toDF("seqId", "header")
    seqs.join(hdrs, Seq("seqId"))
      .withColumn("name", Fasta.parseFastaHeaderCol(col("header")))
      .withColumn("seqLen", length(col("seq")).cast("int"))
      .select("seqId", "header", "name", "seq", "seqLen")
  }

  /** Decode a reference k-mer table pair into (kmer, seqId) rows. One
    * sequential pass: the cumulative delta stream cannot be split (every
    * value depends on the full prefix); the reference streams it the same
    * way. Ingest once, persist as parquet, query distributed.
    */
  def readKmerTable(spark: SparkSession, tablePath: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("kmer", LongType, nullable = false),
      StructField("seqId", LongType, nullable = false)))
    val rows = spark.sparkContext.parallelize(Seq(tablePath), 1).flatMap { tp =>
      val cf = new org.apache.hadoop.conf.Configuration()
      val kp = new org.apache.hadoop.fs.Path(tp)
      val ip = new org.apache.hadoop.fs.Path(tp + "_ids")
      val kIn = new java.io.DataInputStream(new java.io.BufferedInputStream(
        kp.getFileSystem(cf).open(kp), 1 << 20))
      val iIn = new java.io.DataInputStream(new java.io.BufferedInputStream(
        ip.getFileSystem(cf).open(ip), 1 << 20))
      // EOF closes the streams below, but a partially-consumed partition
      // (downstream limit()) would leak them — mirror readEntries' listener
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          try kIn.close() finally iIn.close()
        })
      new Iterator[Row] {
        private var current = 0L
        private var acc = 0L
        private var nextRow: Row = advance()
        private def readShortLE(): Int = {
          val lo = kIn.read()
          if (lo < 0) return -1
          val hi = kIn.read()
          lo | (hi << 8)
        }
        private def readIntLE(): Long = {
          val b = new Array[Byte](4)
          iIn.readFully(b)
          ((b(0) & 0xffL)) | ((b(1) & 0xffL) << 8) |
            ((b(2) & 0xffL) << 16) | ((b(3) & 0xffL) << 24)
        }
        private def advance(): Row = {
          var w = readShortLE()
          while (w >= 0) {
            acc = (acc << 15) | (w & 0x7fff)
            if ((w & 0x8000) != 0) {
              current += acc
              acc = 0L
              return Row(current, readIntLE())
            }
            w = readShortLE()
          }
          kIn.close(); iIn.close()
          null
        }
        override def hasNext: Boolean = nextRow != null
        override def next(): Row = {
          val r = nextRow; nextRow = advance(); r
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Ingest a reference k-mer table into the engine's index shape
    * (kmer, seqId, seqLen, tpos): the native table stores no positions (the
    * reference re-finds them per pair at align time, `blockalign.cpp:268-298`
    * J3); we recover each representative's first-occurrence position ONCE by
    * re-extracting k-mers of the referenced sequences, then the persisted
    * index serves position lookups for free (the tpos collapse).
    */
  def importKmerTable(spark: SparkSession, tablePath: String,
      sequences: DataFrame, k: Int = KmerIndex.DefaultK,
      alphabet: String = Matrices.KmerAlphabet): DataFrame = {
    val pairs = readKmerTable(spark, tablePath)
    val referenced = sequences
      .join(pairs.select(col("seqId")).distinct(), Seq("seqId"), "left_semi")
    val firstPos = KmerCodec.explodeKmers(referenced, "seq", k, alphabet)
      .groupBy(col("seqId"), col("kmer"))
      .agg(min(col("kmerPos")).cast("int").as("tpos"),
        first(col("seqLen")).as("seqLen"))
    pairs.join(firstPos, Seq("seqId", "kmer"))
      .select(col("kmer"), col("seqId"), col("seqLen"), col("tpos"))
  }

  // ----------------------------------------------- writing (export/fixtures)

  /** Export sequences to the reference SRA DB format (data + index + _h +
    * _h.index + .dbtype). Single sequential stream on the driver — the
    * format's ascii offset index is inherently ordered; use for fixtures and
    * moderate exports, keep parquet as the at-scale store.
    */
  def writeSraDb(sequences: DataFrame, dbPath: String): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = fsFor(dbPath, conf)
    def create(p: String) = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(
        fs.create(new org.apache.hadoop.fs.Path(p), true), 1 << 20))
    val data = create(dbPath)
    val index = create(s"$dbPath.index")
    val hdr = create(s"${dbPath}_h")
    val hdrIndex = create(s"${dbPath}_h.index")
    var dataOff = 0L
    var hdrOff = 0L
    val it = sequences.select(col("seqId"), col("header"), col("seq"))
      .orderBy(col("seqId")).toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      index.writeBytes(dataOff.toString); index.write('\n')
      val packed = StorageCodecs.pack5(r.getAs[String]("seq"))
      packed.foreach { s => data.write(s & 0xff); data.write((s >> 8) & 0xff) }
      dataOff += 2L * packed.length
      hdrIndex.writeBytes(hdrOff.toString); hdrIndex.write('\n')
      val h = r.getAs[String]("header") + "\n\u0000"
      val hb = h.getBytes("US-ASCII")
      hdr.write(hb)
      hdrOff += hb.length
    }
    data.close(); index.close(); hdr.close(); hdrIndex.close()
    val dbtype = create(s"$dbPath.dbtype")
    dbtype.write(DbTypeAminoAcids); dbtype.write(0); dbtype.write(0); dbtype.write(0)
    dbtype.close()
    val hdrType = create(s"${dbPath}_h.dbtype")
    hdrType.write(DbTypeGenericDb); hdrType.write(0); hdrType.write(0); hdrType.write(0)
    hdrType.close()
  }

  /** Export a (kmer, seqId) index to the reference k-mer table format
    * (`<tbl>` delta stream + `<tbl>_ids`). Rows must be unique per kmer
    * (A1 applied) — exactly what [[KmerIndex]] produces. Sequential driver
    * stream, same caveat as [[writeSraDb]].
    */
  def writeKmerTable(index: DataFrame, tablePath: String): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = fsFor(tablePath, conf)
    def create(p: String) = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(
        fs.create(new org.apache.hadoop.fs.Path(p), true), 1 << 20))
    val kOut = create(tablePath)
    val iOut = create(tablePath + "_ids")
    var prev = 0L
    val it = index.select(col("kmer"), col("seqId"))
      .orderBy(col("kmer")).toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val kmer = r.getLong(0)
      // 15-bit delta chunks, most-significant first, end flag on the last
      var gap = kmer - prev
      prev = kmer
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Int]
      do {
        chunks.prepend((gap & 0x7fff).toInt)
        gap >>>= 15
      } while (gap != 0)
      chunks.indices.foreach { ci =>
        val w = if (ci == chunks.length - 1) chunks(ci) | 0x8000 else chunks(ci)
        kOut.write(w & 0xff); kOut.write((w >> 8) & 0xff)
      }
      val id = r.getLong(1)
      // the native _ids stream is uint32 — refuse to wrap rather than
      // silently corrupt the exported index
      require(id >= 0L && id <= 0xFFFFFFFFL,
        s"seqId $id does not fit the reference table's uint32 id stream")
      iOut.write((id & 0xff).toInt); iOut.write(((id >> 8) & 0xff).toInt)
      iOut.write(((id >> 16) & 0xff).toInt); iOut.write(((id >> 24) & 0xff).toInt)
    }
    kOut.close(); iOut.close()
  }
}

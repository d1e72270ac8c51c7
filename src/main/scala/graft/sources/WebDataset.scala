package graft.sources

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard source/sink — the de-facto container format
  * for multimodal training corpora (image/audio/text samples packed as
  * `<key>.<ext>` members of sequentially-read tar files). The SHARD is the
  * unit of distribution: one task reads/writes one tar sequentially,
  * parallelism comes from having many shards — which is exactly Spark's
  * file-per-task model, so `binaryFile` + a pure-JVM tar walk maps onto it
  * with no custom DataSource machinery.
  *
  * Sample grouping follows the WebDataset convention: the KEY is the
  * member name up to the FIRST dot, the extension everything after it
  * (`0001.seg.png` → key `0001`, ext `seg.png`), and all members sharing a
  * key form one training sample.
  */
object WebDataset {

  /** Read tar shards matching `pattern` (a glob: `*.tar` under the shard
    * directory) into
    * (shard, key, ext, payload) rows. Each shard is decoded by ONE task —
    * size shards to the executor memory budget (the usual 100 MB–1 GB
    * WebDataset shard is far below it). Entries are emitted in tar order;
    * nothing is shuffled.
    */
  def readTarShards(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pattern)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val in = new TarArchiveInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out =
          scala.collection.mutable.ArrayBuffer[(String, String, String, Array[Byte])]()
        var e = in.getNextEntry
        while (e != null) {
          if (!e.isDirectory) {
            val name = e.getName
            val dot = name.indexOf('.')
            val (key, ext) =
              if (dot >= 0) (name.substring(0, dot), name.substring(dot + 1))
              else (name, "")
            val buf = new Array[Byte](e.getSize.toInt)
            var off = 0
            while (off < buf.length) {
              val n = in.read(buf, off, buf.length - off)
              require(n > 0, s"truncated tar entry $name in $path")
              off += n
            }
            out += ((path, key, ext, buf))
          }
          e = in.getNextEntry
        }
        out.toSeq
      }.toDF("shard", "key", "ext", "payload")
  }

  /** Write (shard: int, key, ext, payload) rows as `shard-NNNNN.tar` files
    * under `outDir`. Rows hash-partition by shard so each tar is written
    * by exactly one task as one sequential stream (members sorted by
    * (key, ext) — deterministic bytes for a given row set); a task owning
    * several shards switches files on the sorted boundary. Overwrites
    * existing shard files, so re-runs are idempotent.
    */
  def writeTarShards(df: DataFrame, outDir: String): Unit = {
    val out = outDir.stripSuffix("/")
    // ship the session's Hadoop configuration to the tasks as entries: a
    // bare `new Configuration()` on the executor loses every
    // spark.hadoop.* override (object-store credentials, endpoints,
    // defaultFS), which breaks exactly the remote filesystems a sharded
    // export targets
    val confEntries = {
      val c = df.sparkSession.sparkContext.hadoopConfiguration
      val it = c.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    df.select(col("shard").cast("int"), col("key").cast("string"),
        col("ext").cast("string"), col("payload").cast("binary"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("key"), col("ext"))
      .foreachPartition { it: Iterator[Row] =>
        val conf = new org.apache.hadoop.conf.Configuration()
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        var current = Int.MinValue
        var tos: TarArchiveOutputStream = null
        def closeCurrent(): Unit = if (tos != null) {
          tos.finish(); tos.close(); tos = null
        }
        it.foreach { r =>
          val sh = r.getInt(0)
          if (sh != current) {
            closeCurrent()
            val p = new org.apache.hadoop.fs.Path(f"$out/shard-$sh%05d.tar")
            val fs = p.getFileSystem(conf)
            tos = new TarArchiveOutputStream(fs.create(p, true))
            tos.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
            current = sh
          }
          val bytes = r.getAs[Array[Byte]](3)
          val entry = new TarArchiveEntry(s"${r.getString(1)}.${r.getString(2)}")
          entry.setSize(bytes.length.toLong)
          entry.setModTime(0L) // fixed mtime: byte-stable shards
          tos.putArchiveEntry(entry)
          tos.write(bytes)
          tos.closeArchiveEntry()
        }
        closeCurrent()
      }
  }

  /** Assemble WebDataset SAMPLES: group (shard, key) members into one row
    * with an ext → payload map — the unit a multimodal training loader
    * consumes (`{"jpg": ..., "cls": ..., "json": ...}`). One hash
    * aggregation; entries sorted by ext for deterministic map order.
    */
  def groupSamples(rows: DataFrame): DataFrame =
    rows.groupBy(col("shard"), col("key"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("ext"), col("payload"))))).as("sample"))
}

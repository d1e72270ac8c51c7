package graft.tools

import graft.bio._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timings for the bio prefilter path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("seqId"),
        regexp_replace(col("text"), "\\s+", "").as("seq"))
      .withColumn("seqLen", length(col("seq")).cast("int"))
    docs.cache().count()
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    time("warmup count")(docs.count())
    time("explodeKmers count")(
      KmerCodec.explodeKmers(docs, "seq", 9, alpha).count())
    val index = KmerIndex.buildWithPos(docs, 9, alpha)
    time("index build count")(index.count())
    val qk = Prefilter.queryKmers(docs.filter(col("seqId") % 20 === 0), 9, alpha)
    time("query kmers count")(qk.count())
    time("prefilter join+gate")(
      qk.join(index.select(col("kmer"), col("seqId").as("targetId")), Seq("kmer"))
        .groupBy("queryId", "targetId").count().filter(col("count") > 2).count())
    spark.stop()
  }
}

package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileDedup {
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
    docs.cache().count()
    val sh = Dedup.shingles(docs, "doc_id", "text", 2).cache()
    time("shingles count")(sh.count())
    time("shingles count again")(sh.count())
    val cands = Dedup.minhashBanded(sh, 8, 2)
    time("minhashBanded candidates")(cands.count())
    val jac = Dedup.jaccard(cands, sh)
    time("jaccard")(jac.filter(col("jaccard") >= 0.2).count())
    time("full nearDuplicates")(
      Dedup.nearDuplicates(docs, "doc_id", "text", 2, 8, 2, 0.2).count())
    spark.stop()
  }
}

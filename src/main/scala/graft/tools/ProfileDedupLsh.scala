package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timings for the MinHash-LSH near-dup path. */
object ProfileDedupLsh {
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
    time("docs count")(docs.count())
    val sh = Dedup.shingles(docs, "doc_id", "text", 2)
    time("shingles count (cold)")(sh.count())
    val shc = sh.cache()
    time("shingles cache")(shc.count())
    val cands = Dedup.minhashBanded(shc, 8, 2)
    time("candidates (warm sh)")(cands.count())
    time("candidates again")(cands.count())
    time("candidates fresh plan")(Dedup.minhashBanded(shc, 8, 2).count())
    val jac = Dedup.jaccard(cands, shc).filter(col("jaccard") >= 0.2)
    time("jaccard verify")(jac.count())
    time("jaccard again")(jac.count())
    time("full nearDuplicates again")(
      Dedup.nearDuplicates(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 8, rowsPerBand = 2,
        threshold = 0.2).count())
    spark.stop()
  }
}

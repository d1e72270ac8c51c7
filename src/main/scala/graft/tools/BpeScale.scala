package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: BPE-apply scale bench (BASELINE §e, round-9 item #7). Trains
  * a fixed-size merge list on the given corpus (untimed — training cost is
  * text_bpe_pairs' territory), then times [[graft.ops.Bpe.applyBpe]]'s
  * mapPartitions+memo tokenization pass alone. Run against a MakeScale
  * k=1 and k=10 corpus to get the §e ratio: the salting bijection grows
  * the UNIQUE vocabulary ~10× too, so the per-partition memo's hit rate
  * is preserved, not flattered, at x10.
  *
  * Usage: runMain graft.tools.BpeScale [scaleDir] [nMerges]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scale/sf1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(32)
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = DevSession.local()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = graft.ops.Bpe.train(docs, "text", nMerges)
      .orderBy(col("merge_rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val ts = (1 to trials).map { _ =>
      val t0 = System.nanoTime()
      val total = graft.ops.Bpe.applyBpe(docs, "doc_id", "text", merges)
        .agg(sum(col("n_subwords"))).head().getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      f"$dt%.2f" + s" (subwords=$total)"
    }
    println(s"[bpescale] $sfDir merges=${merges.length}: ${ts.mkString(", ")}")
    spark.stop()
  }
}

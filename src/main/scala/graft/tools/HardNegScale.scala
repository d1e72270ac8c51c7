package graft.tools

import org.apache.spark.sql.functions._

/** Measurement harness for the indexed-mining scale claim (BASELINE §n):
  * times [[graft.ops.Similarity.hardNegativesIndexed]] against x1/x10
  * corpora under TWO anchor regimes —
  *
  *   - `scaled`: anchors = vec_id % 50 == 0 (the registry row's predicate
  *     — under the salted-replica construction BOTH sides grow 10×, so
  *     the candidate-pair count grows 100× and no index can make that
  *     flat), and
  *   - `fixed`: anchors restricted to the ORIGINAL id range (< stride) —
  *     the production mining shape: a bounded anchor batch against a
  *     growing corpus. Here the per-anchor work is candK re-ranks over a
  *     partition-pruned ADC scan, so time should track the pruned scan,
  *     not the corpus × anchors product.
  *
  * Usage: `runMain graft.tools.HardNegScale <dir> [trials]` — prints one
  * line per regime with all trials (fixture build untimed, first trial
  * warm-up discarded by taking min).
  */
object HardNegScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x1")
    val trials = if (args.length > 1) args(1).toInt else 3
    val spark = DevSession.local()
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"),
        col("label"))
    val db = graft.ops.SimilarityQueries.ensurePqFixture(spark, dir)
    // the "fixed" regime is the ORIGINAL (replica-0) id range — read the
    // stride MakeScale persisted rather than assuming it (the PhashScale
    // idiom; a hardcoded stride silently measures the wrong anchor set
    // whenever MakeScale derives a larger one)
    val stride =
      try spark.read.parquet(s"$dir/scale_meta").head().getAs[Long]("stride")
      catch { case _: org.apache.spark.sql.AnalysisException =>
        sys.env.getOrElse("SPARK_GRAFT_STRIDE", "1000000").toLong }
    for ((name, pred) <- Seq(
        "scaled" -> (col("vec_id") % 50 === 0),
        "fixed" -> (col("vec_id") % 50 === 0 && col("vec_id") < stride))) {
      val anchors = emb.filter(pred)
      val ts = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        val rows = graft.ops.Similarity.hardNegativesIndexed(spark, db, emb,
          anchors, dim = 64, nSub = 8, pqK = 8, negK = 3, candK = 30,
          nprobe = 2).count()
        f"${(System.nanoTime() - t0) / 1e9}%.2f" + s" (rows=$rows)"
      }
      println(s"[hardnegscale] $dir $name: ${ts.mkString(", ")}")
    }
    spark.stop()
  }
}

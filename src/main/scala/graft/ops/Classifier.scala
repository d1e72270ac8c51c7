package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed batch logistic regression — the fastText-style quality /
  * domain classifier stage of a training-data pipeline (public prior art:
  * the CCNet/LLaMA quality-filter recipe: train a tiny linear model on
  * surface features, score every document, keep the top slice).
  *
  * Execution shape is the whole point at 100 TB:
  *   - the FEATURE matrix is computed once (row-local expressions — no
  *     shuffle) and localCheckpoint'd so the per-round passes re-read
  *     cached columnar partitions instead of re-running regex extraction;
  *   - each GD round is ONE map-side-combined aggregation producing d+1
  *     scalar gradient components (`avg((sigma(x·w) - y) * x_i)`): the
  *     shuffle is 32 partial rows of d+1 doubles, the driver state is the
  *     weight vector — both O(d), never O(rows);
  *   - rounds are FIXED (not convergence-gated), so the result is
  *     deterministic and the oracle can unroll the identical recurrence
  *     round by round (the graph_pagerank convention).
  * Scoring is a pure column expression over broadcast-free literal
  * weights — whole-stage-codegen'd, zero shuffle.
  */
object Classifier {

  /** sigma(x·w) for feature columns `feats` (x0 = 1 intercept implied)
    * under literal weights `w` (size = feats.size + 1).
    */
  def logitScore(feats: Seq[Column], w: Seq[Double]): Column = {
    require(w.size == feats.size + 1, s"need ${feats.size + 1} weights")
    val z = (lit(1.0) * lit(w.head) +: feats.zip(w.tail).map {
      case (x, wi) => x * lit(wi)
    }).reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** `rounds` full-batch GD steps at learning rate `step` from w = 0;
    * returns the weight vector AFTER each round (1-based). `label` must
    * be 0/1; `feats` are row-local feature expressions.
    */
  def logitTrain(df: DataFrame, label: Column, feats: Seq[Column],
      rounds: Int, step: Double): Seq[(Int, Seq[Double])] = {
    val d = feats.size + 1
    val xCols = lit(1.0).as("x0") +: feats.zipWithIndex.map {
      case (c, i) => c.cast("double").as(s"x${i + 1}")
    }
    // one materialization; R passes read the cached feature partitions
    val base = df.select(label.cast("double").as("y") +: xCols: _*)
      .localCheckpoint()
    var w: Seq[Double] = Seq.fill(d)(0.0)
    val trace = (1 to rounds).map { r =>
      val p = logitScore((1 until d).map(i => col(s"x$i")), w)
      val g = base.agg(
        avg((p - col("y")) * col("x0")).as("g0"),
        (1 until d).map(i => avg((p - col("y")) * col(s"x$i")).as(s"g$i")): _*
      ).head()
      w = w.zipWithIndex.map { case (wi, i) => wi - step * g.getDouble(i) }
      (r, w)
    }
    // the trace is plain Scala data at this point — release the feature
    // blocks instead of leaking one set per training call
    base.unpersist()
    trace
  }
}

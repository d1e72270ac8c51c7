package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch logistic regression: scoring hand case, a first-round gradient
  * computed by hand, and learning on a separable toy set.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("logitScore is the sigmoid of the literal dot product") {
    val got = Seq((2.0, 3.0)).toDF("a", "b")
      .select(Classifier.logitScore(Seq(col("a"), col("b")),
        Seq(0.5, -1.0, 0.25)).as("p"))
      .as[Double].head()
    val z = 0.5 - 1.0 * 2.0 + 0.25 * 3.0
    assert(math.abs(got - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
  }

  test("first GD round matches the hand-computed gradient") {
    // two rows, one feature; w=0 => p=0.5 everywhere
    // g0 = avg(p - y) = avg(0.5-1, 0.5-0) = 0
    // g1 = avg((p-y)*x) = avg(-0.5*2, 0.5*4) = 0.5
    val df = Seq((1.0, 2.0), (0.0, 4.0)).toDF("y", "x")
    val Seq((1, w)) = Classifier.logitTrain(df, col("y"), Seq(col("x")),
      rounds = 1, step = 1.0)
    assert(math.abs(w(0) - 0.0) < 1e-12 && math.abs(w(1) + 0.5) < 1e-12)
  }

  test("separable toy set: loss falls and the final model classifies it") {
    val df = (1 to 40).map(i =>
      (if (i % 2 == 0) 1.0 else 0.0,
        if (i % 2 == 0) 3.0 + i % 5 * 0.1 else -3.0 - i % 5 * 0.1))
      .toDF("y", "x")
    val hist = Classifier.logitTrain(df, col("y"), Seq(col("x")),
      rounds = 8, step = 1.0)
    def loss(w: Seq[Double]): Double = {
      val p = Classifier.logitScore(Seq(col("x")), w)
      df.select(avg(-(col("y") * log(p) +
        (lit(1.0) - col("y")) * log(lit(1.0) - p)))).as[Double].head()
    }
    val l1 = loss(hist.head._2)
    val l8 = loss(hist.last._2)
    assert(l8 < l1, s"loss did not fall: $l1 -> $l8")
    val acc = df.select(avg(when(
      (Classifier.logitScore(Seq(col("x")), hist.last._2) >= 0.5) ===
        (col("y") === 1.0), 1.0).otherwise(0.0))).as[Double].head()
    assert(acc == 1.0, s"toy accuracy $acc")
  }
}

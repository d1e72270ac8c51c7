package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LinAlgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random corpus: n vectors of dim d with a
    * dominant direction along dim 0 (variance ~9) and decaying noise.
    */
  private def corpus(n: Int, d: Int): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(7)
    (0 until n).map { _ =>
      val main = rng.nextGaussian() * 3.0
      (0 until d).map { j =>
        if (j == 0) main + rng.nextGaussian() * 0.1
        else main * 0.05 + rng.nextGaussian() / (j + 1.0)
      }
    }
  }

  private def bruteCov(vs: Seq[Seq[Double]]): Array[Array[Double]] = {
    val n = vs.length
    val d = vs.head.length
    val mean = (0 until d).map(j => vs.map(_(j)).sum / n)
    Array.tabulate(d, d) { (i, j) =>
      vs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
  }

  test("covariance matches brute force") {
    val vs = corpus(200, 6)
    val want = bruteCov(vs)
    val got = LinAlg.covariance(vs.map(Tuple1(_)).toDF("embedding"), "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6 * 7 / 2)
    for (((i, j), c) <- got)
      assert(math.abs(c - want(i)(j)) < 1e-9, s"cov($i,$j)")
  }

  test("covariance handles float input and empty corpus") {
    val f = Seq(Tuple1(Seq(1.0f, 2.0f)), Tuple1(Seq(3.0f, 6.0f)))
      .toDF("embedding")
    val got = LinAlg.covariance(f, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got((0, 0)) - 1.0) < 1e-12)
    assert(math.abs(got((0, 1)) - 2.0) < 1e-12)
    assert(math.abs(got((1, 1)) - 4.0) < 1e-12)
    val empty = Seq.empty[Tuple1[Seq[Double]]].toDF("embedding")
    assert(LinAlg.covariance(empty, "embedding").collect().isEmpty)
  }

  test("pca: eigenpairs satisfy C v = λ v; components orthonormal, λ descending") {
    val vs = corpus(500, 8)
    val df = vs.map(Tuple1(_)).toDF("embedding")
    val m = LinAlg.pca(df, "embedding", k = 3)
    val c = bruteCov(vs)
    for (p <- 0 until 3) {
      val v = m.components(p)
      val cv = c.map(row => row.indices.map(j => row(j) * v(j)).sum)
      val resid = v.indices.map(i => cv(i) - m.eigenvalues(p) * v(i))
        .map(math.abs).max
      assert(resid < 1e-6, s"eigen residual for component $p: $resid")
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    }
    assert(m.eigenvalues(0) >= m.eigenvalues(1) - 1e-9)
    assert(m.eigenvalues(1) >= m.eigenvalues(2) - 1e-9)
    val dot01 = m.components(0).indices
      .map(i => m.components(0)(i) * m.components(1)(i)).sum
    assert(math.abs(dot01) < 1e-6)
    // dominant axis is dim 0 by construction
    assert(math.abs(m.components(0)(0)) > 0.9)
    // reproducible: a second fit agrees to float-merge noise (treeAggregate
    // reduces partition results in completion order, so the last few ulps
    // of the moment sums can differ run to run; no RNG anywhere)
    val m2 = LinAlg.pca(df, "embedding", k = 3)
    val compDelta = m.components.flatMap(_.toSeq)
      .zip(m2.components.flatMap(_.toSeq)).map(t => math.abs(t._1 - t._2))
    assert(compDelta.max < 1e-9)
    val eigDelta = m.eigenvalues.zip(m2.eigenvalues)
      .map(t => math.abs(t._1 - t._2))
    assert(eigDelta.max < 1e-9)
  }

  test("projectPca: projections decorrelated; whitening gives unit variance") {
    val vs = corpus(400, 6)
    val df = vs.map(Tuple1(_)).toDF("embedding")
    val m = LinAlg.pca(df, "embedding", k = 2)
    val proj = LinAlg.projectPca(df, "embedding", m, whiten = true)
      .select("proj").collect().map(_.getSeq[Double](0))
    val n = proj.length
    for (p <- 0 to 1) {
      val mean = proj.map(_(p)).sum / n
      val varr = proj.map(v => (v(p) - mean) * (v(p) - mean)).sum / n
      assert(math.abs(mean) < 1e-9, s"component $p not centered")
      assert(math.abs(varr - 1.0) < 1e-6, s"component $p variance $varr")
    }
    val cross = proj.map(v => v(0) * v(1)).sum / n
    assert(math.abs(cross) < 1e-6, "components not decorrelated")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** Dense linear algebra over an embedding column — the moment-statistics
  * layer a 100 TB embedding pipeline needs before SemDeDup/ANN: covariance
  * for drift monitoring, PCA for decorrelation/whitening ahead of product
  * quantization (a whitened codebook spends its centroids evenly instead
  * of burning them on the dominant axis).
  *
  * Scale shape: everything reduces through ONE `treeAggregate` pass whose
  * state is O(d²) per task (d=64 → 33 KB), independent of corpus size; no
  * shuffle of row data, no per-pair join. The d×d results then live on the
  * driver — bounded by the embedding dimension, never by the corpus — and
  * ship back to executors as broadcast constants for projection.
  */
object LinAlg {

  /** Per-dimension sums, upper-triangular cross-product sums, and the row
    * count — the sufficient statistics for mean/covariance/PCA, gathered
    * in one pass.
    */
  private def moments(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Double]) = {
    val vecs = df
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .rdd.map(_.getSeq[Double](0).toArray)
    val zero = (0L, null: Array[Double], null: Array[Double])
    def alloc(d: Int) = (new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    vecs.treeAggregate(zero)(
      seqOp = { case ((n, s0, p0), v) =>
        val d = v.length
        val (s, p) =
          if (s0 == null) alloc(d)
          else {
            require(s0.length == d,
              s"ragged embedding column: saw dims ${s0.length} and $d")
            (s0, p0)
          }
        var i = 0
        while (i < d) { s(i) += v(i); i += 1 }
        var idx = 0
        i = 0
        while (i < d) {
          var j = i
          while (j < d) { p(idx) += v(i) * v(j); j += 1; idx += 1 }
          i += 1
        }
        (n + 1, s, p)
      },
      combOp = {
        case (a, (0L, _, _)) => a
        case ((0L, _, _), b) => b
        case ((n1, s1, p1), (n2, s2, p2)) =>
          require(s1.length == s2.length,
            s"ragged embedding column: saw dims ${s1.length} and ${s2.length}")
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < p1.length) { p1(i) += p2(i); i += 1 }
          (n1 + n2, s1, p1)
      })
  }

  /** Population covariance matrix of the embedding column as an
    * upper-triangular long table (i, j, cov), i <= j, 0-based dims.
    * `cov = Σxy/n − (Σx/n)(Σy/n)` — the exact expression the DuckDB
    * oracle replays, so the two float paths agree to rounding.
    */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    val (n, sums, prods) = moments(df, vecCol)
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("cov", DoubleType, nullable = false)))
    if (n == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val d = sums.length
    val rows = new scala.collection.mutable.ArrayBuffer[Row](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        rows += Row(i, j, prods(idx) / n - (sums(i) / n) * (sums(j) / n))
        j += 1
        idx += 1
      }
      i += 1
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Top-k principal components of the embedding column.
    *
    * @param mean        per-dimension mean
    * @param components  k rows of d loadings, orthonormal, sign-fixed so
    *                    each component's largest-|loading| entry is positive
    *                    (power iteration's sign is otherwise arbitrary)
    * @param eigenvalues variances along the components, descending
    */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double])

  /** Deterministic PCA via power iteration + deflation on the driver-side
    * d×d covariance matrix (one corpus pass through [[moments]]; the eigen
    * solve is O(k·iters·d²) driver work — microseconds at d=64). A fixed
    * start vector and iteration count keep the model reproducible
    * run-to-run (to float-merge noise: treeAggregate reduces partition
    * moments in completion order); no RNG anywhere.
    */
  def pca(df: DataFrame, vecCol: String, k: Int, powerIters: Int = 100): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (n, sums, prods) = moments(df, vecCol)
    require(n > 0, "pca over an empty corpus")
    val d = sums.length
    require(k <= d, s"k=$k exceeds embedding dim $d")
    val mean = sums.map(_ / n)
    // dense symmetric covariance
    val c = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = prods(idx) / n - mean(i) * mean(j)
        c(i)(j) = v
        c(j)(i) = v
        j += 1
        idx += 1
      }
      i += 1
    }
    def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
      val out = new Array[Double](d)
      var r = 0
      while (r < d) {
        var s = 0.0
        var q = 0
        while (q < d) { s += m(r)(q) * v(q); q += 1 }
        out(r) = s
        r += 1
      }
      out
    }
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val comps = new Array[Array[Double]](k)
    val eigs = new Array[Double](k)
    for (comp <- 0 until k) {
      // deterministic start: uniform vector (never orthogonal to the top
      // eigenvector of a covariance matrix in practice; deflation keeps
      // later components orthogonal to earlier ones via re-projection)
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 1 to powerIters) {
        // re-orthogonalize against found components each step so numeric
        // drift can't leak the dominant direction back in
        for (p <- 0 until comp) {
          val proj = v.indices.map(x => v(x) * comps(p)(x)).sum
          v = v.indices.map(x => v(x) - proj * comps(p)(x)).toArray
        }
        val w = matVec(c, v)
        val nw = norm(w)
        v = if (nw > 0) w.map(_ / nw) else v
      }
      val cv = matVec(c, v)
      eigs(comp) = v.indices.map(x => v(x) * cv(x)).sum
      // sign convention: largest-|loading| entry positive
      val pivot = v.indices.maxBy(x => math.abs(v(x)))
      comps(comp) = if (v(pivot) < 0) v.map(-_) else v
    }
    PcaModel(mean, comps, eigs)
  }

  /** Project the embedding column onto a [[PcaModel]]'s components:
    * center, then dot with each loading vector; `whiten` additionally
    * scales each coordinate by 1/√eigenvalue so components come out unit
    * variance. The model rides to executors as a broadcast constant;
    * output replaces nothing — a new `projCol` array column (length k).
    */
  def projectPca(df: DataFrame, vecCol: String, model: PcaModel,
      projCol: String = "proj", whiten: Boolean = false): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val scale: Array[Double] =
      if (whiten) model.eigenvalues.map(e => if (e > 0) 1.0 / math.sqrt(e) else 0.0)
      else Array.fill(model.eigenvalues.length)(1.0)
    val bScale = df.sparkSession.sparkContext.broadcast(scale)
    val fn = udf { (v: Seq[Double]) =>
      val m = bc.value
      val s = bScale.value
      val centered = new Array[Double](m.mean.length)
      var i = 0
      while (i < centered.length) { centered(i) = v(i) - m.mean(i); i += 1 }
      m.components.indices.map { p =>
        var acc = 0.0
        var j = 0
        while (j < centered.length) { acc += centered(j) * m.components(p)(j); j += 1 }
        acc * s(p)
      }
    }
    df.withColumn(projCol,
      fn(transform(col(vecCol), x => x.cast("double"))))
  }
}

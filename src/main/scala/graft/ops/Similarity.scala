package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, mirroring the reference's prefilter/align split:
  *  - brute-force cosine top-k — the exact baseline; the query side is
  *    broadcast (small batch) against the full corpus scan, dot products run
  *    as codegen'd higher-order functions (`zip_with` + `aggregate`), no
  *    explode of the vector dimension;
  *  - IVF (inverted-file) — the 100 TB path: cluster centroids prune the
  *    corpus to `nprobe` partitions before the exact scan, trading recall
  *    for a corpus-fraction scan exactly like k-mer prefiltering trades
  *    sensitivity for scan rate.
  */
object Similarity {
  import org.apache.spark.sql.GraftShim
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{DataType, DoubleType}

  /** Codegen'd dot product over two double arrays — no intermediate array
    * allocation per pair (the `zip_with`+`aggregate` formulation builds a
    * 64-element array per scored pair, which dominates brute-force ANN).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var s = 0.0
      val n = math.min(x.numElements(), y.numElements())
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        int dpN = java.lang.Math.min($a.numElements(), $b.numElements());
        double dpS = 0.0;
        for (int i = 0; i < dpN; i++) {
          dpS += $a.getDouble(i) * $b.getDouble(i);
        }
        ${ev.value} = dpS;
        """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** dot(a, b) over array<double> columns (codegen'd, allocation-free). */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: queries x corpus -> (query_id, neighbor_id,
    * cos, rank), self-pairs excluded, rank ties broken by id.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms are precomputed per side BEFORE the pair join: |Q| + |C| norm
    // evaluations instead of |Q| x |C|
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Cluster centroids as elementwise means per `labelCol` — the IVF coarse
    * quantizer (here the corpus ships with cluster labels; at scale these
    * come from a k-means pass).
    */
  def centroids(corpus: DataFrame, labelCol: String): DataFrame =
    corpus
      .select(col(labelCol).as("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("mean"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pm"))
      .select(col("label"), transform(col("pm"), x => x.getField("mean")).as("centroid"))

  /** IVF top-k: route each query to its `nprobe` nearest centroids, scan
    * only those clusters, exact cosine within. Output matches cosineTopK's
    * schema (+probed flag distinguishes approximate from exact).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, labelCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val cents = centroids(corpus, labelCol)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("label"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("qv"), col("centroid")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("label"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col(labelCol).as("label"),
      norm(col("embedding")).as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(probes), Seq("label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (norm(col("qv")) * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Embedding near-dup pairs: all pairs with cosine >= threshold among a
    * query subset vs corpus (dedup use-case of the ANN path).
    */
  def embeddingNearDup(corpus: DataFrame, queryPred: Column,
      threshold: Double): DataFrame = {
    val q = corpus.filter(queryPred)
      .select(col("vec_id").as("a"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("b"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    c.crossJoin(broadcast(q))
      .filter(col("a") < col("b"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}

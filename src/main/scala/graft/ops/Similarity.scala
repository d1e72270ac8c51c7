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

  /** dot(a, b) via zip_with + aggregate — stays inside WholeStageCodegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: queries x corpus -> (query_id, neighbor_id,
    * cos, rank), self-pairs excluded, rank ties broken by id.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
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
      col("embedding").as("cv"), col(labelCol).as("label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(probes), Seq("label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
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
      .select(col("vec_id").as("a"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("b"), col("embedding").as("cv"))
    c.crossJoin(broadcast(q))
      .filter(col("a") < col("b"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}

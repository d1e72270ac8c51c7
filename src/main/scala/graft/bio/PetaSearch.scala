package graft.bio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end search driver — the `petasearch` / `easy-petasearch` workflow
  * (`src/workflow/petasearch.cpp`, `data/petasearch.sh`) collapsed into one
  * Spark program: the reference's four process boundaries become DataFrame
  * stages; its shell fan-out over target DBs becomes partition parallelism
  * (a loop of independent jobs union'd, or a `dbId` column).
  */
object PetaSearch {

  final case class Params(
      k: Int = KmerIndex.DefaultK,
      requiredKmerMatches: Int = Prefilter.RequiredKmerMatches,
      evalThr: Double = Align.DefaultEvalThr,
      xdrop: Int = Align.DefaultXdrop,
      gaps: Aligner.Gaps = Align.DefaultGaps,
      query: QueryTable.Config = QueryTable.Config())

  /** C13 m8 formatting (`src/sra/convertsraalignments.cpp:297-311`):
    * `qname tname fident(%.3f) alnlen mismatch gapopen qstart qend tstart
    * tend eval(%.2E) bits`, 1-based coordinates.
    */
  def toM8(alignments: DataFrame, queryNames: DataFrame,
      targetNames: DataFrame): DataFrame = {
    alignments
      .join(queryNames.select(col("seqId").as("queryId"), col("name").as("qname")),
        Seq("queryId"))
      .join(targetNames.select(col("seqId").as("targetId"), col("name").as("tname")),
        Seq("targetId"))
      .select(
        col("qname"), col("tname"),
        format_string("%.3f", col("fident")).as("fident"),
        col("alnLen"), col("mismatch"), col("gapOpen"),
        (col("qStart") + 1).as("qstart"), (col("qEnd") + 1).as("qend"),
        (col("tStart") + 1).as("tstart"), (col("tEnd") + 1).as("tend"),
        format_string("%.2E", col("eval")).as("evalue"), col("bits"),
        col("queryId"), col("targetId"), col("eval"))
      .orderBy(col("queryId"), col("eval"), col("bits").desc, col("targetId"))
      .drop("queryId", "targetId", "eval")
  }

  /** Aligned-pairs pipeline over already-ingested sequence tables.
    * Query-side k-mers go through the full createQueryTable path (masking,
    * bias-adjusted thresholds, similar-k-mer expansion) per the reference's
    * defaults; pass `query = QueryTable.Config(exactKmerMatching = true,
    * maskMode = false, biasCorrection = false)` for the exact-only path.
    */
  def search(spark: SparkSession, queries: DataFrame, targets: DataFrame,
      params: Params = Params()): DataFrame = {
    val index = KmerIndex.buildWithPos(targets, params.k)
    val qk = QueryTable.build(spark, queries, params.query.copy(k = params.k))
    val pf = Prefilter.runWithDiag(qk, index, params.requiredKmerMatches)
    Align.run(spark, pf, queries, targets, params.evalThr, params.xdrop, params.gaps)
  }

  /** Multi-target-DB fan-out (J2/J5/U1): the reference's `targetlist`
    * manifest becomes a sequence of target tables searched independently and
    * union'd (`data/petasearch.sh:42-65` shell fan-out as partition
    * parallelism; per-DB e-values use each DB's own residue count, exactly
    * like per-DB `blockalign` runs).
    */
  def searchMany(spark: SparkSession, queries: DataFrame,
      targets: Seq[DataFrame], params: Params = Params()): DataFrame =
    targets.map(t => search(spark, queries, t, params)).reduce(_.unionAll(_))

  /** FASTA-in / m8-out — `easy-petasearch`. */
  def easySearch(spark: SparkSession, queryFasta: String, targetFasta: String,
      params: Params = Params()): DataFrame = {
    val queries = Fasta.read(spark, queryFasta).cache()
    val targets =
      if (targetFasta == queryFasta) queries
      else Fasta.read(spark, targetFasta).cache()
    val alis = search(spark, queries, targets, params)
    toM8(alis, queries, targets)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full protein search pipeline (FASTA ingest -> k-mer
    * index -> similar-k-mer prefilter -> X-drop align -> BLAST-m8) as a
    * self-search of the bundled Cas7-11 fixture. Driver smoke-checks
    * rows>0 (21 self-hits + homolog hits).
    */
  def entry(spark: SparkSession): DataFrame =
    bio.BioQueries.bioSelfSearch.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}

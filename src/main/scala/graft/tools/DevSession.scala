package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for the dev measurement tools (BenchOne,
  * Bm25Scale, MergeScale): same config surface as `graft.Bench` —
  * SPARK_GRAFT_CPUS cores, AQE, the suite-sized codegen class cache, and
  * the TIMESTAMP(NANOS) legacy flag the events table needs.
  */
private[tools] object DevSession {
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

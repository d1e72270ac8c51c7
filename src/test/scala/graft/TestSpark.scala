package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // strict: a generated-code compile failure fails the test instead of
      // silently dropping the stage to interpreted eval (caught the
      // hard-coded-local collision in DotProduct/KmerEncode doGenCode)
      .config("spark.sql.codegen.fallback", "false")
      // the suite compiles hundreds of unique codegen classes; the default
      // 100-entry class cache thrashes across specs (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

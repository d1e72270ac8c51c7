package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected queries.
  * `runMain graft.tools.Explain [sfDir] [name ...]` (no names = a default
  * audit set). Used to keep plans honest: broadcast where expected, filters
  * pushed to the parquet scan, WholeStageCodegen spans wide.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("q2_join_agg", "bio_prefilter", "emb_cosine_topk", "q1_agg")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = Registry.byName
    names.foreach { n =>
      println(s"\n========== $n ==========")
      byName.get(n) match {
        case Some(q) => q.run(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.functions._
object MicroProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[micro] ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n%9d  $name")
    }
    // warm
    spark.range(1000000).repartition(32).count()
    time("shuffle 10M longs x32")(spark.range(10000000).repartition(32).count())
    time("shuffle 10M longs again")(spark.range(10000000).repartition(32).count())
    time("groupBy 10M -> 1M keys")(
      spark.range(10000000).select((col("id") % 1000000).as("k"))
        .groupBy("k").count().count())
    val strs = spark.range(2000000).select(concat(lit("shingle_value_"),
      (col("id") % 300000).cast("string")).as("s"))
    time("distinct 2M strings")(strs.distinct().count())
    time("distinct 2M strings again")(strs.distinct().count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: salted-vs-plain skew-join measurement on a MakeScale corpus
  * (round-12 verdict item #4). MakeScale's lineitem axis routes ~5% of
  * every replica's lineitem rows onto ONE hot orderkey, so at any k the
  * heavy hitter carries a scale-invariant double-digit-thousands row
  * count — the workload `SkewJoin.saltedHotKeys` exists for. This times
  * the q35 aggregation shape under (a) the plain equi-join and (b) the
  * gated salted join, on the same tables, and prints the hot key's row
  * count so the skew is on record. AQE is DISABLED for both arms: the
  * point is the manual fallback for engines/paths where runtime skew
  * splitting can't reach, so the comparison must not let AQE quietly
  * split the plain arm's straggler either.
  *
  * Usage: runMain graft.tools.SkewScale [sfDir]
  * (hotThreshold picks out true heavy hitters; TPC-H's organic 1-7
  * lines/order stay on the cold path)
  */
object SkewScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scale/sf1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = DevSession.local()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val top = li.groupBy("l_orderkey").count()
      .orderBy(desc("count")).head()
    println(s"[skewscale] $sfDir: hottest key ${top.getLong(0)} carries " +
      s"${top.getLong(1)} of ${li.count()} lineitem rows")
    def agg(j: DataFrame): DataFrame =
      j.groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        f"$dt%.2f s (rows=$n)"
      }
      println(s"[skewscale] $label: ${ts.mkString(", ")}")
    }
    time("plain join")(agg(li.join(o, Seq("l_orderkey"))))
    time("saltedHotKeys(buckets=32, hotThreshold=1000)")(
      agg(graft.ops.SkewJoin.saltedHotKeys(li, o, "l_orderkey",
        buckets = 32, hotThreshold = 1000)))
    spark.stop()
  }
}

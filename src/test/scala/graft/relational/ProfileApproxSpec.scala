package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q34 profiler's 100 TB escape hatch: at scale the exact
  * multi-distinct's Expand shuffle is swapped for approx_count_distinct
  * (HLL++) per column. This pins the accuracy of that swap on real data —
  * the approximate count must sit within the sketch's documented relative
  * error of the exact count for every profiled column, so the scale path
  * is a measured trade, not a hope.
  */
class ProfileApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact on every profiled column") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus")
    val row = li.agg(
      cols.flatMap(c => Seq(
        countDistinct(col(c)).as(s"${c}__e"),
        approx_count_distinct(col(c), rsd = 0.02).as(s"${c}__a"))).head,
      cols.flatMap(c => Seq(
        countDistinct(col(c)).as(s"${c}__e"),
        approx_count_distinct(col(c), rsd = 0.02).as(s"${c}__a"))).tail: _*)
      .head()
    cols.foreach { c =>
      val e = row.getAs[Long](s"${c}__e").toDouble
      val a = row.getAs[Long](s"${c}__a").toDouble
      assert(math.abs(a - e) <= math.max(1.0, e * 0.05),
        s"$c: approx $a vs exact $e drifts past 5%")
    }
  }
}

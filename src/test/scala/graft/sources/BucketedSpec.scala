package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed co-located join must produce the plain join's rows with
  * NO shuffle under the join operator.
  */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed lineitem x orders join has no Exchange below the join") {
    val d = "/root/testdata/sf0.001"
    // at sf0.001 Catalyst would broadcast the tiny orders side (also
    // shuffle-free, but not the plan under test); force the SMJ path the
    // bucketing exists for — at 100 TB neither fact side broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketed.bucketedJoinAgg(spark, d)
      df.collect() // force execution so AQE finalizes the plan
      // AQE nests the join inside query stages collect() won't traverse;
      // assert on the final plan text: the SMJ is present, and the only
      // Exchanges are the post-join priority agg + the final sort — no
      // shuffle on either join key
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("hashpartitioning(l_orderkey") &&
        !plan.contains("hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles a join key:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result == plain parquet join result") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val bucketed = Bucketed.bucketedJoinAgg(spark, d).collect().toSeq
    val plain = graft.Tables.lineitem(spark, d)
      .join(graft.Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    assert(bucketed == plain)
  }
}

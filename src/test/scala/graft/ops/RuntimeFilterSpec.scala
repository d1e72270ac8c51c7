package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom runtime filter: the pre-shuffle membership gate is COMPLETE (the
  * reduced join equals the plain join exactly), actually selective (a 20%
  * dim slice kills ~80% of fact rows before the shuffle), and null-safe.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def li = graft.Tables.lineitem(spark, sf)
  private def urgent = graft.Tables.orders(spark, sf)
    .filter(col("o_orderpriority") === "1-URGENT")

  test("bloom semi-join result equals the plain inner join") {
    val got = RuntimeFilter.bloomSemiJoin(li, "l_orderkey", urgent,
      "o_orderkey")
    val want = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("the probe is selective: ~dim fraction of fact survives, never less than true matches") {
    val bits = RuntimeFilter.buildBits(urgent, "o_orderkey")
    val total = li.count()
    val surviving = li.filter(
      RuntimeFilter.mightContain(col("l_orderkey"), bits, "long")).count()
    val trueMatches = li.join(urgent.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(surviving >= trueMatches, "false negative: bloom dropped a match")
    assert(surviving < (total * 0.35).toLong,
      s"20% dim slice should kill most fact rows, survived $surviving/$total")
  }

  test("the probe runs BELOW the join shuffle (plan audit)") {
    val got = RuntimeFilter.bloomSemiJoin(li, "l_orderkey", urgent,
      "o_orderkey")
    val plan = got.queryExecution.sparkPlan
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    // broadcast plans have no shuffle at all — equally fine; when the
    // join DOES shuffle, the bloom filter must sit under the exchange so
    // pruned rows never ship
    if (shuffles.nonEmpty) {
      val underShuffle = shuffles.exists(_.collect {
        case f: FilterExec if f.condition.toString.contains("element_at") => f
      }.nonEmpty)
      assert(underShuffle,
        "bloom probe filter must be below the fact-side exchange:\n" + plan)
    } else {
      assert(plan.collect {
        case f: FilterExec if f.condition.toString.contains("element_at") => f
      }.nonEmpty, "bloom probe filter missing from the plan")
    }
  }

  test("null fact keys fail the probe (inner-join semantics)") {
    val bits = RuntimeFilter.buildBits(urgent, "o_orderkey")
    val withNull = li.limit(5)
      .withColumn("l_orderkey", lit(null).cast("long"))
    assert(withNull.filter(
      RuntimeFilter.mightContain(col("l_orderkey"), bits, "long")).count() == 0)
  }

  test("string keys hash natively: semi-join equals the plain join") {
    // string keys whose long cast is null ('P-7', …) — the shape that
    // used to probe seed-only positions and drop true matches
    val fact = li.withColumn("ok", concat(lit("P-"), col("l_orderkey")))
    val dim = urgent.withColumn("dk", concat(lit("P-"), col("o_orderkey")))
      .select(col("dk"), col("o_orderpriority"))
    val got = RuntimeFilter.bloomSemiJoin(fact, "ok", dim, "dk")
    val want = fact.join(dim, col("ok") === col("dk"))
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("non-integral, non-string keys are rejected up front") {
    val dim = urgent.withColumn("dkey", col("o_totalprice")) // double
    intercept[IllegalArgumentException] {
      RuntimeFilter.buildBits(dim, "dkey")
    }
    intercept[IllegalArgumentException] {
      RuntimeFilter.bloomSemiJoin(
        li.withColumn("fkey", col("l_extendedprice")), "fkey", dim, "dkey")
    }
  }

  test("cross-domain key pairs (string fact × long dim) are rejected") {
    val fact = li.withColumn("ok", col("l_orderkey").cast("string"))
    intercept[IllegalArgumentException] {
      RuntimeFilter.bloomSemiJoin(fact, "ok", urgent, "o_orderkey")
    }
  }
}

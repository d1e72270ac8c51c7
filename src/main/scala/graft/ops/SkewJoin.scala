package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for heavy-hitter keys — the manual fallback when AQE
  * skew splitting isn't enough (e.g. a k-mer/shingle key where one value
  * carries a double-digit percentage of all rows).
  *
  * The skewed left side gets a random salt in [0, buckets); the right side
  * is replicated `buckets` times; the join key becomes (key, salt). Row
  * multiplicity is preserved exactly — results equal the plain join.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedLeft = left.withColumn("_salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Split-skew variant: only keys above `hotThreshold` occurrences are
    * salted; the long tail joins plainly (no replication cost for the 99%).
    */
  def saltedHotKeys(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, hotThreshold: Long): DataFrame = {
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotThreshold).select(col(key)).cache()
    val leftHot = left.join(hot, Seq(key), "left_semi")
    val leftCold = left.join(hot, Seq(key), "left_anti")
    val rightHot = right.join(hot, Seq(key), "left_semi")
    val rightCold = right.join(hot, Seq(key), "left_anti")
    salted(leftHot, rightHot, key, buckets)
      .unionByName(leftCold.join(rightCold, Seq(key)))
  }
}

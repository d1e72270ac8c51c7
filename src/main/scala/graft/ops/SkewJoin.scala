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
    * salted; the long tail rides salt 0 (no replication cost for the 99%).
    *
    * ONE join, not a hot/cold union: the hot-key census broadcasts onto
    * both sides, hot left rows draw a random salt in [0, buckets) while
    * cold rows take salt 0, and hot right rows replicate across every
    * salt while cold rows stay single — so the whole result is a single
    * (key, _salt) equi-join whose heavy hitters are spread over `buckets`
    * partitions. Compared to the semi/anti split this deletes two scans
    * of each input and two joins; the only overhead vs a plain join is
    * the census aggregation and the broadcast. The census is bounded by
    * construction — at most |left| / hotThreshold keys exceed the
    * threshold — and the caller picks a threshold that keeps that
    * broadcastable (a heavy hitter worth salting is rare by definition).
    */
  def saltedHotKeys(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, hotThreshold: Long): DataFrame = {
    require(buckets > 0)
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotThreshold)
      .select(col(key), lit(1).as("_hot")).cache()
    val saltedLeft = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt", when(col("_hot").isNotNull,
        (rand(seed = 42) * buckets).cast("int")).otherwise(lit(0)))
      .drop("_hot")
    val replicatedRight = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt", explode(sequence(lit(0),
        when(col("_hot").isNotNull, lit(buckets - 1)).otherwise(lit(0)))))
      .drop("_hot")
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: does repartition(col) + localCheckpoint preserve a
  * partitioning that a later equi-join can reuse (zero Exchange)?
  * `runMain graft.tools.PartProbe`
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = DevSession.local()
    import spark.implicits._
    val e = (1 to 10000).map(i => (i % 97, i)).toDF("a", "b")
      .repartition(col("a"))
      .distinct()
      .localCheckpoint()
    println("[probe] edges partitions=" + e.rdd.getNumPartitions)
    println("[probe] edges outputPartitioning=" +
      e.queryExecution.executedPlan.outputPartitioning)
    val r = e.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    println("[probe] ranks outputPartitioning=" +
      r.queryExecution.executedPlan.outputPartitioning)
    val j = e.join(r.select(col("node").as("a"), col("deg")), Seq("a"))
    j.write.format("noop").mode("overwrite").save()
    val plan = j.queryExecution.executedPlan.toString
    println("[probe] join exchanges=" +
      "Exchange".r.findAllIn(plan).size)
    println(plan.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import scala.collection.mutable

/** Dev profiler: warm-run wall time, per-action split, and per-stage
  * task-time/shuffle metrics of registry queries (comma-separated).
  * `runMain graft.tools.JobProf q1,q2 [sfDir]`
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val qnames = args(0).split(',').toSeq
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("PROF_MINPS", "1m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // (stage name, task time s, shuffle read MB, shuffle write MB, tasks)
    val stages = mutable.ArrayBuffer.empty[(String, Double, Double, Double, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val m = e.stageInfo.taskMetrics
          if (m != null) stages += ((e.stageInfo.name.take(90),
            m.executorRunTime / 1e3,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            e.stageInfo.numTasks))
        }
    })
    qnames.foreach { qname =>
      val q = graft.Registry.byName(qname)
      try q.run(spark, sf).count() catch { case e: Throwable => println(e) }
      spark.catalog.clearCache()
      Thread.sleep(300)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      q.run(spark, sf).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(500)
      stages.synchronized {
        val tot = stages.map(_._2).sum
        println(f"[prof] $qname wall=$wall%.2f s, stages=${stages.size}, sum(task time)=$tot%.2f s")
        stages.sortBy(-_._2).take(12).foreach { case (n, t, sr, sw, k) =>
          println(f"[prof]   $t%7.2f s  tasks=$k%3d  shufR=$sr%7.1fMB shufW=$sw%7.1fMB  $n")
        }
      }
    }
    spark.stop()
  }
}

/** Per-operator metric dump of ONE query's final action: executed plan
  * nodes with their populated SQL metrics (codegen durations, rows).
  * `runMain graft.tools.OpProf <query> [sfDir]`
  */
object OpProf {
  def main(args: Array[String]): Unit = {
    val qname = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var last: QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        last = qe
      def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    val q = graft.Registry.byName(qname)
    try q.run(spark, sf).count() catch { case e: Throwable => println(e) }
    spark.catalog.clearCache()
    q.run(spark, sf).count()
    Thread.sleep(800)
    val rows = mutable.ArrayBuffer.empty[(Long, String)]
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[org.apache.spark.sql.execution.SparkPlan, java.lang.Boolean]())
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      if (!seen.add(p)) return
      val interesting = p.metrics.filter { case (k, m) =>
        (k.toLowerCase.contains("time") || k.toLowerCase.contains("duration") ||
          k == "numOutputRows") && m.value > 0
      }
      if (interesting.nonEmpty) {
        val dur = interesting.collect {
          case (k, m) if k != "numOutputRows" => m.value }.maxOption.getOrElse(0L)
        rows += ((dur, p.nodeName + " :: " + interesting.map { case (k, m) =>
          s"$k=${m.value}" }.mkString(", ")))
      }
      p.children.foreach(walk)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(qs.plan)
        case ie: org.apache.spark.sql.execution.InputAdapter => walk(ie.child)
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => walk(w.child)
        case re: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(re.child)
        case _ =>
      }
    }
    if (last != null) walk(last.executedPlan)
    rows.sortBy(-_._1).take(30).foreach { case (d, s) =>
      println(f"[op] $d%8d  ${s.take(160)}")
    }
    spark.stop()
  }
}

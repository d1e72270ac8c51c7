package graft.tools
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import scala.collection.mutable
object JobProf {
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
    val acts = mutable.ArrayBuffer.empty[(String, Double, String)]
    spark.listenerManager.register(new QueryExecutionListener {
      def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        acts.synchronized {
          acts += ((fn, ns / 1e9,
            qe.analyzed.getClass.getSimpleName + " " +
              qe.analyzed.toString.linesIterator.take(1).mkString.take(100)))
        }
      def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    val q = graft.Registry.byName(qname)
    try q.run(spark, sf).count() catch { case e: Throwable => println(e) }
    spark.catalog.clearCache()
    Thread.sleep(500)
    acts.synchronized(acts.clear())
    val t0 = System.nanoTime()
    q.run(spark, sf).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    Thread.sleep(800)
    acts.synchronized {
      val tot = acts.map(_._2).sum
      println(f"[prof] $qname wall=$wall%.2f s, actions=${acts.size}, sum(action)=$tot%.2f s")
      acts.sortBy(-_._2).take(25).foreach { case (fn, s, d) =>
        println(f"[prof]   $s%6.3f s  $fn%-18s $d")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: as-of join shuffle-payload measurement (round-9 verdict item
  * #8). The union-tag-window plan carries the FULL left row through its
  * key shuffle (`AsofJoin.asofCore` packs it into `_lrow`); with a wide
  * left table (documents: ~KB of text per row) that payload dominates
  * shuffle bytes. This measures wall time + shuffle write bytes for the
  * same as-of join under (a) the default carry-everything contract and
  * (b) the `leftCols` projection contract, on a documents-as-left fixture
  * where each doc gets a synthetic (user bucket, timestamp) and joins to
  * a small per-bucket snapshot table.
  *
  * Usage: runMain graft.tools.AsofScale [sfDir]
  */
object AsofScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = DevSession.local()
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleWriteMetrics != null)
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        (col("doc_id") % 50).as("k"),
        timestamp_micros(col("doc_id") * 1000000L).as("ts"))
    val snaps = spark.range(0, 50 * 200)
      .select((col("id") % 50).as("k"),
        timestamp_micros(col("id") * 37000000L).as("ts"),
        (col("id") * 3).cast("double").as("v"))
    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to trials).map { _ =>
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        // noop write materializes EVERY output column — a count() would
        // let Catalyst prune the wide payload out of the plan and measure
        // nothing
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // listener events drain asynchronously; give them a beat
        Thread.sleep(500)
        f"$dt%.2f s / ${shuffleBytes.get() / 1e6}%.1f MB"
      }
      println(s"[asofscale] $label: ${ts.mkString(", ")}")
    }
    time("full-row carry") {
      graft.ops.AsofJoin.asofBackward(docs, snaps, Seq("k"), "ts", Seq("v"))
    }
    time("leftCols projection (doc_id only)") {
      graft.ops.AsofJoin.asofBackward(docs, snaps, Seq("k"), "ts", Seq("v"),
        leftCols = Seq("doc_id"))
    }
    spark.stop()
  }
}

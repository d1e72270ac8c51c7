package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.{IncrementalView, Versioned}

/** Dev tool: incremental-view REFRESH vs full RECOMPUTE as the source
  * table grows — the claim under test is that
  * [[graft.sources.IncrementalView.refresh]] costs O(delta)+O(groups)
  * while the recompute it replaces costs O(table). Builds a versioned
  * source of K× the sf events (id-strided replicas), materializes the
  * view, lands ONE fixed-size delta commit (the same rows at every K),
  * then measures refresh vs a from-scratch recompute of the same
  * aggregates. At local bench scale wall time is fixed-cost dominated
  * (a 1M-row scan is nothing for 32 cores), so the scale-invariant
  * metric is BYTES READ per arm (the ResampleScale idiom — at 100 TB
  * the bytes ARE the cost): expect refresh ~flat in K (delta + view)
  * and recompute ~linear (the whole table).
  *
  * Usage: runMain graft.tools.ViewScale [sfDir] [maxK]
  */
object ViewScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxK = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = DevSession.local()
    val bytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      })
    val ev = graft.Tables.events(spark, sfDir)
    val stride = 100000000L
    val ks = Seq(1, maxK)
    ks.foreach { k =>
      val root = java.nio.file.Files.createTempDirectory("viewscale")
        .toString
      val (src, vw) = (s"$root/t", s"$root/v")
      val big = (0 until k).map(i =>
        ev.withColumn("event_id", col("event_id") + lit(i * stride)))
        .reduce(_ unionByName _)
      Versioned.append(big.repartition(32), src)
      IncrementalView.create(spark, src, vw, Seq("event_type"), "value")
      // the delta is IDENTICAL at every K: a small late batch
      Versioned.append(ev.filter(col("event_id") % 1000 === 7)
        .withColumn("event_id", col("event_id") + lit(stride * 1000L)), src)
      def measure(f: => Unit): (Double, Double) = {
        Thread.sleep(1000) // drain the listener bus from the previous arm
        bytes.set(0)
        val t0 = System.nanoTime(); f
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000)
        (t, bytes.get() / 1e6)
      }
      val (tRefresh, bRefresh) = measure(IncrementalView.refresh(spark,
        src, vw, Seq("event_type"), "value"))
      val (tRecompute, bRecompute) = measure(IncrementalView.create(spark,
        src, s"$root/v_scratch", Seq("event_type"), "value"))
      val n = Versioned.read(spark, src).count()
      // exact scan SCOPE from the manifest (files an arm may open at
      // all): the refresh's CDF span covers only the delta commit's
      // files; the recompute's snapshot read covers every data file
      val sizes = Versioned.dataFileSizes(spark, src)
      val base = Versioned.dataFileSizes(spark, src,
        Some(Versioned.currentVersion(src) - 1)).keySet
      val scopeDelta = sizes.collect {
        case (p, len) if !base(p) => len }.sum / 1e6
      val scopeAll = sizes.values.sum / 1e6
      println(f"[viewscale] k=$k rows=$n refresh=$tRefresh%.2f s " +
        f"($bRefresh%.3f MB read, scope $scopeDelta%.3f MB) " +
        f"recompute=$tRecompute%.2f s ($bRecompute%.3f MB read, scope " +
        f"$scopeAll%.2f MB) scope ratio=${scopeAll / scopeDelta}%.0f x")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measures whether `EventsStream.processResampleBatch`'s
  * per-trigger cost stays FLAT as the maintained table's history grows —
  * the write-amplification property the scd2 sink was originally dinged
  * for. The sf0.1 events span 30 days; feeding them as 30 daily triggers
  * grows the table 30× while each trigger touches ONE date partition, so
  * the incremental arm's per-trigger time must not trend with trigger
  * index. The naive arm (read whole table + union + full overwrite — the
  * sink everyone writes first) is the control: its per-trigger time grows
  * with the table.
  *
  * Usage: runMain graft.tools.ResampleScale [sfDir]
  */
object ResampleScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = DevSession.local()
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("_d", to_date(col("ts")))
    val days = ev.select(col("_d")).distinct()
      .orderBy(col("_d")).as[java.sql.Date].collect()
    println(s"[resamplescale] ${days.length} daily triggers from $sfDir")

    // bytes written per trigger = sizes of parquet files whose mtime is at
    // or after the trigger start — at local scale wall time is fixed-cost
    // dominated, so WRITE BYTES are the scale-invariant amplification
    // metric (at 100 TB the bytes ARE the cost)
    def writtenSince(dir: String, t0Millis: Long): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet") && f.lastModified() >= t0Millis)
          f.length()
        else 0L
      val root = new java.io.File(dir)
      if (root.exists()) walk(root) else 0L
    }

    def run(label: String)(fold: (org.apache.spark.sql.DataFrame, String)
        => Unit): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("rescale").toString
      val stats = days.map { d =>
        val batch = ev.filter(col("_d") === lit(d)).drop("_d")
          .localCheckpoint()
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        fold(batch, dir)
        ((System.nanoTime() - t0) / 1e9, writtenSince(dir, w0))
      }
      def avg(xs: Seq[Double]) = xs.sum / xs.length
      val (times, bytes) = (stats.map(_._1).toSeq, stats.map(_._2).toSeq)
      val bFirst = avg(bytes.take(5).map(_.toDouble)) / 1e6
      val bLast = avg(bytes.takeRight(5).map(_.toDouble)) / 1e6
      println(f"[resamplescale] $label: time first5 ${avg(times.take(5))}%.2f" +
        f" s last5 ${avg(times.takeRight(5))}%.2f s; WRITE first5 " +
        f"$bFirst%.2f MB last5 $bLast%.2f MB, write growth " +
        f"${bLast / bFirst}%.1fx, total written ${bytes.sum / 1e6}%.0f MB")
    }

    run("incremental (dynamic overwrite of touched dates)") { (b, dir) =>
      graft.streaming.EventsStream.processResampleBatch(b, dir)
    }

    // control: the fold everyone writes first — whole-table rewrite
    run("naive (full-table rewrite per trigger)") { (b, dir) =>
      val bh = b
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("h"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"), col("m.value").as("v"))
      val prev =
        try spark.read.parquet(dir).select(
          col("user_id"), col("h"), col("ts"), col("event_id"), col("v"))
        catch {
          case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              bh.schema)
        }
      prev.unionByName(bh)
        .groupBy(col("user_id"), col("h"))
        .agg(max(struct(col("ts"), col("event_id"), col("v"))).as("m"))
        .select(col("user_id"), col("h"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"), col("m.v").as("v"))
        .localCheckpoint()
        .write.mode("overwrite").parquet(dir)
    }

    spark.stop()
  }
}

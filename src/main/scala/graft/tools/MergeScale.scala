package graft.tools

import org.apache.spark.sql.{functions => F}

/** Dev tool: measure OPERATIONAL incremental cluster maintenance
  * (BASELINE §e) — the cost a deployed pipeline pays per batch once
  * labels already exist — against the full components() recompute it
  * replaces. Setup (untimed): estimated near-dup pairs over the corpus,
  * split 90/10 by doc id, labels built from the 90% side. Timed:
  * (a) mergeComponents(labels, batch pairs), (b) components(all pairs).
  *
  * Usage: runMain graft.tools.MergeScale [sfDir]
  */
object MergeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = DevSession.local()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // setup, untimed: pair discovery + the pre-existing label table
    val pairs = graft.ops.Dedup.nearDuplicatesEstimated(docs,
      "doc_id", "text", shingleSize = 2, numHashes = 8, rowsPerBand = 2,
      threshold = 0.5).localCheckpoint()
    val oldPairs = pairs
      .filter(F.col("a") % 10 =!= 0 && F.col("b") % 10 =!= 0)
      .localCheckpoint()
    val batch = pairs
      .filter(F.col("a") % 10 === 0 || F.col("b") % 10 === 0)
      .localCheckpoint()
    val labels = graft.ops.Dedup.components(oldPairs).localCheckpoint()
    def time(tag: String)(body: => Long): Unit = {
      val ts = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        f"$dt%.2f" + s" (rows=$n)"
      }
      println(s"[mergescale] $sfDir $tag: ${ts.mkString(", ")}")
    }
    time("mergeComponents(uniform 10% batch — touches ~every cluster)") {
      graft.ops.Dedup.mergeComponents(labels, batch).count()
    }
    time("components(full recompute)") {
      graft.ops.Dedup.components(pairs).count()
    }
    // scenario B (MakeScale corpora only): the batch is one whole replica —
    // disjoint from every existing cluster, the realistic "new crawl
    // neighborhood" shape where incrementality pays: old labels pass
    // through untouched and the merge costs ~components(batch) alone
    val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
    if (maxId >= 1000000L) {
      val cut = (maxId / 1000000L) * 1000000L
      val oldB = pairs.filter(F.col("a") < cut && F.col("b") < cut)
        .localCheckpoint()
      val batchB = pairs.filter(F.col("a") >= cut || F.col("b") >= cut)
        .localCheckpoint()
      val labelsB = graft.ops.Dedup.components(oldB).localCheckpoint()
      time("mergeComponents(disjoint replica batch)") {
        graft.ops.Dedup.mergeComponents(labelsB, batchB).count()
      }
    }
    // scenario C (fixed ABSOLUTE batch vs scaled labels): the batch is
    // replica 0's %10 pairs — IDENTICAL at any MakeScale k, since salting
    // preserves replica 0's pair structure exactly — while the label
    // table scales with k. Backs the O(touched-clusters + batch) claim
    // directly: the delta path's time should be ~flat in k (ratio ≈ 1×),
    // because untouched components cost only the two label-table
    // semi-joins, never CC work. mergeComponentsDelta is the operational
    // primitive (its output is bounded by touched clusters, so the count
    // doesn't rescan the untouched passthrough); the full-contract
    // mergeComponents row shows the O(labels) passthrough union on top.
    val stride = 1000000L
    val inBatchC = F.col("a") < stride && F.col("b") < stride &&
      (F.col("a") % 10 === 0 || F.col("b") % 10 === 0)
    val batchC = pairs.filter(inBatchC).localCheckpoint()
    val labelsC = graft.ops.Dedup.components(pairs.filter(!inBatchC))
      .localCheckpoint()
    println(s"[mergescale] $sfDir fixed-batch C: batch=${batchC.count()} " +
      s"pairs, labels=${labelsC.count()} rows")
    time("mergeComponentsDelta(fixed replica-0 batch)") {
      graft.ops.Dedup.mergeComponentsDelta(labelsC, batchC).count()
    }
    time("mergeComponents(fixed replica-0 batch, full output)") {
      graft.ops.Dedup.mergeComponents(labelsC, batchC).count()
    }
    spark.stop()
  }
}

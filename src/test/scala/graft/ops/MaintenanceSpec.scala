package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index compaction: content-identical rewrites that shrink the file
  * count without disturbing meta, centroids, or replay markers.
  */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(dir))
  }

  test("compactDedupIndex: fewer files, identical probe results, marker survives") {
    def doc(i: Long) = (i, (0 until 8).map(j => s"w${i / 4}x$j").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("cmpidx").toString
    Dedup.buildDedupIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", dir, shingleSize = 2, numHashes = 8)
    (0 until 4).foreach { b =>
      graft.streaming.DedupStream.processIndexBatch(
        (b * 10L until b * 10L + 10L).map(doc).toDF("doc_id", "text"),
        b.toLong, "doc_id", "text", dir,
        java.nio.file.Files.createTempDirectory("cmpout").toString)
    }
    val probe = (100L until 104L).map(doc).toDF("doc_id", "text")
    def search() = Dedup.searchDedupIndex(probe, "doc_id", "text", dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val before = search()
    val filesBefore = parquetFiles(s"$dir/signatures").size
    Maintenance.compactDedupIndex(spark, dir, numFiles = 2)
    assert(parquetFiles(s"$dir/signatures").size == 2)
    assert(parquetFiles(s"$dir/signatures").size < filesBefore)
    assert(search() == before && before.nonEmpty)
    // the streaming high-watermark is untouched: batch 3 still replays
    assert(graft.streaming.DedupStream.committedBatchId(spark, dir) == 3L)
  }

  test("compactAnnIndex: one file per label, identical neighbors") {
    val rnd = new scala.util.Random(7)
    val dirs = Seq(Array(10.0, 0.0, 0.0), Array(0.0, 10.0, 0.0),
      Array(0.0, 0.0, 10.0))
    val base = dirs.zipWithIndex.flatMap { case (dv, b) =>
      (0 until 15).map(j =>
        ((b * 15 + j).toLong, dv.map(_ + rnd.nextGaussian() * 0.2)))
    }
    val db = java.nio.file.Files.createTempDirectory("cmpann").toString
    Similarity.buildAnnIndex(base.toDF("vec_id", "embedding"), db,
      nClusters = 3, iters = 3)
    (0 until 3).foreach { b =>
      Similarity.appendToAnnIndex(
        base.take(5).map { case (i, v) => (i + 1000L * (b + 1), v) }
          .toDF("vec_id", "embedding"), db)
    }
    val queries = base.take(4).map { case (i, v) => (i + 9000L, v) }
      .toDF("vec_id", "embedding")
    def ann() = Similarity.searchAnnIndexed(spark, db, queries, 5, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val before = ann()
    Maintenance.compactAnnIndex(spark, db)
    val labelDirs = new java.io.File(s"$db/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("label="))
    assert(labelDirs.nonEmpty)
    labelDirs.foreach { d =>
      assert(parquetFiles(d.getPath).size == 1,
        s"${d.getName} not compacted to one file")
    }
    assert(ann() == before && before.nonEmpty)
  }

  test("rebalanceAnnIndex: drifted appends re-cluster cleanly, content preserved, marker cleared") {
    val rnd = new scala.util.Random(19)
    def around(c: Array[Double], n: Int, idBase: Long) =
      (0 until n).map(j =>
        (idBase + j, c.map(_ + rnd.nextGaussian() * 0.1)))
    // build on two tight families; centroids freeze there
    val fam0 = around(Array(10.0, 0.0, 0.0), 20, 0L)
    val fam1 = around(Array(0.0, 10.0, 0.0), 20, 100L)
    val db = java.nio.file.Files.createTempDirectory("rebal").toString
    Similarity.buildAnnIndex((fam0 ++ fam1).toDF("vec_id", "embedding"), db,
      nClusters = 2, iters = 4)
    // a THIRD family arrives only via frozen-centroid appends: all its
    // vectors pile into whichever stored centroid is nearest
    val fam2 = around(Array(0.0, 0.0, 10.0), 30, 200L)
    Similarity.appendToAnnIndex(fam2.toDF("vec_id", "embedding"), db)
    graft.streaming.DedupStream.processAnnBatch(
      around(Array(0.0, 0.0, 10.0), 10, 300L).toDF("vec_id", "embedding"),
      0L, db)
    val idsBefore = spark.read.parquet(s"$db/vectors")
      .select("vec_id").as[Long].collect().toSet

    Similarity.rebalanceAnnIndex(spark, db, iters = 3)

    val after = spark.read.parquet(s"$db/vectors")
      .select("vec_id", "label").as[(Long, Int)].collect()
    // content preserved exactly; still the pinned cluster count
    assert(after.map(_._1).toSet == idsBefore)
    assert(after.map(_._2).distinct.length == 2)
    // every family is label-pure after the warm-started re-cluster: the
    // big drifted family now owns a centroid instead of squatting
    def labelsOf(p: Long => Boolean) =
      after.filter(t => p(t._1)).map(_._2).toSet
    val l2 = labelsOf(id => id >= 200L)
    assert(l2.size == 1, s"drifted family split across $l2")
    assert(labelsOf(id => id < 200L).intersect(l2).isEmpty
      || labelsOf(id => id < 100L).size == 1,
      "drifted family still shares a cluster with a build-time family")
    // probes still work against the new layout; marker cleared
    val q = Seq((9000L, Array(0.0, 0.0, 10.0))).toDF("vec_id", "embedding")
    val nn = Similarity.searchAnnIndexed(spark, db, q, 5, 1)
      .select("neighbor_id").as[Long].collect()
    assert(nn.nonEmpty && nn.forall(_ >= 200L),
      s"probe into the drifted family returned ${nn.toSeq}")
    assert(graft.streaming.DedupStream.committedBatchId(spark, db) == -1L)
  }
}

package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming windowed aggregation must produce exactly the batch
  * q12-style result when fed the same events through a file source —
  * the cross-check SCALE.md promises.
  */
class StreamBatchEquivalenceSpec extends AnyFunSuite {

  test("file-source stream of sf0.001 events == batch windowed aggregation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")

    val batch = EventsStream.windowedCounts(events)
      .select($"window_start", $"event_type", $"n", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    // stage the events as parquet and stream them back with the same schema
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = EventsStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("wineq").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wineq")
        .select($"window_start", $"event_type", $"n", $"sum_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming simhash near-dup pairs == batch simhashPairs (all-pairs)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0L until 40L).map { i =>
      val toks = (0 until 6).map(j => words(((i / 5) + j).toInt % words.length))
      DedupStream.DocRow(i, toks.mkString(" "))
    }

    // batch truth over the same corpus, unrestricted query side
    val batchPairs = graft.ops.Dedup.simhashPairs(
      docs.toDF("doc_id", "text").withColumnRenamed("doc_id", "doc_id"),
      "doc_id", "text", lit(true), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).intValue)).toSet

    // per-row simhash must equal the grouped batch formulation
    val batchSigs = graft.ops.Dedup.simhash64(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach(d =>
      assert(DedupStream.simhash64Value(d.text) == batchSigs(d.doc_id)))

    // stream in two micro-batches through MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DedupStream.DocRow]
    val q = DedupStream.nearDupPairs(mem.toDS(), maxHamming = 3)
      .writeStream.format("memory").queryName("ndeq").outputMode("append")
      .start()
    try {
      mem.addData(docs.take(20): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(20): _*)
      q.processAllAvailable()
      val streamed = spark.table("ndeq")
        .as[DedupStream.NearDupHit].collect()
        .map(h => (h.a, h.b, h.hamming)).toSet // cross-band dups collapse
      assert(streamed == batchPairs)
      assert(batchPairs.nonEmpty)
    } finally q.stop()
  }
}

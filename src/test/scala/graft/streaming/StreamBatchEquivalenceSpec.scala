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
}

package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowed counts over a memory stream match the batch shape") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    mem.addData(
      EventsStream.Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      EventsStream.Event(2, ts("2024-01-01 10:45:00"), 1, "click", 2.0),
      EventsStream.Event(3, ts("2024-01-01 11:05:00"), 2, "view", 3.0))
    val q = EventsStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only after watermark passes; push a late-hour event
      mem.addData(EventsStream.Event(4, ts("2024-01-01 13:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win").collect()
      val clicks10 = rows.find(r =>
        r.getAs[String]("event_type") == "click" &&
          r.getAs[java.sql.Timestamp]("window_start") == ts("2024-01-01 10:00:00"))
      assert(clicks10.isDefined)
      assert(clicks10.get.getAs[Long]("n") == 2)
      assert(clicks10.get.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming dedup drops later copies of the same content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    mem.addData(
      (ts("2024-01-01 10:00:00"), "same text"),
      (ts("2024-01-01 10:05:00"), "same text"),
      (ts("2024-01-01 10:06:00"), "other text"))
    val q = EventsStream.dedupStream(
      mem.toDF().toDF("ts", "text"), "ts", "text")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("dedup").select("text").as[String].collect()
      assert(rows.sorted.toSeq == Seq("other text", "same text"))
    } finally q.stop()
  }

  test("stateful sessionization closes a session on a 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.Event]
    mem.addData(
      EventsStream.Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      EventsStream.Event(2, ts("2024-01-01 10:10:00"), 7, "view", 1.0),
      EventsStream.Event(3, ts("2024-01-01 11:30:00"), 7, "click", 1.0))
    val q = EventsStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
      assert(rows.length == 1) // first session closed by the in-batch gap
      assert(rows.head.getAs[Long]("n_events") == 2)
      assert(rows.head.getAs[Boolean]("closed"))

      // trailing session (11:30, still open): once another user's event
      // pushes the watermark past end + gap, the EventTimeTimeout flushes
      // it — no session lives in state forever
      mem.addData(EventsStream.Event(4, ts("2024-01-01 14:00:00"), 8, "click", 1.0))
      q.processAllAvailable()
      val after = spark.table("sess").collect()
      assert(after.length == 2)
      val trailing = after.filter(r => r.getAs[Long]("user_id") == 7L &&
        r.getAs[Long]("n_events") == 1L)
      assert(trailing.length == 1)
      assert(trailing.head.getAs[java.sql.Timestamp]("start") == ts("2024-01-01 11:30:00"))
      assert(trailing.head.getAs[java.sql.Timestamp]("end") == ts("2024-01-01 11:30:00"))
      assert(trailing.head.getAs[Boolean]("closed"))
      // user 8's fresh session stays open: the watermark hasn't passed it
      assert(!after.exists(r => r.getAs[Long]("user_id") == 8L))
    } finally q.stop()
  }

  // Regression: a plain timestamp[us] parquet column reads back as
  // TIMESTAMP_NTZ, which withWatermark rejects at streaming analysis time
  // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Every streaming ingest must
  // normalize the event-time column so a parquet round-trip can never
  // change whether a query analyzes — this pins the round-10/11 NTZ
  // environment shift that broke StreamBatchEquivalenceSpec.
  test("NTZ event-time columns stream through watermarked ops unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ntzstream").toString
    Seq(
      (1L, "2024-01-01T10:05:00", 1L, "click", 1.0),
      (2L, "2024-01-01T10:45:00", 1L, "click", 2.0),
      (3L, "2024-01-01T13:00:00", 2L, "view", 3.0))
      .toDF("event_id", "s", "user_id", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    assert(schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventsStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("ntzwin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // the 13:00 event pushed the watermark past the 10:00 window
      val rows = spark.table("ntzwin").collect()
      val clicks10 = rows.find(r =>
        r.getAs[String]("event_type") == "click" &&
          r.getAs[java.sql.Timestamp]("window_start") == ts("2024-01-01 10:00:00"))
      assert(clicks10.isDefined && clicks10.get.getAs[Long]("n") == 2)
    } finally q.stop()

    // dedupStream over the same NTZ ingest must also analyze and run
    val q2 = EventsStream.dedupStream(
      spark.readStream.schema(schema).parquet(dir)
        .select(col("ts"), col("event_type").as("text")), "ts", "text")
      .writeStream.format("memory").queryName("ntzdedup")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val kinds = spark.table("ntzdedup").select("text").as[String]
        .collect().sorted
      assert(kinds.toSeq == Seq("click", "view"))
    } finally q2.stop()
  }
}

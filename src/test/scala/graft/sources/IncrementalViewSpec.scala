package graft.sources

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized view: CDF-folded aggregates must equal a
  * full recompute after every mutation kind the source table supports,
  * refreshes are exactly-once (watermark rides in the commit), and
  * group births/deaths/null-groups are tracked.
  */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = graft.Tables.events(spark, "/root/testdata/sf0.001")

  /** Rounded comparison: the incremental fold and the recompute sum in
    * different orders, so doubles agree to ~1e-12 relative, not bitwise
    * (two plain recomputes wouldn't be bitwise-equal either).
    */
  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    def r(df: DataFrame) = df.select(col("event_type"),
      round(col("sum_value"), 4).as("s"), col("n_rows"))
    assert(r(got).exceptAll(r(want)).isEmpty &&
      r(want).exceptAll(r(got)).isEmpty,
      s"view mismatch:\ngot ${got.collect().toSeq}\n" +
        s"want ${want.collect().toSeq}")
  }

  private def recompute(src: String): DataFrame =
    Versioned.read(spark, src).groupBy(col("event_type"))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n_rows"))

  test("refresh == recompute across append, COW upsert, MOR delete, " +
    "predicate delete, compact") {
    val src = java.nio.file.Files.createTempDirectory("ivs").toString + "/t"
    val vw = java.nio.file.Files.createTempDirectory("ivv").toString + "/v"
    Versioned.append(ev.filter(col("event_id") % 2 === 0)
      .repartitionByRange(4, col("event_id")), src)
    IncrementalView.create(spark, src, vw, Seq("event_type"), "value")
    assert(IncrementalView.syncedVersion(vw) == 1)
    assertSame(Versioned.read(spark, vw), recompute(src))

    // append
    Versioned.append(ev.filter(col("event_id") % 4 === 1), src)
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))

    // COW upsert that MOVES rows between groups and changes values
    Versioned.upsert(ev.filter(col("event_id") % 100 === 0)
      .withColumn("value", col("value") + 1000)
      .withColumn("event_type", lit("patched")), src, "event_id")
    // MOR equality delete
    Versioned.deleteByKeyMor(ev.filter(col("event_id") % 10 === 3)
      .select(col("event_id")), src, "event_id")
    // one refresh folds BOTH commits
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))

    // predicate delete can kill a whole group (group death)
    Versioned.delete(spark, src, col("event_type") === "patched")
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))
    assert(Versioned.read(spark, vw)
      .filter(col("event_type") === "patched").count() == 0)

    // compaction is content-neutral: refresh folds an empty delta
    Versioned.compact(spark, src, numFiles = 2)
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))
  }

  test("no-op refresh mints no commit; watermark is exactly-once") {
    val src = java.nio.file.Files.createTempDirectory("ivs2").toString + "/t"
    val vw = java.nio.file.Files.createTempDirectory("ivv2").toString + "/v"
    Versioned.append(ev.limit(100), src)
    IncrementalView.create(spark, src, vw, Seq("event_type"), "value")
    val v1 = Versioned.currentVersion(vw)
    assert(IncrementalView.refresh(spark, src, vw,
      Seq("event_type"), "value") == v1)
    assert(Versioned.currentVersion(vw) == v1)
    // a second refresh after one source commit folds exactly once
    Versioned.append(ev.limit(50).withColumn("event_id",
      col("event_id") + 1000000L), src)
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))
    assert(IncrementalView.syncedVersion(vw) ==
      Versioned.currentVersion(src))
  }

  test("viewMaintSink: streamed source + maintained view == recompute; " +
    "a redelivered batch folds exactly once") {
    val root = java.nio.file.Files.createTempDirectory("ivstr").toString
    val (src, vw, in) = (s"$root/t", s"$root/v", s"$root/in")
    ev.write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(ev.schema).parquet(in)
    val q = graft.streaming.EventsStream.viewMaintSink(stream, src, vw,
      Seq("event_type"), "value").start()
    try q.processAllAvailable() finally q.stop()
    assert(Versioned.read(spark, src).count() == ev.count())
    assertSame(Versioned.read(spark, vw), recompute(src))
    // redeliver batch 0 with the same rows: append no-ops (txn marker),
    // refresh no-ops (watermark current) — nothing double-counts
    val srcV = Versioned.currentVersion(src)
    val vwV = Versioned.currentVersion(vw)
    graft.streaming.EventsStream.processViewMaintBatch(ev, 0L, src, vw,
      Seq("event_type"), "value")
    assert(Versioned.currentVersion(src) == srcV)
    assert(Versioned.currentVersion(vw) == vwV)
    assertSame(Versioned.read(spark, vw), recompute(src))
  }

  test("SQL SUM null semantics survive the fold: an all-NULL group shows " +
    "sum NULL, not 0.0") {
    val src = java.nio.file.Files.createTempDirectory("ivs4").toString + "/t"
    val vw = java.nio.file.Files.createTempDirectory("ivv4").toString + "/v"
    Versioned.append(ev.limit(50), src)
    IncrementalView.create(spark, src, vw, Seq("event_type"), "value")
    // a group arrives whose values are ALL NULL: the fold must surface
    // sum NULL (what a recompute and any SQL oracle say), not 0.0
    Versioned.append(ev.limit(4)
      .withColumn("event_id", col("event_id") + 4000000L)
      .withColumn("event_type", lit("ghost"))
      .withColumn("value", lit(null).cast("double")), src)
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))
    val ghost = Versioned.read(spark, vw)
      .filter(col("event_type") === "ghost").collect()(0)
    assert(ghost.isNullAt(ghost.fieldIndex("sum_value")))
    assert(ghost.getLong(ghost.fieldIndex("n_rows")) == 4)
    // the group gains one real value -> sum becomes that value
    Versioned.append(ev.limit(1)
      .withColumn("event_id", lit(4999999L))
      .withColumn("event_type", lit("ghost"))
      .withColumn("value", lit(7.5)), src)
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))
    // ...and loses it again -> back to NULL, not 0.0
    Versioned.deleteByKeyMor(
      ev.limit(1).select(lit(4999999L).as("event_id")), src, "event_id")
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))
    val g2 = Versioned.read(spark, vw)
      .filter(col("event_type") === "ghost").collect()(0)
    assert(g2.isNullAt(g2.fieldIndex("sum_value")))
    // reserved-name collision rejects up front
    intercept[IllegalArgumentException](
      IncrementalView.create(spark, src, vw + "2", Seq("n_rows"), "value"))
  }

  test("group births and null groups are tracked") {
    val src = java.nio.file.Files.createTempDirectory("ivs3").toString + "/t"
    val vw = java.nio.file.Files.createTempDirectory("ivv3").toString + "/v"
    Versioned.append(ev.limit(100), src)
    IncrementalView.create(spark, src, vw, Seq("event_type"), "value")
    // a brand-new group plus a NULL group arrive in one commit
    Versioned.append(ev.limit(10)
      .withColumn("event_id", col("event_id") + 2000000L)
      .withColumn("event_type", lit("born"))
      .unionByName(ev.limit(5)
        .withColumn("event_id", col("event_id") + 3000000L)
        .withColumn("event_type", lit(null: String))), src)
    IncrementalView.refresh(spark, src, vw, Seq("event_type"), "value")
    assertSame(Versioned.read(spark, vw), recompute(src))
    val view = Versioned.read(spark, vw)
    assert(view.filter(col("event_type") === "born")
      .select(col("n_rows")).collect()(0).getLong(0) == 10)
    assert(view.filter(col("event_type").isNull)
      .select(col("n_rows")).collect()(0).getLong(0) == 5)
  }
}

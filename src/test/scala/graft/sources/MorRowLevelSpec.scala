package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level operations AND plain catalog reads on MOR-PENDING
  * snapshots (pending equality/position delete files): the masks apply
  * INSIDE the V2 scan ([[MaskingReaderFactory]] — driver-collected,
  * broadcast-guard bounded), so a table under continuous CDC churn runs
  * SQL UPDATE/MERGE/SELECT without an operator-initiated compact, keeps
  * join-planning statistics (broadcast survives a pending delete file),
  * and serves `SELECT _file`. Only an over-cap mask degrades: plain
  * reads fall back to the V1 anti-join bridge, row-level ops refuse
  * loudly with compact-first.
  */
class MorRowLevelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def catalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    wh
  }

  test("SQL UPDATE on a snapshot with pending equality+position deletes " +
      "applies the masks in-scan and retires them for rewritten files") {
    import spark.implicits._
    val wh = catalog("gmr1")
    val dir = s"$wh/ns/t"
    // v1: ids 0-9; v2: MOR-delete ids 0,1; v3: position-delete id 2;
    // v4: re-append id 0 (later sequence — must survive the v2 mask)
    Versioned.append((0L to 9L).map(i => (i, 1.0)).toDF("id", "v")
      .coalesce(1), dir)
    Versioned.deleteByKeyMor(Seq(0L, 1L).toDF("id"), dir, "id")
    Versioned.deleteWhereMorPos(spark, dir, col("id") === 2L)
    Versioned.append(Seq((0L, 50.0)).toDF("id", "v"), dir)
    // live rows now: 3..9 at 1.0, 0 at 50.0
    spark.sql(s"UPDATE gmr1.ns.t SET v = v + 100.0 WHERE id <= 3")
    val got = spark.sql("SELECT id, v FROM gmr1.ns.t ORDER BY id, v")
      .as[(Long, Double)].collect().toSeq
    val want = Seq((0L, 150.0), (3L, 101.0)) ++
      (4L to 9L).map(i => (i, 1.0))
    assert(got == want, s"\ngot  $got\nwant $want")
    // masked rows (1 at 1.0, 2 at 1.0, old 0 at 1.0) must NOT resurrect
    assert(!got.exists(r => r == (1L, 1.0) || r == (2L, 1.0) ||
      r == (1L, 101.0) || r == (2L, 101.0) || r == (0L, 101.0)))
  }

  test("SQL MERGE on a MOR-pending snapshot: source matches only live " +
      "rows; masked rows neither match nor resurrect") {
    import spark.implicits._
    val wh = catalog("gmr2")
    val dir = s"$wh/ns/t"
    Versioned.append((0L to 5L).map(i => (i, "old")).toDF("id", "tag")
      .coalesce(1), dir)
    Versioned.deleteByKeyMor(Seq(4L, 5L).toDF("id"), dir, "id")
    Seq((4L, "ins"), (0L, "upd")).toDF("id", "tag")
      .createOrReplaceTempView("gmr2_src")
    spark.sql("MERGE INTO gmr2.ns.t t USING gmr2_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET tag = s.tag " +
      "WHEN NOT MATCHED THEN INSERT *")
    val got = spark.sql("SELECT id, tag FROM gmr2.ns.t ORDER BY id")
      .as[(Long, String)].collect().toSeq
    // 4 was MOR-deleted -> NOT MATCHED -> inserts fresh; 5 stays dead
    val want = Seq((0L, "upd"), (1L, "old"), (2L, "old"), (3L, "old"),
      (4L, "ins"))
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("plain catalog SELECT on a MOR snapshot rides the V2 scan " +
      "(stats + _file survive); broadcast survives a pending delete") {
    import spark.implicits._
    val wh = catalog("gmr3")
    val dim = s"$wh/ns/dim"
    Versioned.append((0L to 20L).map(i => (i, s"n$i")).toDF("k", "name"),
      dim)
    Versioned.deleteByKeyMor(Seq(7L).toDF("k"), dim, "k")
    // correctness: V2 masked read == the API read
    val viaSql = spark.sql("SELECT k, name FROM gmr3.ns.dim ORDER BY k")
      .as[(Long, String)].collect().toSeq
    val viaApi = Versioned.read(spark, dim).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(viaSql == viaApi && !viaSql.exists(_._1 == 7L))
    // the plan is the V2 batch scan (description carries the marker)
    val plan = spark.sql("SELECT k FROM gmr3.ns.dim")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-versioned-scan"),
      s"expected the V2 scan under MOR:\n$plan")
    // _file attribution works on the masked snapshot
    val files = spark.sql("SELECT DISTINCT _file FROM gmr3.ns.dim")
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("/data/")))
    // join statistics: the small masked dim still auto-broadcasts
    val big = (0L to 2000L).map(i => (i % 21, i)).toDF("k", "x")
    big.createOrReplaceTempView("gmr3_big")
    val j = spark.sql(
      "SELECT b.k, d.name FROM gmr3_big b JOIN gmr3.ns.dim d ON b.k = d.k")
    val jp = j.queryExecution.executedPlan.toString
    assert(jp.contains("BroadcastHashJoin"),
      s"masked dim lost its broadcast:\n$jp")
    assert(j.count() == big.filter(col("k") =!= 7).count()) // k=7 drops
  }

  test("over-cap masks degrade: SELECT falls back to the V1 bridge " +
      "(still correct), row-level ops refuse with compact-first") {
    import spark.implicits._
    val wh = catalog("gmr4")
    val dir = s"$wh/ns/t"
    Versioned.append((0L to 9L).map(i => (i, 1.0)).toDF("id", "v"), dir)
    Versioned.deleteByKeyMor(Seq(1L, 2L, 3L).toDF("id"), dir, "id")
    spark.conf.set("graft.versioned.maxBroadcastKeys", "2")
    try {
      val got = spark.sql("SELECT id FROM gmr4.ns.t ORDER BY id")
        .as[Long].collect().toSeq
      assert(got == Seq(0L) ++ (4L to 9L))
      val plan = spark.sql("SELECT id FROM gmr4.ns.t")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("graft-versioned-scan"),
        s"over-cap mask must not ride the V2 scan:\n$plan")
      val err = intercept[Exception] {
        spark.sql("UPDATE gmr4.ns.t SET v = 0.0 WHERE id = 5")
      }
      assert(err.getMessage.contains("compact"),
        s"unexpected: ${err.getMessage}")
    } finally spark.conf.unset("graft.versioned.maxBroadcastKeys")
  }

  test("DELETE FROM (rewrite path) on a MOR-pending snapshot") {
    import spark.implicits._
    val wh = catalog("gmr5")
    val dir = s"$wh/ns/t"
    Versioned.append((0L to 9L).map(i => (i, i * 10.0)).toDF("id", "v")
      .coalesce(1), dir)
    Versioned.deleteByKeyMor(Seq(9L).toDF("id"), dir, "id")
    // % predicate has no V1 form -> row-level rewrite (not deleteWhere)
    spark.sql("DELETE FROM gmr5.ns.t WHERE id % 2 = 0")
    val got = spark.sql("SELECT id FROM gmr5.ns.t ORDER BY id")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 5L, 7L), s"got $got") // 9 masked, evens gone
  }

  test("BINARY-keyed equality deletes mask on the in-scan path (byte " +
      "arrays compare by value, not reference)") {
    import spark.implicits._
    val wh = catalog("gmr6")
    val dir = s"$wh/ns/t"
    Versioned.append(Seq(
      (Array[Byte](1, 2, 3), "a"),
      (Array[Byte](4, 5), "b"),
      (Array[Byte](9), "c")).toDF("k", "s").coalesce(1), dir)
    Versioned.deleteByKeyMor(
      Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("k"), dir, "k")
    // the plain catalog SELECT takes the V2 in-scan mask path (pending
    // delete, under cap, no rename mapping)
    val got = spark.sql("SELECT s FROM gmr6.ns.t ORDER BY s")
      .as[String].collect().toSeq
    assert(got == Seq("b", "c"), s"binary mask did not apply: $got")
    // and agrees with the V1 anti-join bridge read
    val v1 = Versioned.read(spark, dir).select("s")
      .as[String].collect().toSeq.sorted
    assert(v1 == Seq("b", "c"), s"V1 bridge disagrees: $v1")
  }
}

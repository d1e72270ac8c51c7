package graft.ops

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import DataQuality._

  private def df = {
    import spark.implicits._
    Seq(
      // (id, grp, v, tag, fk)
      (1L, "a", 10.0, "X", 100L),
      (2L, "a", 20.0, "Y", 100L),
      (3L, "b", -5.0, "Z", 200L),  // range violation; Z not in {X, Y}
      (4L, "b", 15.0, null, 999L), // null tag; orphan fk
      (4L, "c", 30.0, "X", 100L)   // duplicate id
    ).toDF("id", "grp", "v", "tag", "fk")
  }

  private def ref = {
    import spark.implicits._
    Seq(100L, 200L, 300L).toDF("rid")
  }

  private def report = validate(df, Seq(
    NotNull("tag"),
    InRange("v", 0.0, 25.0),
    InSet("tag", Seq("X", "Y")),
    MatchesRegex("grp", "^[ab]$"),
    Unique(Seq("id")),
    ForeignKey("fk", ref, "rid", "ref")
  )).collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

  test("row-local rules count violations and verdicts") {
    val m = report
    val nn = m(("not_null", "tag"))
    assert(nn.getLong(2) == 5 && nn.getLong(3) == 1 && !nn.getBoolean(5))
    val rg = m(("in_range", "v"))
    assert(rg.getLong(3) == 2 && !rg.getBoolean(5)) // -5 and 30 out of range
    val st = m(("in_set", "tag"))
    assert(st.getLong(3) == 1 && !st.getBoolean(5)) // Z (null not counted)
    val re = m(("matches", "grp"))
    assert(re.getLong(3) == 1 && !re.getBoolean(5)) // "c"
  }

  test("unique counts all rows of oversized groups") {
    val u = report(("unique", "id"))
    assert(u.getLong(2) == 5 && u.getLong(3) == 2 && !u.getBoolean(5))
  }

  test("foreign key counts orphan rows, not orphan keys") {
    val f = report(("foreign_key", "fk->ref.rid"))
    assert(f.getLong(2) == 5 && f.getLong(3) == 1 && !f.getBoolean(5))
  }

  test("violation budget flips the verdict without changing the counts") {
    val m = report
    val alone = validate(df, Seq(NotNull("tag", maxViolFrac = 0.5)))
      .collect()(0)
    assert(alone.getLong(3) == 1 && alone.getBoolean(5))
    assert(m(("not_null", "tag")).getLong(3) == 1)
  }

  test("clean battery passes everything") {
    val rep = validate(df.filter("id <= 3"), Seq(
      NotNull("grp"), InRange("v", -10.0, 25.0), Unique(Seq("id")),
      ForeignKey("fk", ref, "rid", "ref"))).collect()
    assert(rep.length == 4 && rep.forall(_.getBoolean(5)))
    assert(rep.forall(_.getLong(3) == 0L))
  }

  test("row-local battery compiles to a single aggregation job") {
    val plan = validate(df, Seq(
      NotNull("tag"), InRange("v", 0.0, 25.0), InSet("tag", Seq("X")),
      MatchesRegex("grp", "^[ab]$")))
      .queryExecution.executedPlan.toString
    // one scan of the input — the battery must not re-read per rule
    val scans = "LocalTableScan".r.findAllIn(plan).length +
      "Scan ExistingRDD".r.findAllIn(plan).length
    assert(scans <= 1, s"expected one input scan, plan:\n$plan")
  }

  test("an empty table yields vacuous passes, never NULL verdicts") {
    val rep = validate(df.limit(0), Seq(
      NotNull("tag"), InRange("v", 0.0, 25.0), Unique(Seq("id")),
      ForeignKey("fk", ref, "rid", "ref"))).collect()
    assert(rep.length == 4)
    rep.foreach { r =>
      assert(!r.isNullAt(2) && r.getLong(2) == 0L)
      assert(!r.isNullAt(3) && r.getLong(3) == 0L)
      assert(!r.isNullAt(4) && r.getDouble(4) == 1.0)
      assert(!r.isNullAt(5) && r.getBoolean(5))
    }
  }

  test("fraction and ordering are deterministic") {
    val rows = validate(df, Seq(NotNull("tag"), Unique(Seq("id"))))
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("not_null", "tag"), ("unique", "id")))
    assert(math.abs(rows(0).getDouble(4) - 0.8) < 1e-9)
  }
}

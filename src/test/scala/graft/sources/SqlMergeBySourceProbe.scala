package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic pins for `MERGE … WHEN NOT MATCHED BY SOURCE` (Spark 4
  * syntax) through [[GraftRowLevelOperation]]. The danger case: the
  * row-level scan's runtime group filtering narrows the affected-group
  * set to files holding SOURCE-MATCHING rows
  * ([[RowLevelScan.filter]]) — exactly wrong for by-source clauses,
  * whose rewrites live in files with NO matching rows. Spark's
  * `RewriteMergeIntoTable` plans by-source merges WITHOUT a group-filter
  * condition (full-outer shape), so the filter never fires; these pins
  * hold that contract: if a Spark upgrade ever starts narrowing
  * by-source plans, the row sets here break loudly instead of rewrites
  * silently dropping.
  */
class SqlMergeBySourceProbe extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("NOT MATCHED BY SOURCE DELETE reaches files with no matched row") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("bysrc").toString
    spark.conf.set("spark.sql.catalog.bsp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bsp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bsp.ns")
    val dir = s"$wh/ns/t1"
    // file A: ids 0-4; file B: ids 5-9 — the source matches ONLY file A,
    // so every by-source rewrite lives in file B
    Versioned.append((0L to 4L).map(i => (i, 1.0)).toDF("id", "v")
      .coalesce(1), dir)
    Versioned.append((5L to 9L).map(i => (i, 1.0)).toDF("id", "v")
      .coalesce(1), dir)
    (0L to 4L).map(i => (i, 10.0)).toDF("id", "v")
      .createOrReplaceTempView("bsp_src")
    spark.sql("MERGE INTO bsp.ns.t1 t USING bsp_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    val got = spark.sql("SELECT id, v FROM bsp.ns.t1 ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    val want = (0L to 4L).map(i => (i, 10.0))
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("BY SOURCE UPDATE with no matched clause rewrites unmatched rows") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("bysrc2").toString
    spark.conf.set("spark.sql.catalog.bsp2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bsp2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bsp2.ns")
    val dir = s"$wh/ns/t1"
    Versioned.append((0L to 4L).map(i => (i, 1.0)).toDF("id", "v")
      .coalesce(1), dir)
    Versioned.append((5L to 9L).map(i => (i, 1.0)).toDF("id", "v")
      .coalesce(1), dir)
    (0L to 4L).map(i => (i, 10.0)).toDF("id", "v")
      .createOrReplaceTempView("bsp2_src")
    spark.sql("MERGE INTO bsp2.ns.t1 t USING bsp2_src s ON t.id = s.id " +
      "WHEN NOT MATCHED BY SOURCE AND t.id >= 7 THEN UPDATE SET v = -1.0")
    val got = spark.sql("SELECT id, v FROM bsp2.ns.t1 ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    val want = (0L to 6L).map(i => (i, 1.0)) ++
      (7L to 9L).map(i => (i, -1.0))
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("all three clause families in one statement") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("bysrc3").toString
    spark.conf.set("spark.sql.catalog.bsp3", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bsp3.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bsp3.ns")
    val dir = s"$wh/ns/t1"
    Versioned.append((0L to 4L).map(i => (i, 1.0)).toDF("id", "v")
      .coalesce(1), dir)
    Versioned.append((5L to 9L).map(i => (i, 1.0)).toDF("id", "v")
      .coalesce(1), dir)
    // matches 0-2, inserts 100-101
    ((0L to 2L) ++ (100L to 101L)).map(i => (i, 10.0)).toDF("id", "v")
      .createOrReplaceTempView("bsp3_src")
    spark.sql("MERGE INTO bsp3.ns.t1 t USING bsp3_src s ON t.id = s.id " +
      "WHEN MATCHED AND t.id = 0 THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE AND t.id < 7 THEN DELETE " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 0.0")
    val got = spark.sql("SELECT id, v FROM bsp3.ns.t1 ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    // 0 deleted; 1,2 -> 10.0; 3-6 deleted (by source); 7-9 -> 0.0;
    // 100,101 inserted at 10.0
    val want = Seq((1L, 10.0), (2L, 10.0), (7L, 0.0), (8L, 0.0),
      (9L, 0.0), (100L, 10.0), (101L, 10.0))
    assert(got == want, s"\ngot  $got\nwant $want")
  }
}

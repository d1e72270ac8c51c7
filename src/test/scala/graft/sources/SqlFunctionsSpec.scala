package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog SQL functions ([[GraftFunctions]] through the DSv2
  * FunctionCatalog seam) — each differentially pinned against the
  * engine primitive it fronts.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cat(name: String): Unit = {
    val wh = java.nio.file.Files.createTempDirectory(name).toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
  }

  test("kmer_encode == the KmerEncode codegen expression, row for row") {
    cat("fn1")
    import spark.implicits._
    val seqs = Seq("ACDEFG", "WYWYWY", "AXA", "MKVL", "A", "PQRSTVWY",
      "ZZZ", "ACDEFGHIKLMNPQRSTVWY").toDF("s")
    seqs.createOrReplaceTempView("fn1_seqs")
    val viaSql = spark.sql(
      "SELECT s, fn1.ns.kmer_encode(s) AS c FROM fn1_seqs")
    val viaExpr = seqs.select(col("s"),
      graft.bio.KmerCodec.kmerEncode(col("s"),
        graft.bio.Matrices.KmerAlphabet).as("c"))
    assert(viaSql.exceptAll(viaExpr).isEmpty &&
      viaExpr.exceptAll(viaSql).isEmpty)
    // null propagates
    assert(spark.sql("SELECT fn1.ns.kmer_encode(CAST(NULL AS STRING))")
      .head().isNullAt(0))
  }

  test("hamming64 == bit_count(a ^ b); ws_tokens == tokenCounts' " +
      "ws_tokens including the empty-string edge") {
    cat("fn2")
    import spark.implicits._
    val sigs = Seq((0L, -1L), (0L, 0L), (1L, 2L), (Long.MaxValue, 7L),
      (-1L, Long.MinValue)).toDF("a", "b")
    sigs.createOrReplaceTempView("fn2_sigs")
    val got = spark.sql(
      "SELECT a, b, fn2.ns.hamming64(a, b) AS h FROM fn2_sigs")
    val want = sigs.withColumn("h",
      bit_count(col("a").bitwiseXOR(col("b"))).cast("int"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // int literal upcasts to the declared BIGINT input (the implicit-
    // cast path exact-type binding would block)
    assert(spark.sql("SELECT fn2.ns.hamming64(5, 0)").head().getInt(0) == 2)

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(200)
      .unionByName(Seq((900000001L, ""), (900000002L, "   "),
        (900000003L, "one"), (900000004L, " a  b\tc \n d "),
        // SQL trim strips SPACES only: the leading tab survives and the
        // split keeps its leading empty token (Java String.trim would
        // under-count these by one)
        (900000005L, "\thello"), (900000006L, "x\n"),
        (900000007L, "\t \t mixed  tail \r\n"))
        .toDF("doc_id", "text"))
    docs.createOrReplaceTempView("fn2_docs")
    val gotTok = spark.sql(
      "SELECT doc_id, fn2.ns.ws_tokens(text) AS ws_tokens FROM fn2_docs")
    val wantTok = graft.ops.TextAnalysis
      .tokenCounts(docs, "doc_id", "text")
      .select(col("doc_id"), col("ws_tokens"))
    assert(gotTok.exceptAll(wantTok).isEmpty &&
      wantTok.exceptAll(gotTok).isEmpty)
  }

  test("SHOW FUNCTIONS lists them; unknown names and wrong arity fail " +
      "loudly") {
    cat("fn3")
    val listed = spark.sql("SHOW FUNCTIONS IN fn3.ns").collect()
      .map(_.getString(0))
    assert(GraftFunctions.names.forall(n => listed.exists(_.endsWith(n))),
      s"missing functions in: ${listed.mkString(", ")}")
    intercept[Exception] {
      spark.sql("SELECT fn3.ns.no_such_fn(1)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT fn3.ns.hamming64(1)").collect()
    }
  }
}

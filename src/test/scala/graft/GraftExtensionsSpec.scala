package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("custom expressions are callable from SQL after registration") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val code = spark.sql(
      "SELECT kmer_encode('CAAAAAAAA', 'ACDEFGHIKLMNPQRSTVWY') AS c")
      .collect().head.getLong(0)
    assert(code == 1L)
    val d = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 11.0)
    // null path: X-containing kmer
    val n = spark.sql(
      "SELECT kmer_encode('CAAXAAAAA', 'ACDEFGHIKLMNPQRSTVWY') AS c")
      .collect().head
    assert(n.isNullAt(0))
    val r = spark.sql(
      "SELECT longest_identity_run('abcdef', 'abxdef') AS r")
      .collect().head.getStruct(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 3)
  }
}

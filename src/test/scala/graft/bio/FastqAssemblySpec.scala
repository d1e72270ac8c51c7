package graft.bio

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Partition-local FASTQ record assembly vs the naive lineNo/4 grouping.
  * Exercises every boundary case the shuffle-free path must handle:
  * records straddling partition boundaries, partitions smaller than one
  * record, empty partitions, and a truncated final record.
  */
class FastqAssemblySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def naive(lines: Seq[String], recLen: Int): Map[Long, Seq[String]] =
    lines.zipWithIndex
      .groupBy(_._2 / recLen)
      .map { case (r, ls) =>
        val m = ls.map { case (l, i) => (i % recLen) -> l }.toMap
        r.toLong -> (0 until recLen).map(j => m.getOrElse(j, ""))
      }

  private def check(lines: Seq[String], numSlices: Int, recLen: Int = 4): Unit = {
    val rdd = spark.sparkContext.parallelize(lines, numSlices)
    val got = Fasta.assembleFixedRecords(rdd, recLen)
      .collect().map { case (r, a) => r -> a.toSeq }.toMap
    assert(got == naive(lines, recLen), s"numSlices=$numSlices")
  }

  test("records straddling partition boundaries assemble correctly") {
    val lines = (0 until 40).map(i => s"L$i")
    // 40 lines = 10 records; try partitionings that cut inside records
    Seq(1, 3, 7, 13, 39).foreach(check(lines, _))
  }

  test("partitions smaller than one record (multi-boundary records)") {
    val lines = (0 until 10).map(i => s"L$i")
    check(lines, 9) // most partitions have 1-2 lines
    check(lines, 10)
  }

  test("truncated final record keeps its present lines, rest empty") {
    val lines = (0 until 11).map(i => s"L$i") // last record has 3 of 4 lines
    Seq(1, 2, 5).foreach(check(lines, _))
  }

  test("property: random line counts x random partitionings match naive grouping") {
    val rnd = new scala.util.Random(42)
    (0 until 25).foreach { _ =>
      val n = rnd.nextInt(60) + 1
      val lines = (0 until n).map(i => s"x$i")
      val slices = rnd.nextInt(12) + 1
      check(lines, slices)
    }
  }

  test("multi-partition FASTQ file round-trips through readFastq") {
    val fq = java.io.File.createTempFile("many", ".fastq")
    fq.deleteOnExit()
    val recs = (0 until 50).map(i =>
      s"@r$i desc\nACGTACGT\n+\n@IIIIIII")
    java.nio.file.Files.writeString(fq.toPath, recs.mkString("\n") + "\n")
    val reads = Fasta.readFastq(spark, fq.getAbsolutePath)
    assert(reads.count() == 50)
    val names = reads.collect().map(_.getAs[String]("name")).toSet
    assert(names == (0 until 50).map(i => s"r$i").toSet)
  }
}

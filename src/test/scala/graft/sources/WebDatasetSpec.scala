package graft.sources

import graft.TestSpark
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WebDataset tar shards: write→read round trip, interop with an
  * externally-built tar, first-dot key convention, sample grouping.
  */
class WebDatasetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("write -> read round trip is byte-lossless; shards are per-file tars") {
    val rows = (0 until 50).map { i =>
      (i % 4, f"k$i%04d", if (i % 2 == 0) "txt" else "bin",
        Array.tabulate[Byte](i + 1)(j => ((i * 31 + j) % 251).toByte))
    }
    val dir = java.nio.file.Files.createTempDirectory("wdsrt").toString
    WebDataset.writeTarShards(
      rows.toDF("shard", "key", "ext", "payload"), dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tar")).filterNot(_.startsWith(".")).sorted
    assert(files.toSeq == Seq("shard-00000.tar", "shard-00001.tar",
      "shard-00002.tar", "shard-00003.tar"))
    val back = WebDataset.readTarShards(spark, s"$dir/*.tar")
      .select($"key", $"ext", $"payload")
      .as[(String, String, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    assert(back.size == 50)
    rows.foreach { case (_, k, e, p) => assert(back((k, e)) == p.toSeq) }
  }

  test("reads an externally-built tar; key splits at the FIRST dot") {
    val dir = java.nio.file.Files.createTempDirectory("wdsext").toString
    val tos = new TarArchiveOutputStream(
      new java.io.FileOutputStream(s"$dir/ext.tar"))
    def add(name: String, bytes: Array[Byte]): Unit = {
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      tos.putArchiveEntry(e); tos.write(bytes); tos.closeArchiveEntry()
    }
    add("0001.jpg", Array[Byte](1, 2, 3))
    add("0001.seg.png", Array[Byte](4, 5))
    add("0001.json", "{}".getBytes("UTF-8"))
    tos.finish(); tos.close()
    val back = WebDataset.readTarShards(spark, s"$dir/ext.tar")
      .select($"key", $"ext").as[(String, String)].collect().toSet
    assert(back == Set(("0001", "jpg"), ("0001", "seg.png"),
      ("0001", "json")))
  }

  test("groupSamples assembles one ext->payload map per (shard, key)") {
    val dir = java.nio.file.Files.createTempDirectory("wdsgrp").toString
    val rows = Seq(
      (0, "a", "jpg", Array[Byte](1)), (0, "a", "cls", Array[Byte](7)),
      (0, "b", "jpg", Array[Byte](2)), (1, "a", "jpg", Array[Byte](3)))
    WebDataset.writeTarShards(rows.toDF("shard", "key", "ext", "payload"), dir)
    val samples = WebDataset.groupSamples(
      WebDataset.readTarShards(spark, s"$dir/*.tar"))
    assert(samples.count() == 3)
    val a0 = samples
      .filter($"shard".contains("shard-00000") && $"key" === "a")
      .select(map_keys($"sample")).as[Seq[String]].head()
    assert(a0.sorted == Seq("cls", "jpg"))
  }
}

package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val left = Seq.tabulate(1000)(i => (if (i < 900) "hot" else s"k$i", i))
      .toDF("key", "lv")
    val right = Seq(("hot", 1), ("hot", 2), ("k950", 3)).toDF("key", "rv")
    val plain = left.join(right, Seq("key"))
      .select("key", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    val salted = SkewJoin.salted(left, right, "key", 8)
      .select("key", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    assert(salted == plain)
    val hot = SkewJoin.saltedHotKeys(left, right, "key", 8, 100)
      .select("key", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    assert(hot == plain)
  }

  test("m8 TSV sink writes 12 tab-separated columns") {
    val fixture = getClass.getResource("/MSA_Cas7-11_multiline.fa").getPath
    val degapped = {
      val src = scala.io.Source.fromFile(fixture)
      val out = try src.getLines().map(l =>
        if (l.startsWith(">")) l else l.replace("-", "")).mkString("\n")
      finally src.close()
      val f = java.io.File.createTempFile("m8src", ".fa")
      f.deleteOnExit()
      java.nio.file.Files.writeString(f.toPath, out)
      f.getAbsolutePath
    }
    val m8 = graft.bio.PetaSearch.easySearch(spark, degapped, degapped)
    val dir = java.nio.file.Files.createTempDirectory("m8out").toString
    graft.bio.PetaSearch.writeM8(m8, dir)
    val lines = spark.read.option("sep", "\t").csv(dir).collect()
    assert(lines.nonEmpty)
    assert(lines.head.length == 12)
  }
}

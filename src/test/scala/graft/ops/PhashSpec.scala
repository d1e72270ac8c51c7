package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual aHash: hand-computed hash on a constructed plane, identical
  * payloads collide at Hamming 0, small perturbations stay near, unrelated
  * planes stay far, and the banded pair cascade equals brute force.
  */
class PhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, text) =>
      Multimodal.MediaRow(id, "image/raw", text.getBytes("UTF-8"), 16,
        text.length / 16 + 1)
    }.toDS()
  }

  test("hand case: half-bright 8x8 plane sets exactly the bright bits") {
    // 8x8 source plane (w=h=8): resize to 8x8 is the identity mapping.
    // Top 4 rows byte 'z' (122), bottom 4 rows byte 'A' (65); mean 93.5 —
    // exactly the top 32 positions exceed it
    val text = "z" * 32 + "A" * 32
    val m = Seq(Multimodal.MediaRow(1L, "image/raw",
      text.getBytes("UTF-8"), 8, 8)).toDS()
    val h = Multimodal.aHash64(m).as[(Long, Long)].head()._2
    assert(h == 0x00000000ffffffffL)
  }

  test("identical payloads -> Hamming 0; perturbed -> near; unrelated -> far") {
    val base = (0 until 256).map(i => ('a' + i % 20).toChar).mkString
    val perturbed = base.updated(3, 'z').updated(100, 'z')
    val unrelated = (0 until 256)
      .map(i => ('a' + (i * 7 + 3) % 26).toChar).mkString
    val m = media(Seq(1L -> base, 2L -> base, 3L -> perturbed,
      4L -> unrelated))
    val h = Multimodal.aHash64(m).as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    val dPert = java.lang.Long.bitCount(h(1L) ^ h(3L))
    val dUnrel = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(dPert < dUnrel,
      s"perturbed ($dPert) should be nearer than unrelated ($dUnrel)")
  }

  test("banded pair cascade == brute-force Hamming join") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 40L).map { i =>
      val text =
        if (i % 10 == 1) ("x" * 100 + "y" * 60)             // a dup family
        else (0 until 160).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      i -> text
    }
    val m = media(rows)
    val got = Multimodal.aHashPairs(m, lit(true), maxHamming = 8)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    val sig = Multimodal.aHash64(m).as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- sig; (b, hb) <- sig if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 8
    } yield (a, b, d)).toSet
    assert(got == brute && brute.nonEmpty)
  }
}

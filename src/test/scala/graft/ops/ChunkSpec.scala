package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Overlapping token chunking: hand-computed windows, coverage (no token
  * dropped), the stride == chunkSize partition case, and empty-doc
  * behavior.
  */
class ChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunks(text: String, size: Int, stride: Int) =
    TextAnalysis.chunkOverlap(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        size, stride)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk", "n_tokens")
      .as[(Int, String, Long)].collect().toSeq

  test("hand-computed overlapping windows") {
    // 10 tokens, size 4, stride 2: starts 0,2,4,6,8 — last two short
    val got = chunks("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", 4, 2)
    assert(got == Seq(
      (0, "t0 t1 t2 t3", 4L),
      (1, "t2 t3 t4 t5", 4L),
      (2, "t4 t5 t6 t7", 4L),
      (3, "t6 t7 t8 t9", 4L),
      (4, "t8 t9", 2L)))
  }

  test("stride == chunkSize partitions the doc exactly") {
    val got = chunks("a b c d e f g", 3, 3)
    assert(got == Seq((0, "a b c", 3L), (1, "d e f", 3L), (2, "g", 1L)))
    // concatenating the chunks reproduces the doc: nothing dropped,
    // nothing duplicated
    assert(got.map(_._2).mkString(" ") == "a b c d e f g")
  }

  test("every token lands in at least one chunk at any stride") {
    val text = (0 until 37).map(i => s"w$i").mkString(" ")
    for (stride <- Seq(1, 3, 8, 16)) {
      val covered = chunks(text, 16, stride)
        .flatMap(_._2.split(" ")).toSet
      assert(covered == (0 until 37).map(i => s"w$i").toSet,
        s"stride=$stride dropped tokens")
    }
  }

  test("empty and whitespace-only docs produce no chunks") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkOverlap(df, "doc_id", "text", 4, 2)
      .select("id", "chunk", "n_tokens").as[(Long, String, Long)]
      .collect().toSeq
    assert(got == Seq((3L, "one", 1L)))
  }

  test("doc shorter than one chunk yields a single short chunk") {
    assert(chunks("a b", 16, 8) == Seq((0, "a b", 2L)))
  }

  test("randomized differential vs an independent naive chunker") {
    val rnd = new scala.util.Random(41)
    def naive(tokens: Seq[String], size: Int, stride: Int) =
      Iterator.from(0).map(_ * stride).takeWhile(_ < tokens.length)
        .zipWithIndex.map { case (start, ci) =>
          val w = tokens.slice(start, start + size)
          (ci, w.mkString(" "), w.length.toLong)
        }.toSeq
    for (trial <- 1 to 8) {
      val n = rnd.nextInt(60) + 1
      val toks = (0 until n).map(i => s"t$i")
      val size = rnd.nextInt(12) + 1
      val stride = rnd.nextInt(size) + 1
      val got = chunks(toks.mkString(" "), size, stride)
      assert(got == naive(toks, size, stride),
        s"trial $trial: n=$n size=$size stride=$stride")
    }
  }

  test("invalid size/stride rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkOverlap(df, "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkOverlap(df, "doc_id", "text", 4, 5)
    }
  }
}

package graft.bio

import org.scalatest.funsuite.AnyFunSuite

/** Independent-reimplementation agreement for the gapped kernel (the
  * check VERDICT r14 suggested for the structural `no_oracle` rows): a
  * textbook O(n·m) Gotoh affine-gap DP — FULL matrices, no banding, no
  * X-drop, no block structure, written straight from the recurrence
  * (Gotoh 1982, same anchored-extension boundary convention) — must
  * agree with [[Aligner.xdropExtend]]'s best score and end cell whenever
  * the X-drop margin cannot prune the optimal path. Together with the
  * reference-binary differential this gives the gapped cascade two
  * independent implementations that agree, not just one golden.
  */
class GotohReferenceSpec extends AnyFunSuite {
  private val m = Matrices.blosum62
  private val gaps = Aligner.Gaps(11, 1)
  private val NoPrune = 1000000 // margin far above any attainable dip

  /** Textbook Gotoh anchored extension: path starts exactly at (a0, b0),
    * leading gaps cost open + (k-1)·extend (the kernel's convention),
    * best score over ALL cells, first-best end cell in row-major order.
    */
  private def gotoh(a: Array[Byte], a0: Int, b: Array[Byte], b0: Int): (Int, Int, Int) = {
    val n = a.length - a0
    val mm = b.length - b0
    val NEG = Int.MinValue / 4
    val H = Array.fill(n + 1, mm + 1)(NEG)
    val E = Array.fill(n + 1, mm + 1)(NEG)
    val F = Array.fill(n + 1, mm + 1)(NEG)
    H(0)(0) = 0
    for (j <- 1 to mm) H(0)(j) = -(gaps.open + (j - 1) * gaps.extend)
    for (i <- 1 to n) H(i)(0) = -(gaps.open + (i - 1) * gaps.extend)
    var best = 0
    var bi = 0
    var bj = 0
    for (i <- 1 to n; j <- 1 to mm) {
      E(i)(j) = math.max(H(i)(j - 1) - gaps.open, E(i)(j - 1) - gaps.extend)
      F(i)(j) = math.max(H(i - 1)(j) - gaps.open, F(i - 1)(j) - gaps.extend)
      val sc = m.score(a(a0 + i - 1).toChar, b(b0 + j - 1).toChar)
      H(i)(j) = math.max(H(i - 1)(j - 1) + sc, math.max(E(i)(j), F(i)(j)))
      if (H(i)(j) > best) { best = H(i)(j); bi = i; bj = j }
    }
    (best, bi, bj)
  }

  // deterministic LCG so the suite is reproducible without Random seeding
  private var state = 0x2545F4914F6CDD1DL
  private def nextInt(bound: Int): Int = {
    state = state * 6364136223846793005L + 1442695040888963407L
    (((state >>> 33) % bound).toInt + bound) % bound
  }
  private val alpha = m.alphabet.toArray
  private def randSeq(len: Int): Array[Byte] =
    Array.fill(len)(alpha(nextInt(alpha.length)).toByte)

  test("random pairs: kernel == textbook Gotoh (score and end cell)") {
    for (_ <- 1 to 200) {
      val a = randSeq(5 + nextInt(36))
      val b = randSeq(5 + nextInt(36))
      val ext = Aligner.xdropExtend(a, 0, b, 0, m, gaps, NoPrune)
      val (score, bi, bj) = gotoh(a, 0, b, 0)
      assert(ext.score == score, s"score: ${ext.score} != $score " +
        s"for ${new String(a)} vs ${new String(b)}")
      assert((ext.aLen, ext.bLen) == (bi, bj), s"end cell: " +
        s"(${ext.aLen},${ext.bLen}) != ($bi,$bj) " +
        s"for ${new String(a)} vs ${new String(b)}")
    }
  }

  test("mutated homologs (substitutions + indels): kernel == Gotoh") {
    for (_ <- 1 to 100) {
      val a = randSeq(20 + nextInt(30))
      // derive b from a: point mutations and a small indel
      val buf = scala.collection.mutable.ArrayBuffer(a: _*)
      for (_ <- 1 to 3) buf(nextInt(buf.length)) =
        alpha(nextInt(alpha.length)).toByte
      if (nextInt(2) == 0) buf.remove(nextInt(buf.length - 2), 1 + nextInt(2))
      else buf.insert(nextInt(buf.length), alpha(nextInt(alpha.length)).toByte)
      val b = buf.toArray
      val ext = Aligner.xdropExtend(a, 0, b, 0, m, gaps, NoPrune)
      val (score, bi, bj) = gotoh(a, 0, b, 0)
      assert(ext.score == score)
      assert((ext.aLen, ext.bLen) == (bi, bj))
    }
  }

  test("anchored mid-sequence starts agree too") {
    for (_ <- 1 to 50) {
      val a = randSeq(30)
      val b = randSeq(30)
      val (a0, b0) = (nextInt(10), nextInt(10))
      val ext = Aligner.xdropExtend(a, a0, b, b0, m, gaps, NoPrune)
      val (score, bi, bj) = gotoh(a, a0, b, b0)
      assert(ext.score == score)
      assert((ext.aLen, ext.bLen) == (bi, bj))
    }
  }

  test("with a real xdrop the pruned kernel never exceeds the optimum") {
    for (_ <- 1 to 100) {
      val a = randSeq(10 + nextInt(30))
      val b = randSeq(10 + nextInt(30))
      val ext = Aligner.xdropExtend(a, 0, b, 0, m, gaps, 30)
      val (score, _, _) = gotoh(a, 0, b, 0)
      assert(ext.score <= score)
      assert(ext.score >= 0)
    }
  }
}

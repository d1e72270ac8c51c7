package graft.bio

import org.scalatest.funsuite.AnyFunSuite

/** Property check of the X-drop DP against a brute-force exact affine-gap
  * DP: with an effectively infinite xdrop the pruning never fires, so
  * xdropExtend's best score/end must equal the exact anchored-extension
  * optimum, and the traceback's cigar must re-score to its reported score.
  */
class XdropPropertySpec extends AnyFunSuite {
  private val m = Matrices.blosum62
  private val gaps = Aligner.Gaps(11, 1)
  private val A = Matrices.KmerAlphabet

  /** Exact anchored extension: best over all (i,j) of the affine-gap global
    * alignment score of a[0..i) vs b[0..j) (alignment starts at (0,0)).
    */
  private def bruteForceBest(a: Array[Byte], b: Array[Byte]): Int = {
    val n = a.length
    val mm = b.length
    val NEG = Int.MinValue / 4
    val H = Array.fill(n + 1, mm + 1)(NEG)
    val E = Array.fill(n + 1, mm + 1)(NEG)
    val F = Array.fill(n + 1, mm + 1)(NEG)
    H(0)(0) = 0
    for (j <- 1 to mm) {
      E(0)(j) = math.max(H(0)(j - 1) - gaps.open, E(0)(j - 1) - gaps.extend)
      H(0)(j) = E(0)(j)
    }
    for (i <- 1 to n) {
      F(i)(0) = math.max(H(i - 1)(0) - gaps.open, F(i - 1)(0) - gaps.extend)
      H(i)(0) = F(i)(0)
      for (j <- 1 to mm) {
        E(i)(j) = math.max(H(i)(j - 1) - gaps.open, E(i)(j - 1) - gaps.extend)
        F(i)(j) = math.max(H(i - 1)(j) - gaps.open, F(i - 1)(j) - gaps.extend)
        val d = H(i - 1)(j - 1) +
          m.scores(m.aa2num(a(i - 1) & 0xff))(m.aa2num(b(j - 1) & 0xff))
        H(i)(j) = math.max(d, math.max(E(i)(j), F(i)(j)))
      }
    }
    var best = 0
    for (i <- 0 to n; j <- 0 to mm) best = math.max(best, H(i)(j))
    best
  }

  private def rescore(a: Array[Byte], b: Array[Byte], aStart: Int, bStart: Int,
      runs: List[Aligner.CigarRun]): Int = {
    var s = 0
    var ai = aStart
    var bi = bStart
    runs.foreach { r =>
      r.op match {
        case 'M' =>
          (0 until r.len).foreach { _ =>
            s += m.scores(m.aa2num(a(ai) & 0xff))(m.aa2num(b(bi) & 0xff))
            ai += 1; bi += 1
          }
        case 'I' => s -= gaps.open + (r.len - 1) * gaps.extend; ai += r.len
        case 'D' => s -= gaps.open + (r.len - 1) * gaps.extend; bi += r.len
      }
    }
    s
  }

  test("xdropExtend matches exact DP when xdrop is effectively infinite") {
    val rnd = new scala.util.Random(17)
    (1 to 60).foreach { _ =>
      val n = 3 + rnd.nextInt(25)
      val mLen = 3 + rnd.nextInt(25)
      val a = Array.fill(n)(A(rnd.nextInt(20)).toByte)
      val b =
        if (rnd.nextBoolean()) { // related pair: mutate a
          a.take(mLen).map(c =>
            if (rnd.nextInt(4) == 0) A(rnd.nextInt(20)).toByte else c)
        } else Array.fill(mLen)(A(rnd.nextInt(20)).toByte)
      val exact = bruteForceBest(a, b)
      val got = Aligner.xdropExtend(a, 0, b, 0, m, gaps, 100000)
      assert(got.score == exact,
        s"a=${new String(a)} b=${new String(b)}: got ${got.score}, exact $exact")
    }
  }

  test("xdropTraceback score equals its cigar's re-score and the forward score") {
    val rnd = new scala.util.Random(23)
    (1 to 60).foreach { _ =>
      val n = 5 + rnd.nextInt(30)
      val a = Array.fill(n)(A(rnd.nextInt(20)).toByte)
      val b = a.map(c => if (rnd.nextInt(5) == 0) A(rnd.nextInt(20)).toByte else c)
      val fwd = Aligner.xdropExtend(a, 0, b, 0, m, gaps, 100000)
      val aRev = a.slice(0, fwd.aLen).reverse
      val bRev = b.slice(0, fwd.bLen).reverse
      val tr = Aligner.xdropTraceback(aRev, aRev.length, bRev, bRev.length,
        m, gaps, 100000)
      // the reverse pass optimizes over suffixes ending at the forward
      // endpoint, so it may beat the origin-anchored forward score (it drops
      // a net-negative prefix) — the reference keeps the reverse score too
      assert(tr.score >= fwd.score,
        s"reverse score ${tr.score} < forward ${fwd.score} (a=${new String(a)}, b=${new String(b)})")
      val aStart = fwd.aLen - tr.aConsumed
      val bStart = fwd.bLen - tr.bConsumed
      val re = rescore(a, b, aStart, bStart, tr.runs)
      assert(re == tr.score,
        s"cigar rescores to $re, reported ${tr.score} (a=${new String(a)}, b=${new String(b)}, runs=${tr.runs})")
    }
  }
}

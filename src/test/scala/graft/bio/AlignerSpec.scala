package graft.bio

import org.scalatest.funsuite.AnyFunSuite

class AlignerSpec extends AnyFunSuite {
  private val m = Matrices.blosum62

  test("blosum62 reconstruction matches the canonical integer matrix") {
    // half-bit scores: the shipped file IS blosum62 in 1/2 bits; the
    // prob->log2 round trip must reproduce the canonical integers
    assert(m.score('A', 'A') == 4)
    assert(m.score('W', 'W') == 11)
    assert(m.score('A', 'W') == -3)
    assert(m.score('L', 'I') == 2)
    // symmetry
    for (a <- m.alphabet; b <- m.alphabet)
      assert(m.score(a, b) == m.score(b, a))
  }

  test("kadane finds the max-scoring segment (hand case)") {
    // AAAA vs AAAA: 4*4 = 16, full span
    val q = "AAAA".getBytes
    val r = Aligner.kadane(q, 0, q, 0, 4, m)
    assert(r.score == 16 && r.startPos == 0 && r.endPos == 3)
    // mismatch in the middle with negative score splits the segment
    val a = "AAWWAA".getBytes
    val b = "AAYYAA".getBytes
    // A/A=4 A/A=4 W/Y=2 W/Y=2 A/A=4 A/A=4 -> all positive, full span 20
    val r2 = Aligner.kadane(a, 0, b, 0, 6, m)
    assert(r2.score == 20 && r2.startPos == 0 && r2.endPos == 5)
  }

  test("ungappedByDiagonal honors positive/negative diagonals") {
    val q = "GGGAAAA".getBytes // query has 3 leading Gs
    val t = "AAAA".getBytes
    val r = Aligner.ungappedByDiagonal(q, t, 3, m) // query shifted by 3
    assert(r.score == 16)
    assert(r.startPos == 0 && r.endPos == 3)
    val q2 = "AAAA".getBytes
    val t2 = "GGGAAAA".getBytes
    val r2 = Aligner.ungappedByDiagonal(q2, t2, -3, m)
    assert(r2.score == 16)
  }

  test("xdrop extension + traceback reconstruct a perfect self-alignment") {
    val s = "MKVLATTPFGGGSDEWIRRQ".getBytes
    val fwd = Aligner.xdropExtend(s, 0, s, 0, m, Aligner.Gaps(11, 1), 10)
    assert(fwd.aLen == s.length && fwd.bLen == s.length)
    val selfScore = s.map(c => m.score(c.toChar, c.toChar)).sum
    assert(fwd.score == selfScore)
    val rev = s.reverse
    val tr = Aligner.xdropTraceback(rev, rev.length, rev.clone(), rev.length,
      m, Aligner.Gaps(11, 1), 10)
    assert(tr.score == selfScore)
    assert(tr.runs == List(Aligner.CigarRun('M', s.length, s.length)))
  }

  test("xdrop traceback recovers a gap when it pays") {
    // query = target with a 2-residue insertion; flanks long enough that
    // bridging the gap (cost 11+1=12) beats stopping at the flank
    val t = "MKVLATTPFGWSDEWIRRQCHHKNMKVLATT".getBytes
    val q = "MKVLATTPFGAAWSDEWIRRQCHHKNMKVLATT".getBytes // AA inserted at 10
    val fwd = Aligner.xdropExtend(q, 0, t, 0, m, Aligner.Gaps(11, 1), 30)
    val qRev = q.slice(0, fwd.aLen).reverse
    val tRev = t.slice(0, fwd.bLen).reverse
    val tr = Aligner.xdropTraceback(qRev, qRev.length, tRev, tRev.length,
      m, Aligner.Gaps(11, 1), 30)
    val ops = tr.runs.map(r => (r.op, r.len))
    assert(ops.contains(('I', 2)), s"expected a 2-long insertion, got $ops")
    val selfScore = t.map(c => m.score(c.toChar, c.toChar)).sum
    assert(tr.score == selfScore - 12) // gap of 2: open 11 + extend 1
  }

  test("diagonal gate needs two hits within N diagonals") {
    def h(diag: Int) = Aligner.Hit(0, 0L, diag)
    assert(!Aligner.isWithinNDiagonals(Array(h(5)), 4)) // singleton fails
    assert(Aligner.isWithinNDiagonals(Aligner.sortHits(Array(h(5), h(7))), 4))
    assert(!Aligner.isWithinNDiagonals(Aligner.sortHits(Array(h(5), h(50))), 4))
    // u32 semantics: diag -1 sorts as 0xFFFFFFFF, so (2, 0xFFFFFFFF) are
    // FAR apart — wrap-around adjacency does NOT count (matches reference)
    assert(!Aligner.isWithinNDiagonals(Aligner.sortHits(Array(h(-1), h(2))), 4))
    assert(Aligner.isWithinNDiagonals(Aligner.sortHits(Array(h(-1), h(-3))), 4))
  }

  test("evaluer: bits/evalue closed forms and finite-size area sanity") {
    val ev = new Evaluer(GumbelParams.Blosum62Ungapped, 1000000L)
    val s = 100.0
    val bits = ev.computeBitScore(s)
    assert(math.abs(bits - (0.3207378152604042354 * s - math.log(0.13904657125294345166)) / math.log(2.0)) < 1e-12)
    // area is positive and below the uncorrected m*n
    val area = ev.area(s, 300)
    assert(area > 0 && area < 1000000.0 * 300)
    // e-value decreases with score
    assert(ev.computeEvalue(120, 300) < ev.computeEvalue(100, 300))
    // round trip bits -> raw
    assert(math.abs(ev.computeRawScoreFromBitScore(bits) - s) < 1e-9)
  }
}

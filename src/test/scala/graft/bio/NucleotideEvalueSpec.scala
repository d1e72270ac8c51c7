package graft.bio

import org.scalatest.funsuite.AnyFunSuite

/** Parity anchors for the offline-fitted nucleotide ungapped Gumbel
  * constants (GumbelParams.NucleotideUngapped — the reference computes the
  * same numbers at runtime via ALP initGapless; we ran that fit once and
  * hard-coded it). Gapless Karlin–Dembo statistics are closed-form, so the
  * constants are checkable against theory without the reference binary.
  */
class NucleotideEvalueSpec extends AnyFunSuite {
  private val p = GumbelParams.NucleotideUngapped
  // +2 match / -3 mismatch, uniform 0.25 background over ACGT
  private def ez(l: Double): Double =
    0.25 * math.exp(2 * l) + 0.75 * math.exp(-3 * l)

  test("lambda solves the Karlin-Altschul equation sum p_i p_j e^{lambda s} = 1") {
    // tolerance = ALP's own calculation_error (1e-6): the fit stops there
    assert(math.abs(ez(p.lambda) - 1.0) < 1e-6)
    // and matches the matrix file's precomputed lambda (nucleotide.out header)
    assert(math.abs(p.lambda - 0.6337314) < 1e-6)
  }

  test("a = 1/muAssoc (expected length per score unit, Karlin-Dembo)") {
    val muAssoc = 0.25 * 2 * math.exp(2 * p.lambda) +
      0.75 * (-3) * math.exp(-3 * p.lambda)
    assert(math.abs(p.aJ - 1.0 / muAssoc) < 1e-9)
    assert(p.aI == p.aJ && p.alphaI == p.alphaJ && p.alphaI == p.sigma)
    // gapless intercepts are exactly zero
    assert(p.bI == 0 && p.bJ == 0 && p.betaI == 0 && p.betaJ == 0 && p.tau == 0)
  }

  test("K matches the published BLAST +2/-3 ungapped value ~0.41") {
    assert(math.abs(p.k - 0.41) < 0.005)
  }

  test("e-value approaches K*m*n*exp(-lambda*S) in the asymptotic regime") {
    val m = 1000000L
    val ev = new Evaluer(p, m)
    val n = 500.0
    val s = 60.0
    val asymptotic = p.k * m * n * math.exp(-p.lambda * s)
    val got = ev.computeEvalue(s, n)
    // finite-size correction shrinks the effective search space; same order
    assert(got > 0 && got < asymptotic)
    assert(got > asymptotic * 0.5)
    // bit score round-trip
    val bits = ev.computeBitScore(s)
    assert(math.abs(ev.computeRawScoreFromBitScore(bits) - s) < 1e-9)
  }

  test("nucleotide self-alignment e-values are far below threshold") {
    val ev = new Evaluer(p, 10000L)
    // 120-base perfect self-match: score 240
    assert(ev.computeEvalue(240.0, 120.0) < 1e-50)
  }
}

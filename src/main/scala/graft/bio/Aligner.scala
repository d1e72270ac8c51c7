package graft.bio

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala alignment kernels: the per-pair cascade of the `blockalign`
  * stage (`src/sra/blockalign.cpp:164-493`). Order of gates is the
  * reference's defining optimization (cheap -> expensive,
  * SURVEY §4): diagonal proximity -> ungapped Kadane + e-value -> gapped
  * X-drop SW -> e-value threshold. Everything here is per-row compute inside
  * a mapPartitions; no Spark dependencies.
  */
object Aligner {

  /** One prefilter hit of a (target, query) pair. `diag` is computed in u32
    * arithmetic (`blockalign.cpp:289`, quirk §2.12.5 — wraps mod 2^32,
    * stored in an Int).
    */
  final case class Hit(kmerPos: Int, kmer: Long, diag: Int)

  final case class UngappedAln(
      startPos: Int, endPos: Int, score: Int, distToDiagonal: Int, diagonal: Int)

  /** Final alignment, query-centric (post `Matcher::result_t::swapResult`
    * orientation). Endpoints inclusive, 0-based.
    */
  final case class AlnResult(
      queryId: Long, targetId: Long, bits: Int, fident: Double, eval: Double,
      qStart: Int, qEnd: Int, qLen: Int, tStart: Int, tEnd: Int, tLen: Int,
      backtrace: String, alnLen: Int, mismatch: Int, gapOpen: Int,
      raw: Int)

  // ---------------------------------------------------------------- sorting

  /** `blockByDiagSort` (`blockalign.cpp:495-532`). The score/eval sort keys
    * alias the packed union's kmer halves (`QueryTableEntry.h:8-22`): score =
    * low 32 bits of the kmer, eval = high 32 bits (compared DESCENDING).
    * Replicated because it decides which diagonal aligns first.
    */
  def sortHits(hits: Array[Hit]): Array[Hit] =
    hits.sortWith { (a, b) =>
      val da = Integer.toUnsignedLong(a.diag)
      val db = Integer.toUnsignedLong(b.diag)
      if (da != db) da < db
      else {
        val sa = a.kmer & 0xffffffffL
        val sb = b.kmer & 0xffffffffL
        if (sa != sb) sa < sb
        else {
          val ea = a.kmer >>> 32
          val eb = b.kmer >>> 32
          if (ea != eb) ea > eb
          else false
        }
      }
    }

  /** A6 min-diagonal-distance gate (`blockalign.cpp:61-69`): at least two
    * hits whose (u32-wrapped) consecutive sorted diagonals differ by <= N.
    * Single-hit groups fail (loop never runs).
    */
  def isWithinNDiagonals(sorted: Array[Hit], n: Int): Boolean = {
    var shortest = -1L // UINT_MAX sentinel
    var i = 1
    while (i < sorted.length && java.lang.Long.compareUnsigned(shortest, n.toLong) > 0) {
      val d = (sorted(i).diag - sorted(i - 1).diag) & 0xffffffffL
      if (java.lang.Long.compareUnsigned(d, shortest) < 0) shortest = d
      i += 1
    }
    java.lang.Long.compareUnsigned(shortest, n.toLong) <= 0
  }

  // ------------------------------------------------------------- ungapped

  /** Kadane max-scoring segment along one diagonal
    * (`DistanceCalculator::computeSubstitutionStartEndDistance`,
    * `lib/mmseqs/src/alignment/DistanceCalculator.h:181-210`).
    */
  def kadane(s1: Array[Byte], off1: Int, s2: Array[Byte], off2: Int, length: Int,
      m: Matrices): UngappedAln = {
    var maxScore = 0
    var maxEndPos = 0
    var maxStartPos = 0
    var minPos = -1
    var score = 0
    var pos = 0
    while (pos < length) {
      score += m.scores(m.aa2num(s1(off1 + pos) & 0xff))(m.aa2num(s2(off2 + pos) & 0xff))
      if (score <= 0) { score = 0; minPos = pos }
      if (score > maxScore) { maxEndPos = pos; maxStartPos = minPos + 1; maxScore = score }
      pos += 1
    }
    UngappedAln(maxStartPos, maxEndPos, maxScore, 0, 0)
  }

  /** `ungappedAlignmentByDiagonal` (`DistanceCalculator.h:115-176`),
    * RESCORE_MODE_ALIGNMENT path. Returns default (-1,-1,0) when the
    * diagonal lies outside the rectangle.
    */
  def ungappedByDiagonal(q: Array[Byte], t: Array[Byte], diagonal: Int,
      m: Matrices): UngappedAln = {
    val dist = math.abs(diagonal)
    if (diagonal >= 0 && dist < q.length) {
      val len = math.min(t.length, q.length - dist)
      val r = kadane(q, dist, t, 0, len, m)
      r.copy(distToDiagonal = dist, diagonal = diagonal)
    } else if (diagonal < 0 && dist < t.length) {
      val len = math.min(t.length - dist, q.length)
      val r = kadane(q, 0, t, dist, len, m)
      r.copy(distToDiagonal = dist, diagonal = diagonal)
    } else UngappedAln(-1, -1, 0, dist, diagonal)
  }

  /** `computeUngappedAlignment` (`DistanceCalculator.h:93-113`): the u32
    * diagonal is truncated to u16 at the call boundary, then every +-65536
    * unwrapping is tried, keeping the best score (negative divisions first,
    * strict >).
    */
  def ungappedWrapped(q: Array[Byte], t: Array[Byte], diagU32: Int,
      m: Matrices): UngappedAln = {
    val diagU16 = diagU32 & 0xffff
    var best = UngappedAln(-1, -1, 0, 0, 0)
    var d = 1
    while (d <= 1 + t.length / 32768) {
      val real = -d * 65536 + diagU16
      val tmp = ungappedByDiagonal(q, t, real, m)
      if (tmp.score > best.score) best = tmp
      d += 1
    }
    d = 0
    while (d <= q.length / 65536) {
      val real = d * 65536 + diagU16
      val tmp = ungappedByDiagonal(q, t, real, m)
      if (tmp.score > best.score) best = tmp
      d += 1
    }
    best
  }

  /** `ungappedDiagFilter` (`blockalign.cpp:72-117`): scan hits in
    * blockByDiagSort order STARTING AT INDEX 1 (the reference's loop skips
    * the first sorted hit — replicated), dedup consecutive equal diagonals,
    * accept the first diagonal whose ungapped e-value clears the threshold.
    */
  def ungappedDiagFilter(sorted: Array[Hit], q: Array[Byte], t: Array[Byte],
      m: Matrices, evaluer: Evaluer, evalThr: Double): Option[UngappedAln] = {
    var lastDiag = -1 // INVALID_DIAG sentinel (u32 max, same collision as ref)
    var i = 1
    while (i < sorted.length) {
      val diag = sorted(i).diag
      if (diag != lastDiag) {
        lastDiag = diag
        val aln = ungappedWrapped(q, t, diag, m)
        if (aln.startPos >= 0 && aln.endPos >= 0) {
          val eval = evaluer.computeEvalue(aln.score, q.length)
          if (eval <= evalThr) return Some(aln)
        }
      }
      i += 1
    }
    None
  }

  // ------------------------------------------------------------- gapped

  /** Gap model: a gap of length L costs `open + (L-1) * extend`
    * (block-aligner convention; open includes the first residue —
    * `src/commons/BlockAligner.cpp:10-22` passes -gapOpen/-gapExtend).
    */
  final case class Gaps(open: Int, extend: Int)

  /** Pluggable substitution scoring for the gapped kernels: score of
    * aligning a(ai) against b(bi) (absolute indices into the arrays the
    * kernel walks). Matrix scoring is the default; profile scoring
    * (per-query-position score vectors, F4) swaps in here.
    */
  trait Scorer {
    def score(ai: Int, bi: Int): Int
  }

  /** BLOSUM-style pair scoring: `m.scores(num(a))(num(b))`. */
  final class MatrixScorer(a: Array[Byte], b: Array[Byte], m: Matrices)
      extends Scorer {
    def score(ai: Int, bi: Int): Int =
      m.scores(m.aa2num(a(ai) & 0xff))(m.aa2num(b(bi) & 0xff))
  }

  /** Profile scoring (`BlockAligner.cpp align_local_profile`): the score of
    * aligning query position `ai` against target residue b(bi) is the
    * profile's stored per-residue score at that position, arithmetic-shifted
    * right by 2 (the reference divides profile scores by 4 the same way:
    * `block_set_all_aaprofile(..., 0, 2)`). `aMap` maps kernel index ->
    * profile position (identity forwards; `pos => end-1-pos` for the
    * reversed second pass, mirroring `block_set_all_rev_aaprofile`).
    */
  final class ProfileScorer(prof: Array[Byte], aMap: Int => Int,
      b: Array[Byte], m: Matrices) extends Scorer {
    def score(ai: Int, bi: Int): Int =
      prof(aMap(ai) * Profiles.ReadInSize + m.aa2num(b(bi) & 0xff)).toInt >> 2
  }

  /** Result of one anchored X-drop extension: lengths consumed on each side
    * plus the best score.
    */
  final case class Extension(aLen: Int, bLen: Int, score: Int)

  private final val NegInf = Int.MinValue / 4

  /** Anchored X-drop affine-gap extension of a[a0..) vs b[b0..), scores
    * only. The alignment starts exactly at (a0, b0); cells are pruned when
    * below `best - margin` and the extension stops when a row empties —
    * the dynamic-programming equivalent of the reference's two-pass block
    * X-drop (`BlockAligner.cpp:60-93`). `margin` is xdrop padded by one
    * 32-block of gap cost so small in-block dips survive like they do in
    * block-aligner; divergence is possible only for paths that dip deeper
    * than a block boundary would allow (documented, not observed in tests).
    */
  def xdropExtend(a: Array[Byte], a0: Int, b: Array[Byte], b0: Int,
      m: Matrices, gaps: Gaps, xdrop: Int): Extension =
    xdropExtend(a, a0, b, b0, new MatrixScorer(a, b, m), gaps, xdrop)

  def xdropExtend(a: Array[Byte], a0: Int, b: Array[Byte], b0: Int,
      scorer: Scorer, gaps: Gaps, xdrop: Int): Extension = {
    val n = a.length - a0
    val mm = b.length - b0
    if (n <= 0 || mm <= 0) return Extension(0, 0, 0)
    val margin = xdrop + gaps.open + 31 * gaps.extend
    var best = 0
    var bestI = 0
    var bestJ = 0
    // rows over a; columns over b
    val H = Array.fill(mm + 1)(NegInf)
    val E = Array.fill(mm + 1)(NegInf) // gap in a (consumes b)
    H(0) = 0
    var j = 1
    var lo = 0
    var hi = 0
    // row 0: leading gaps in a
    while (j <= mm && -(gaps.open + (j - 1) * gaps.extend) >= best - margin) {
      H(j) = -(gaps.open + (j - 1) * gaps.extend)
      hi = j
      j += 1
    }
    var i = 1
    val F = Array.fill(mm + 1)(NegInf) // gap in b (consumes a)
    while (i <= n && lo <= hi) {
      val rowStart = lo
      // diag for cell (i, rowStart) = H(i-1, rowStart-1); out-of-band cells
      // hold NegInf (pruned cells are written NegInf when the band moves)
      var diagH = if (rowStart == 0) H(0) else H(rowStart - 1)
      var newLo = -1
      var newHi = -1
      // H(i, rowStart-1) doesn't exist (out of band): E seed is -inf
      var prevH = NegInf // H(i, j-1)
      var prevE = NegInf // E(i, j-1)
      if (rowStart == 0) {
        // column 0: leading gap in b
        val h0 = -(gaps.open + (i - 1) * gaps.extend)
        val keep = h0 >= best - margin
        prevH = if (keep) h0 else NegInf
        H(0) = if (keep) h0 else NegInf
        if (keep) { newLo = 0; newHi = 0 }
        prevE = NegInf
      }
      j = math.max(rowStart, 1)
      var extendLimit = math.min(mm, hi + 1)
      while (j <= extendLimit) {
        val up = H(j) // H(i-1, j)
        val e = math.max(
          if (prevH > NegInf) prevH - gaps.open else NegInf,
          if (prevE > NegInf) prevE - gaps.extend else NegInf)
        val f = math.max(
          if (up > NegInf) up - gaps.open else NegInf,
          if (F(j) > NegInf) F(j) - gaps.extend else NegInf)
        val d =
          if (diagH > NegInf) diagH + scorer.score(a0 + i - 1, b0 + j - 1)
          else NegInf
        var h = math.max(d, math.max(e, f))
        if (h < best - margin) h = NegInf
        diagH = up
        H(j) = h
        E(j) = e
        F(j) = f
        prevH = h
        prevE = e
        if (h > NegInf) {
          if (newLo < 0) newLo = j
          newHi = j
          if (h > best) { best = h; bestI = i; bestJ = j }
          // allow rightward band growth while gaps are still viable
          if (j == extendLimit && extendLimit < mm &&
            (h > NegInf || e > NegInf)) extendLimit = math.min(mm, extendLimit + 1)
        }
        j += 1
      }
      if (newLo < 0) { lo = 1; hi = 0 } // empty row -> terminate
      else { lo = newLo; hi = newHi }
      i += 1
    }
    Extension(bestI, bestJ, best)
  }

  /** One cigar run. op: 'M' (match/mismatch), 'I' (gap in target, consumes
    * query), 'D' (gap in query, consumes target). `eq` counts identities
    * inside an M run.
    */
  final case class CigarRun(op: Char, len: Int, eq: Int)

  final case class TracedAln(score: Int, aConsumed: Int, bConsumed: Int,
      runs: List[CigarRun])

  /** Anchored affine DP WITH traceback over a[a0..a1) vs b[b0..b1) run in
    * REVERSE (the reference's second pass: align reversed prefixes ending at
    * the forward pass's argmax, `BlockAligner.cpp:71-93`), returning the
    * best-scoring suffix alignment of those prefixes plus its cigar in
    * forward order.
    */
  def xdropTraceback(a: Array[Byte], aEnd: Int, b: Array[Byte], bEnd: Int,
      m: Matrices, gaps: Gaps, xdrop: Int): TracedAln =
    xdropTraceback(a, aEnd, b, bEnd, new MatrixScorer(a, b, m), gaps, xdrop)

  def xdropTraceback(a: Array[Byte], aEnd: Int, b: Array[Byte], bEnd: Int,
      scorer: Scorer, gaps: Gaps, xdrop: Int): TracedAln = {
    val n = aEnd
    val mm = bEnd
    if (n <= 0 || mm <= 0) return TracedAln(0, 0, 0, Nil)
    val margin = xdrop + gaps.open + 31 * gaps.extend
    var best = 0
    var bestI = 0
    var bestJ = 0
    val H = Array.fill(mm + 1)(NegInf)
    val E = Array.fill(mm + 1)(NegInf)
    val F = Array.fill(mm + 1)(NegInf)
    // per-row packed traceback: bits 0-1 H source (1 diag, 2 E, 3 F),
    // bit 2 E extends, bit 3 F extends; row storage = explored band only
    val dirRows = new ArrayBuffer[(Int, Array[Byte])](n + 1)
    H(0) = 0
    var hi = 0
    var lo = 0
    val row0 = new ArrayBuffer[Byte]
    var j = 1
    while (j <= mm && -(gaps.open + (j - 1) * gaps.extend) >= best - margin) {
      H(j) = -(gaps.open + (j - 1) * gaps.extend)
      E(j) = H(j)
      row0 += 2 // from E
      hi = j
      j += 1
    }
    dirRows += ((1, row0.toArray))
    var i = 1
    var terminated = false
    while (i <= n && !terminated) {
      val rowStart = lo
      var diagH = if (rowStart == 0) H(0) else H(rowStart - 1)
      var newLo = -1
      var newHi = -1
      var prevH = NegInf
      var prevE = NegInf
      val dirs = new ArrayBuffer[Byte]
      val dirsStart = math.max(rowStart, 1)
      if (rowStart == 0) {
        val h0 = -(gaps.open + (i - 1) * gaps.extend)
        val keep = h0 >= best - margin
        prevH = if (keep) h0 else NegInf
        H(0) = if (keep) h0 else NegInf
        F(0) = if (keep) h0 else NegInf
        if (keep) { newLo = 0; newHi = 0 }
      }
      j = math.max(rowStart, 1)
      var extendLimit = math.min(mm, hi + 1)
      while (j <= extendLimit) {
        val up = H(j)
        val eOpen = if (prevH > NegInf) prevH - gaps.open else NegInf
        val eExt = if (prevE > NegInf) prevE - gaps.extend else NegInf
        val e = math.max(eOpen, eExt)
        val fOpen = if (up > NegInf) up - gaps.open else NegInf
        val fExt = if (F(j) > NegInf) F(j) - gaps.extend else NegInf
        val f = math.max(fOpen, fExt)
        val d =
          if (diagH > NegInf) diagH + scorer.score(i - 1, j - 1)
          else NegInf
        var h = math.max(d, math.max(e, f))
        var dir = 0
        if (h == d && d > NegInf) dir = 1
        else if (h == e && e > NegInf) dir = 2
        else if (h == f && f > NegInf) dir = 3
        if (eExt >= eOpen && eExt > NegInf) dir |= 4
        if (fExt >= fOpen && fExt > NegInf) dir |= 8
        if (h < best - margin) { h = NegInf; dir = 0 }
        diagH = up
        H(j) = h
        E(j) = e
        F(j) = f
        prevH = h
        prevE = e
        dirs += dir.toByte
        if (h > NegInf) {
          if (newLo < 0) newLo = j
          newHi = j
          if (h > best) { best = h; bestI = i; bestJ = j }
          if (j == extendLimit && extendLimit < mm &&
            (h > NegInf || e > NegInf)) extendLimit = math.min(mm, extendLimit + 1)
        }
        j += 1
      }
      dirRows += ((dirsStart, dirs.toArray))
      if (newLo < 0) terminated = true
      else { lo = newLo; hi = newHi }
      i += 1
    }
    // traceback from (bestI, bestJ) to (0, 0)
    var ci = bestI
    var cj = bestJ
    var runs = List.empty[CigarRun]
    var state = 0 // 0 = in H, 1 = in E, 2 = in F
    def dirAt(ri: Int, rj: Int): Int = {
      if (ri == 0) { if (rj > 0) 2 else 0 }
      else {
        val (start, arr) = dirRows(ri)
        val idx = rj - start
        if (rj == 0) 3 // column 0 of row ri>0: vertical gap chain
        else if (idx < 0 || idx >= arr.length) 0
        else arr(idx) & 0xff
      }
    }
    def push(op: Char, eq: Int): Unit = runs match {
      case CigarRun(`op`, len, e0) :: rest => runs = CigarRun(op, len + 1, e0 + eq) :: rest
      case _ => runs = CigarRun(op, 1, eq) :: runs
    }
    while (ci > 0 || cj > 0) {
      val dir = dirAt(ci, cj)
      if (dir == 0) { // shouldn't happen; bail to gap chain
        if (ci > 0) { push('I', 0); ci -= 1 } else { push('D', 0); cj -= 1 }
      } else state match {
        case 0 =>
          (dir & 3) match {
            case 1 =>
              val eq = if (a(ci - 1) == b(cj - 1)) 1 else 0
              push('M', eq); ci -= 1; cj -= 1
            case 2 => state = 1
            case 3 => state = 2
            case _ =>
              if (ci > 0) { push('I', 0); ci -= 1 } else { push('D', 0); cj -= 1 }
          }
        case 1 => // in E: consumed b (gap in a) -> 'D'
          push('D', 0)
          val ext = (dir & 4) != 0
          cj -= 1
          if (!ext) state = 0
        case 2 => // in F: consumed a (gap in b) -> 'I'
          push('I', 0)
          val ext = (dir & 8) != 0
          ci -= 1
          if (!ext) state = 0
      }
    }
    // `runs` was built by prepending while walking (bestI,bestJ) -> (0,0) in
    // reversed-sequence space: its head is the op nearest (0,0) = the
    // alignment's END in forward space. Reverse once to get forward order.
    TracedAln(best, bestI, bestJ, runs.reverse)
  }
}

package graft.bio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `blockalign` stage as a DataFrame transformation
  * (`src/sra/blockalign.cpp:164-493` re-expressed relationally):
  *
  *  - A3: prefilter hit detail rows grouped per (targetId, queryId) with the
  *    diagonal already attached (our index carries the representative's first
  *    k-mer position, collapsing the reference's J3 binary-search re-lookup
  *    `blockalign.cpp:268-298` into the prefilter join);
  *  - J4: joins to fetch target and query sequences (target join shuffles on
  *    targetId — the big side at petabase scale; query side is explicitly
  *    broadcast-hinted, since RDD-backed query tables carry no stats);
  *  - the per-pair sequential cascade (O5 -> A6 -> T2/C5 -> C6 -> C7) runs
  *    inside one typed map — Catalyst cannot reorder these UDF stages, which
  *    is exactly right: the cascade order IS the optimization (SURVEY §4).
  *
  * Strengthened vs reference: global deterministic output order (O6 was
  * per-OpenMP-thread only, §2.12.4) and fident = identities / alignment
  * length (the reference divides by the cigar RUN count in integer
  * arithmetic, `blockalign.cpp:391` — a bug that makes fident meaningless;
  * divergence documented here and in tests).
  */
object Align {

  val DefaultEvalThr = 1000.0 // workflow default, src/workflow/petasearch.cpp:14
  val DefaultXdrop = 10 // LocalParameters.h:145
  val DefaultGaps: Aligner.Gaps = Aligner.Gaps(11, 1) // Parameters.cpp gapOpen/gapExtend aa
  val MaxDiagDistance = 4 // blockalign.cpp:303

  final case class PairRow(
      targetId: Long, queryId: Long,
      hits: Seq[(Int, Long, Int)], // (kmerPos, kmer, diag)
      qSeq: String, tSeq: String)

  /** prefilter(targetId, queryId, kmerPos, kmer, diag) x sequences ->
    * alignments(queryId, targetId, bits, fident, eval, qStart, qEnd, qLen,
    * tStart, tEnd, tLen, cigar, alnLen, mismatch, gapOpen), sorted by
    * (queryId, eval asc, bits desc, tLen, targetId) (`matcherResultsSort`,
    * strengthened to a global order).
    */
  def run(spark: SparkSession, prefilter: DataFrame, querySeqs: DataFrame,
      targetSeqs: DataFrame, evalThr: Double = DefaultEvalThr,
      xdrop: Int = DefaultXdrop, gaps: Aligner.Gaps = DefaultGaps,
      matrixName: String = "blosum62",
      gumbel: GumbelParams = GumbelParams.Blosum62Ungapped,
      k: Int = KmerIndex.DefaultK,
      knownDbResCount: Option[Long] = None): DataFrame = {
    import spark.implicits._

    // the evaluer's database-residue scalar: an O(1) driver value the
    // reference also needs (blockalign.cpp dbSize); callers with a persisted
    // index pass it from index metadata instead of paying a corpus scan here
    val dbResCount: Long = knownDbResCount.getOrElse(
      targetSeqs.agg(coalesce(sum(col("seqLen")), lit(0L))).as[Long].head())

    val pairs = prefilter
      .groupBy(col("targetId"), col("queryId"))
      .agg(collect_list(struct(col("kmerPos"), col("kmer"), col("diag"))).as("hits"))

    val withSeqs = pairs
      .join(targetSeqs.select(col("seqId").as("targetId"), col("seq").as("tSeq")),
        Seq("targetId"))
      .join(broadcast(querySeqs.select(col("seqId").as("queryId"),
        col("seq").as("qSeq"))), Seq("queryId"))
      .select(col("targetId"), col("queryId"), col("hits"), col("qSeq"), col("tSeq"))
      .as[PairRow]

    val aligned = withSeqs.mapPartitions { iter =>
      // per-task singletons: matrices ship with the jar, the evaluer is tiny
      val m = Matrices.byName(matrixName)
      val evaluer = new Evaluer(gumbel, dbResCount)
      iter.flatMap(p => alignPair(p, m, evaluer, evalThr, xdrop, gaps, k))
    }

    aligned.toDF()
      .orderBy(col("queryId"), col("eval"), col("bits").desc, col("tLen"), col("targetId"))
  }

  /** The per-pair cascade. Returns None when any gate rejects. */
  def alignPair(p: PairRow, m: Matrices, evaluer: Evaluer, evalThr: Double,
      xdrop: Int, gaps: Aligner.Gaps,
      k: Int = KmerIndex.DefaultK): Option[Aligner.AlnResult] =
    alignPairScored(p, m, evaluer, evalThr, xdrop, gaps, k, None)

  /** Cascade core; `profile` switches the GAPPED stages to per-position
    * profile scoring (F4, `blockalign.cpp:313-323` + `BlockAligner.cpp`
    * `align_local_profile`). The ungapped stage always scores consensus x
    * matrix, exactly like the reference (it passes `realSeq` — the decoded
    * consensus — to `ungappedDiagFilter`, and only the block aligner sees
    * the profile columns).
    */
  private[bio] def alignPairScored(p: PairRow, m: Matrices, evaluer: Evaluer,
      evalThr: Double, xdrop: Int, gaps: Aligner.Gaps, k: Int,
      profile: Option[Array[Byte]]): Option[Aligner.AlnResult] = {
    val q = p.qSeq.getBytes("US-ASCII")
    val t = p.tSeq.getBytes("US-ASCII")
    if (t.length < k) return None // P7 min-length (blockalign.cpp:257-259)

    // O5 sort + A6 diagonal-proximity gate
    val sorted = Aligner.sortHits(p.hits.map { case (pos, kmer, diag) =>
      Aligner.Hit(pos, kmer, diag)
    }.toArray)
    if (!Aligner.isWithinNDiagonals(sorted, MaxDiagDistance)) return None

    // T2/C5 ungapped cascade (first accepted diagonal wins)
    val ungapped = Aligner.ungappedDiagFilter(sorted, q, t, m, evaluer, evalThr)
      .getOrElse(return None)

    // anchor = inclusive end of the ungapped segment, query/target space
    val (qAnchor, tAnchor) =
      if (ungapped.diagonal >= 0)
        (ungapped.endPos + ungapped.distToDiagonal, ungapped.endPos)
      else
        (ungapped.endPos, ungapped.endPos + ungapped.distToDiagonal)

    // C6 two-pass X-drop extension (BlockAligner.cpp:60-93 structure)
    val fwdScorer = profile
      .map(pr => new Aligner.ProfileScorer(pr, identity, t, m): Aligner.Scorer)
      .getOrElse(new Aligner.MatrixScorer(q, t, m))
    val fwd = Aligner.xdropExtend(q, qAnchor, t, tAnchor, fwdScorer, gaps, xdrop)
    val qEndExcl = qAnchor + fwd.aLen
    val tEndExcl = tAnchor + fwd.bLen
    val qRev = reverseSlice(q, qEndExcl)
    val tRev = reverseSlice(t, tEndExcl)
    // reversed pass: profile positions mirror like block_set_all_rev_aaprofile
    val revScorer = profile
      .map(pr => new Aligner.ProfileScorer(pr, ai => qEndExcl - 1 - ai, tRev, m): Aligner.Scorer)
      .getOrElse(new Aligner.MatrixScorer(qRev, tRev, m))
    val traced = Aligner.xdropTraceback(qRev, qRev.length, tRev, tRev.length,
      revScorer, gaps, xdrop)
    if (traced.runs.isEmpty) return None // P10 zero-length
    val qStart = qEndExcl - traced.aConsumed
    val tStart = tEndExcl - traced.bConsumed

    // C7 scores: bits from the raw SW score (ungapped Gumbel params — the
    // reference's blockalign evaluer), final e-value re-derived from the
    // ROUNDED bit score with the target length (swapResult, Matcher.h:93-115)
    val score = traced.score
    val bits = (evaluer.computeBitScore(score) + 0.5).toInt
    val evalGate = evaluer.computeEvalue(score, t.length) // align() gate value
    if (evalGate > evalThr) return None // P8
    val evalFinal = evaluer.computeEvalue(
      evaluer.computeRawScoreFromBitScore(bits), t.length)

    // C11 cigar stats
    var alnLen = 0
    var matchCount = 0
    var identical = 0
    var gapOpenCount = 0
    val bt = new StringBuilder
    traced.runs.foreach { r =>
      alnLen += r.len
      r.op match {
        case 'M' => matchCount += r.len; identical += r.eq
        case _ => gapOpenCount += 1
      }
      var i = 0
      while (i < r.len) { bt += r.op; i += 1 }
    }
    val fident = identical.toDouble / math.max(alnLen, 1)
    val mismatch = matchCount - identical

    Some(Aligner.AlnResult(
      queryId = p.queryId, targetId = p.targetId, bits = bits, fident = fident,
      eval = evalFinal, qStart = qStart, qEnd = qEndExcl - 1, qLen = q.length,
      tStart = tStart, tEnd = tEndExcl - 1, tLen = t.length,
      backtrace = bt.toString, alnLen = alnLen, mismatch = mismatch,
      gapOpen = gapOpenCount, raw = score))
  }

  final case class PairRowProf(
      targetId: Long, queryId: Long,
      hits: Seq[(Int, Long, Int)], qSeq: String, profile: Array[Byte],
      tSeq: String)

  /** Profile-mode variant of [[run]] (F4): `profileQueries` carries
    * (seqId, seq = consensus, profile = raw 25-byte-per-position record).
    * The ungapped gates score consensus x matrix; the gapped extension and
    * traceback score target residues against the per-position profile
    * columns (>>2), matching `align_local_profile`. fident counts
    * identities against the CONSENSUS string (the reference's profile m8
    * carries no identity information at all — its `=`-aware cigar is only
    * produced in sequence mode; divergence documented).
    */
  def runProfile(spark: SparkSession, prefilter: DataFrame,
      profileQueries: DataFrame, targetSeqs: DataFrame,
      evalThr: Double = DefaultEvalThr, xdrop: Int = DefaultXdrop,
      gaps: Aligner.Gaps = DefaultGaps, matrixName: String = "blosum62",
      gumbel: GumbelParams = GumbelParams.Blosum62Ungapped,
      k: Int = KmerIndex.DefaultK,
      knownDbResCount: Option[Long] = None): DataFrame = {
    import spark.implicits._

    val dbResCount: Long = knownDbResCount.getOrElse(
      targetSeqs.agg(coalesce(sum(col("seqLen")), lit(0L))).as[Long].head())

    val pairs = prefilter
      .groupBy(col("targetId"), col("queryId"))
      .agg(collect_list(struct(col("kmerPos"), col("kmer"), col("diag"))).as("hits"))

    val withSeqs = pairs
      .join(targetSeqs.select(col("seqId").as("targetId"), col("seq").as("tSeq")),
        Seq("targetId"))
      .join(broadcast(profileQueries.select(col("seqId").as("queryId"),
        col("seq").as("qSeq"), col("profile"))), Seq("queryId"))
      .select(col("targetId"), col("queryId"), col("hits"), col("qSeq"),
        col("profile"), col("tSeq"))
      .as[PairRowProf]

    val aligned = withSeqs.mapPartitions { iter =>
      val m = Matrices.byName(matrixName)
      val evaluer = new Evaluer(gumbel, dbResCount)
      iter.flatMap(p => alignPairScored(
        PairRow(p.targetId, p.queryId, p.hits, p.qSeq, p.tSeq),
        m, evaluer, evalThr, xdrop, gaps, k, Some(p.profile)))
    }

    aligned.toDF()
      .orderBy(col("queryId"), col("eval"), col("bits").desc, col("tLen"), col("targetId"))
  }

  final case class PairRowDb(
      dbId: Long, targetId: Long, queryId: Long,
      hits: Seq[(Int, Long, Int)], qSeq: String, tSeq: String)

  /** Multi-DB variant: one job over a `dbId`-partitioned corpus. Each pair
    * is aligned with ITS database's evaluer (per-DB residue counts, exactly
    * like independent per-DB `blockalign` runs); the tiny dbId->residues map
    * ships in the task closure.
    */
  def runPartitioned(spark: SparkSession, prefilter: DataFrame,
      querySeqs: DataFrame, targetSeqs: DataFrame,
      evalThr: Double = DefaultEvalThr, xdrop: Int = DefaultXdrop,
      gaps: Aligner.Gaps = DefaultGaps, matrixName: String = "blosum62",
      gumbel: GumbelParams = GumbelParams.Blosum62Ungapped,
      k: Int = KmerIndex.DefaultK): DataFrame = {
    import spark.implicits._

    val dbRes: Map[Long, Long] = targetSeqs
      .groupBy(col("dbId")).agg(sum(col("seqLen")).as("res"))
      .as[(Long, Long)].collect().toMap

    val pairs = prefilter
      .groupBy(col("dbId"), col("targetId"), col("queryId"))
      .agg(collect_list(struct(col("kmerPos"), col("kmer"), col("diag"))).as("hits"))

    val withSeqs = pairs
      .join(targetSeqs.select(col("dbId"), col("seqId").as("targetId"),
        col("seq").as("tSeq")), Seq("dbId", "targetId"))
      .join(broadcast(querySeqs.select(col("seqId").as("queryId"),
        col("seq").as("qSeq"))), Seq("queryId"))
      .select(col("dbId"), col("targetId"), col("queryId"), col("hits"),
        col("qSeq"), col("tSeq"))
      .as[PairRowDb]

    val aligned = withSeqs.mapPartitions { iter =>
      val m = Matrices.byName(matrixName)
      val evaluers = scala.collection.mutable.Map.empty[Long, Evaluer]
      iter.flatMap { p =>
        val ev = evaluers.getOrElseUpdate(p.dbId,
          new Evaluer(gumbel, dbRes(p.dbId)))
        alignPair(PairRow(p.targetId, p.queryId, p.hits, p.qSeq, p.tSeq),
          m, ev, evalThr, xdrop, gaps, k)
          .map(r => (p.dbId, r))
      }
    }

    aligned.map { case (dbId, r) => (dbId, r.queryId, r.targetId, r.bits,
      r.fident, r.eval, r.qStart, r.qEnd, r.qLen, r.tStart, r.tEnd, r.tLen,
      r.backtrace, r.alnLen, r.mismatch, r.gapOpen) }
      .toDF("dbId", "queryId", "targetId", "bits", "fident", "eval",
        "qStart", "qEnd", "qLen", "tStart", "tEnd", "tLen", "backtrace",
        "alnLen", "mismatch", "gapOpen")
      .orderBy(col("queryId"), col("eval"), col("bits").desc, col("dbId"),
        col("targetId"))
  }

  private def reverseSlice(a: Array[Byte], end: Int): Array[Byte] = {
    val out = new Array[Byte](end)
    var i = 0
    while (i < end) { out(i) = a(end - 1 - i); i += 1 }
    out
  }
}

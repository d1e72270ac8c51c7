package graft.bio

import org.apache.spark.sql.{DataFrame, SparkSession}

/** F4: HMM-profile record decoding (`Sequence::extractProfileConsensus`,
  * `lib/mmseqs/src/commons/Sequence.cpp:387-401`). Profile DBs store 25
  * bytes per position: 20 per-residue scores, the query residue ordinal
  * (byte 20), the consensus ordinal (byte 21), Neff and two gap bytes
  * (`Sequence.h:458-471`).
  *
  * `toSequences` turns a profile table into a searchable sequences table
  * using the consensus string — the same string the reference extracts
  * k-mers from in profile mode (`blockalign.cpp:313-323`); the per-position
  * profile SCORES feed the gapped kernels through `Aligner.ProfileScorer`.
  */
object Profiles {

  val ReadInSize = 25
  val QueryOffset = 20
  val ConsensusOffset = 21

  private def extract(data: Array[Byte], offset: Int, m: Matrices): String = {
    val sb = new StringBuilder(data.length / ReadInSize)
    var i = 0
    while (i + offset < data.length) {
      sb += m.alphabet(data(i + offset) & 0xff)
      i += ReadInSize
    }
    sb.toString
  }

  def extractSequence(data: Array[Byte], m: Matrices = Matrices.blosum62): String =
    extract(data, QueryOffset, m)

  def extractConsensus(data: Array[Byte], m: Matrices = Matrices.blosum62): String =
    extract(data, ConsensusOffset, m)

  /** profiles(seqId BIGINT, header STRING, profile BINARY) ->
    * sequences(seqId, header, name, seq, seqLen) with seq = consensus.
    */
  def toSequences(spark: SparkSession, profiles: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val consensusUdf = udf((b: Array[Byte]) => extractConsensus(b))
    profiles
      .withColumn("seq", consensusUdf(col("profile")))
      .withColumn("name", Fasta.parseFastaHeaderCol(col("header")))
      .withColumn("seqLen", length(col("seq")).cast("int"))
      .select("seqId", "header", "name", "seq", "seqLen")
  }

  /** Per-position profile score: stored int8 for residue ordinal `res` at
    * position `pos`, before the aligner's >>2 scaling.
    */
  def scoreAt(data: Array[Byte], pos: Int, res: Int): Int =
    data(pos * ReadInSize + res).toInt

  /** Encode a profile record from explicit per-position score rows (one
    * Array[Int] of `alphabetSize-1 = 20` scores per position, clamped to
    * int8), plus query and consensus strings. Inverse of [[extract]]; used
    * by profile builders and tests.
    */
  def encode(scoreRows: Seq[Array[Int]], query: String, consensus: String,
      m: Matrices = Matrices.blosum62): Array[Byte] = {
    require(scoreRows.length == query.length && query.length == consensus.length)
    val out = new Array[Byte](scoreRows.length * ReadInSize)
    var p = 0
    while (p < scoreRows.length) {
      val row = scoreRows(p)
      var r = 0
      while (r < QueryOffset) {
        val s = if (r < row.length) row(r) else 0
        out(p * ReadInSize + r) = math.max(-128, math.min(127, s)).toByte
        r += 1
      }
      out(p * ReadInSize + QueryOffset) = m.aa2num(query.charAt(p) & 0xff).toByte
      out(p * ReadInSize + ConsensusOffset) = m.aa2num(consensus.charAt(p) & 0xff).toByte
      // Neff + gap bytes: neutral defaults (not consumed by the aligner)
      out(p * ReadInSize + 22) = 1
      p += 1
    }
    out
  }

  /** mmseqs-faithful PSSM from an aligned sequence set — the reference's
    * `msa2profile` + `PSSMCalculator` pipeline
    * (`lib/mmseqs/src/alignment/PSSMCalculator.cpp:138-266,300-380`,
    * substitution-score pseudo-count mode with global sequence weighting):
    * Henikoff 1994 position-based sequence weights, weighted column
    * frequencies normalized against background, per-column effective
    * sequence number Neff, substitution-matrix pseudo-count admixture
    * tau = min(1, pca / (1 + Neff/pcb)) with the reference defaults
    * pca=1.1 pcb=4.1 (`Parameters.cpp:2345-2346`), and final scores
    * round(8 * log2(p/background)) — which the aligner's >>2 turns into
    * half-bit log-odds, the same scale as the integer matrices.
    *
    * `matchMode` follows msa2profile's column selection (`--match-mode` /
    * `--match-ratio`): mode 0 (the reference DEFAULT) keeps only columns
    * where the FIRST sequence has a residue — the profile's coordinate
    * system is the first sequence, which is what makes m8 q-coordinates
    * comparable with the reference's profile search; mode 1 keeps columns
    * with a residue in >= matchRatio of the member sequences; mode -1 keeps
    * every MSA column.
    */
  def fromAlignedSeqs(rows: Seq[String],
      m: Matrices = Matrices.blosum62, matchMode: Int = 0,
      matchRatio: Double = 0.5): Array[Byte] = {
    require(rows.nonEmpty && rows.forall(_.length == rows.head.length))
    def isRes(c: Char): Boolean = c != '-' && c != '.'
    val keep: Int => Boolean = matchMode match {
      case 0 => p => isRes(rows.head.charAt(p))
      case 1 => p =>
        rows.count(r => isRes(r.charAt(p))) >= matchRatio * rows.size
      case _ => _ => true
    }
    val cols = rows.head.indices.filter(keep)
    val kept = rows.map(r => cols.map(r.charAt).mkString)
    computePssm(kept, m)
  }

  /** msa2profile's final transform (`msa2profile.cpp:417-421`,
    * `SubstitutionMatrix::calcGlobalAaBiasCorrection`, compBiasCorrection
    * default ON): per-position composition correction over a 40-wide
    * window of the FINISHED pssm. Replicated exactly, including the
    * sequential in-place mutation (neighborhood reads already-corrected
    * rows for j < i while pNull comes from the uncorrected scores), float
    * arithmetic, and the toward-zero int cast.
    */
  private def globalAaBiasCorrection(scores: Array[Array[Int]]): Unit = {
    val len = scores.length
    val window = 40
    val pNull = new Array[Float](len)
    var p = 0
    while (p < len) {
      var a = 0
      while (a < 20) { pNull(p) += (PBack(a) * scores(p)(a)).toFloat; a += 1 }
      p += 1
    }
    var i = 0
    while (i < len) {
      val minPos = math.max(0, i - window / 2)
      val maxPos = math.min(len, i + window / 2)
      val windowLength = maxPos - minPos
      val aaSum = new Array[Float](20)
      var j = minPos
      while (j < maxPos) {
        if (j != i) {
          var a = 0
          while (a < 20) { aaSum(a) += scores(j)(a) - pNull(j); a += 1 }
        }
        j += 1
      }
      var a = 0
      while (a < 20) {
        scores(i)(a) = (scores(i)(a) - aaSum(a) / windowLength).toInt
        a += 1
      }
      i += 1
    }
  }

  private def computePssm(rows: Seq[String], m: Matrices): Array[Byte] = {
    val len = rows.head.length
    val n = rows.size
    val NRes = QueryOffset // 20
    // residue ordinals; -1 = gap, >=20 (X) participates as "non-gap, no count"
    val ords = rows.map(_.map(c =>
      if (c == '-' || c == '.') -1 else m.aa2num(c & 0xff)).toArray).toArray
    val nres = ords.map(_.count(_ >= 0))

    // Henikoff position-based sequence weights (computeSequenceWeights)
    val w = Array.fill(n)(1e-6)
    var p = 0
    while (p < len) {
      val nl = new Array[Int](NRes)
      var distinct = 0
      var k = 0
      while (k < n) {
        val a = ords(k)(p)
        if (a >= 0 && a < NRes) { if (nl(a) == 0) distinct += 1; nl(a) += 1 }
        k += 1
      }
      if (distinct != 0) {
        k = 0
        while (k < n) {
          val a = ords(k)(p)
          if (a >= 0 && a < NRes)
            w(k) += 1.0 / (nl(a).toDouble * distinct * (nres(k) + 30.0))
          k += 1
        }
      }
      p += 1
    }
    val wSum = w.sum
    val wn = w.map(_ / wSum)

    // context-specific per-column weights + Neff — the reference's wg=false
    // DEFAULT path (computeContextSpecificWeights, PSSMCalculator.cpp:
    // 393-570): for every column i, the subalignment of sequences with a
    // residue at i gets its own Henikoff-style weights computed over the
    // end-gap-trimmed columns; f[i] and Neff[i] come from those weights.
    val log2 = math.log(2)
    val (f, neffM) = contextWeights(ords, wn, len)

    // pseudo-count admixture + 8*log2 scores (preparePseudoCounts,
    // computePseudoCounts, computeLogPSSM) and consensus (prob - background
    // argmax, computeConsensusSequence)
    val scoreRows = new Array[Array[Int]](len)
    val consensus = new StringBuilder(len)
    val query = new StringBuilder(len)
    p = 0
    while (p < len) {
      val tau = math.min(1.0, 1.1 / (1.0 + neffM(p) / 4.1))
      val row = new Array[Int](NRes)
      var a = 0
      while (a < NRes) {
        var g = 0.0
        var b = 0
        while (b < NRes) { g += PseudoR(a)(b) * f(p)(b); b += 1 }
        val prob = (1.0 - tau) * f(p)(a) + tau * g
        row(a) =
          if (prob <= 0) -128
          else {
            val v = 8.0 * math.log(prob / PBack(a)) / log2
            val r = if (v < 0) (v - 0.5).toInt else (v + 0.5).toInt
            math.max(-128, math.min(127, r))
          }
        a += 1
      }
      scoreRows(p) = row
      var maxw = 1e-8
      var maxa = -1
      a = 0
      while (a < NRes) {
        if (f(p)(a) - PBack(a) > maxw) { maxw = f(p)(a) - PBack(a); maxa = a }
        a += 1
      }
      val consChar = if (maxa < 0) 'X' else m.alphabet(maxa)
      consensus += consChar
      val qc = rows.head.charAt(p)
      query += (if (qc == '-' || qc == '.') consChar else qc)
      p += 1
    }
    globalAaBiasCorrection(scoreRows)
    encode(scoreRows.toSeq, query.toString, consensus.toString, m)
  }

  /** The reference's context-specific weighting
    * (`PSSMCalculator::computeContextSpecificWeights`): per column i, the
    * SUBALIGNMENT of sequences holding a residue there (X excluded) gets
    * position-based weights computed over the columns where at most 10% of
    * the subalignment is in an end-gap; short subalignments (< 20 columns)
    * fall back to the global Henikoff weights. Membership counts update
    * incrementally (only sequences entering/leaving between i-1 and i).
    * Codes: 0-19 residue, 20 X, 21 gap, 22 end-gap.
    * Returns (per-column frequencies over 20 residues normalized with
    * background fallback, per-column Neff).
    */
  private def contextWeights(ords: Array[Array[Int]], wg: Array[Double],
      len: Int): (Array[Array[Double]], Array[Double]) = {
    val n = ords.length
    val Any = 20
    val EndGap = 22
    val log2 = math.log(2)
    // recode: -1 gap -> 21, then end-gap runs -> 22
    val x = ords.map(_.map(o => if (o < 0) 21 else math.min(o, Any)))
    x.foreach { row =>
      var i = 0
      while (i < len && row(i) == 21) { row(i) = EndGap; i += 1 }
      i = len - 1
      while (i >= 0 && row(i) == 21) { row(i) = EndGap; i -= 1 }
    }
    val counts = Array.ofDim[Int](len, 23)
    val f = Array.ofDim[Double](len, Any)
    val neffM = new Array[Double](len)
    val wi = new Array[Double](n)
    var nseqi = 0
    var i = 0
    while (i < len) {
      var change = false
      var k = 0
      while (k < n) {
        if ((i == 0 && x(k)(0) < Any) ||
            (i != 0 && x(k)(i - 1) >= Any && x(k)(i) < Any)) {
          change = true
          nseqi += 1
          var j = 0
          while (j < len) { counts(j)(x(k)(j)) += 1; j += 1 }
        } else if (i != 0 && x(k)(i - 1) < Any && x(k)(i) >= Any) {
          change = true
          nseqi -= 1
          var j = 0
          while (j < len) { counts(j)(x(k)(j)) -= 1; j += 1 }
        }
        k += 1
      }
      if (change) {
        java.util.Arrays.fill(wi, 1e-8)
        var jmin = 0
        while (jmin < len && counts(jmin)(EndGap) > 0.1 * nseqi) jmin += 1
        var jmax = len - 1
        while (jmax >= 0 && counts(jmax)(EndGap) > 0.1 * nseqi) jmax -= 1
        val ncol = jmax - jmin + 1
        if (ncol < 20) {
          k = 0
          while (k < n) {
            wi(k) = if (x(k)(i) < Any) wg(k) else 0.0
            k += 1
          }
        } else {
          val wContrib = Array.ofDim[Double](len, Any)
          var j = jmin
          while (j <= jmax) {
            var naa = 0
            var a = 0
            while (a < Any) { if (counts(j)(a) > 0) naa += 1; a += 1 }
            a = 0
            while (a < Any) {
              wContrib(j)(a) =
                if (counts(j)(a) > 0) 1.0 / (naa.toDouble * counts(j)(a))
                else 0.0
              a += 1
            }
            j += 1
          }
          k = 0
          while (k < n) {
            if (x(k)(i) < Any) {
              var s = 0.0
              var j = jmin
              while (j <= jmax) {
                val c = x(k)(j)
                if (c < Any) s += wContrib(j)(c)
                j += 1
              }
              wi(k) += s
            }
            k += 1
          }
        }
        // Neff[i]: average residue entropy of the subalignment's columns
        var ent = 0.0
        val fj = new Array[Double](Any)
        var j = jmin
        while (j <= jmax) {
          java.util.Arrays.fill(fj, 0.0)
          k = 0
          while (k < n) {
            if (x(k)(i) < Any) {
              val c = x(k)(j)
              if (c < Any) fj(c) += wi(k)
            }
            k += 1
          }
          val s = fj.sum
          if (s != 0) {
            var a = 0
            while (a < Any) {
              val v = fj(a) / s
              if (v > 1e-10) ent -= v * math.log(v) / log2
              a += 1
            }
          }
          j += 1
        }
        neffM(i) = if (ncol > 0) math.pow(2, ent / ncol) else 1.0
      } else {
        neffM(i) = if (i == 0) 0.0 else neffM(i - 1)
      }
      // column frequencies from the (possibly carried-over) weights
      var kk = 0
      while (kk < n) {
        val c = x(kk)(i)
        if (c < Any) f(i)(c) += wi(kk)
        kk += 1
      }
      val s = f(i).sum
      if (s > 0) { var a = 0; while (a < Any) { f(i)(a) /= s; a += 1 } }
      else Array.copy(PBack, 0, f(i), 0, Any)
      i += 1
    }
    (f, neffM)
  }

  /** Background probabilities and the pseudo-count conditional matrix
    * R[a][b] = P(a|b), both dumped numerically from the reference's
    * SubstitutionMatrix("blosum62.out", 2.0, 0.0)
    * (`BaseMatrix.cpp` pBack / subMatrixPseudoCounts) — the same
    * run-the-reference-once extraction used for the nucleotide Gumbel
    * constants. Alphabet order ACDEFGHIKLMNPQRSTVWY.
    */
  private[bio] val PBack: Array[Double] = Array(
    0.0742192578, 0.0246897531, 0.0536294637, 0.0543094569, 0.0474195258,
    0.0741492585, 0.0262097379, 0.0679193208, 0.0581494185, 0.0989090109,
    0.0249897501, 0.0446495535, 0.0385396146, 0.0342596574, 0.0516094839,
    0.0572294277, 0.0508894911, 0.0729192708, 0.0130298697, 0.0322796772)

  private[bio] val PseudoR: Array[Array[Double]] = Array(
    Array(0.289663047, 0.0644192547, 0.0404202528, 0.0550170057, 0.0345035717,
      0.0784385353, 0.0422606766, 0.0469423458, 0.0575508177, 0.04467595,
      0.0536710657, 0.0436634272, 0.0559689105, 0.0561706014, 0.0454760157,
      0.109258205, 0.0730609894, 0.0695037171, 0.0309166554, 0.0402738266),
    Array(0.0214301962, 0.483305752, 0.00744274119, 0.00705985632, 0.0108385021,
      0.0103791989, 0.00876661483, 0.0161334872, 0.00862034317, 0.0158575103,
      0.0150944255, 0.00982139632, 0.00937119313, 0.00903123338, 0.00762804318,
      0.0182310659, 0.0182839073, 0.0186614636, 0.0111103328, 0.0107208155),
    Array(0.0292070266, 0.016166307, 0.396726131, 0.0905175507, 0.0160334464,
      0.0340169184, 0.0363926105, 0.018180998, 0.0420518257, 0.0153707955,
      0.0185804795, 0.0833304077, 0.0321086347, 0.0481102727, 0.0307415314,
      0.0489907414, 0.0372615792, 0.018046733, 0.0124480976, 0.0185392331),
    Array(0.0402569659, 0.0155285001, 0.0916618407, 0.297044605, 0.0179627798,
      0.0261368304, 0.0521409884, 0.0179503188, 0.0710526481, 0.020250611,
      0.0271736793, 0.0494914278, 0.0368863493, 0.103281602, 0.0521822423,
      0.0516130589, 0.0402660929, 0.023295667, 0.0203290917, 0.0269634239),
    Array(0.0220445693, 0.0208159573, 0.014176731, 0.0156843681, 0.385455012,
      0.0161526073, 0.0309180971, 0.0448473133, 0.0163148548, 0.0547506623,
      0.04762692, 0.0168001093, 0.0136303976, 0.0158371758, 0.0180550274,
      0.0208634175, 0.0228421688, 0.0353321433, 0.0651743412, 0.13132374),
    Array(0.0783651397, 0.0311707221, 0.0470327176, 0.0356863625, 0.0252579767,
      0.509857893, 0.0365546942, 0.0203918274, 0.0436650552, 0.0210956912,
      0.0293252263, 0.0640415549, 0.0353980809, 0.039940685, 0.0333676264,
      0.0670002177, 0.0429526754, 0.0249855518, 0.0312687755, 0.0258575901),
    Array(0.0149230445, 0.0093055591, 0.0177846719, 0.0251626372, 0.0170881953,
      0.0129202437, 0.354000121, 0.00855185371, 0.0204152279, 0.00997759961,
      0.0153098172, 0.032027781, 0.0123940008, 0.0306124426, 0.0240362044,
      0.0193092134, 0.0146121569, 0.00889683887, 0.0116396099, 0.0471230857),
    Array(0.042957481, 0.0443804637, 0.0230252035, 0.0224492643, 0.0642351732,
      0.018678274, 0.0221622232, 0.271530211, 0.0269227326, 0.115083687,
      0.100366943, 0.0222732574, 0.0261255987, 0.0260097757, 0.0240959786,
      0.030099012, 0.0529647768, 0.164191142, 0.0277716517, 0.042816557),
    Array(0.0450881757, 0.0203013662, 0.0455940031, 0.0760759413, 0.0200058427,
      0.0342414193, 0.0452943891, 0.0230492223, 0.277051151, 0.0249039531,
      0.0363616571, 0.054650683, 0.0409240201, 0.0903845206, 0.12076737,
      0.0541907921, 0.0461066775, 0.0265474282, 0.0208725613, 0.0309473109),
    Array(0.0595371462, 0.0635241419, 0.0283479877, 0.0368814729, 0.114199981,
      0.0281393807, 0.0376547091, 0.167592257, 0.0423614979, 0.375509977,
      0.197254702, 0.0306660701, 0.0367067307, 0.0472128801, 0.0468766019,
      0.0424215272, 0.0653127953, 0.129986823, 0.0561851189, 0.0684522167),
    Array(0.0180709437, 0.0152773056, 0.00865783356, 0.0125038847, 0.0250989515,
      0.009882994, 0.0145978751, 0.0369281285, 0.0156269092, 0.049837213,
      0.161964372, 0.0118580889, 0.0105931172, 0.021597378, 0.0155600691,
      0.0149575733, 0.0198370498, 0.031709794, 0.0152517147, 0.0177022349),
    Array(0.0262675975, 0.0177609138, 0.0693773553, 0.0406900682, 0.0158189293,
      0.0385630131, 0.0545642748, 0.0146423988, 0.0419649743, 0.0138435168,
      0.0211873483, 0.3167319, 0.0223214999, 0.0446764119, 0.0383387394,
      0.0549863912, 0.0439420901, 0.0164776016, 0.0124034593, 0.021701524),
    Array(0.0290628653, 0.0146276997, 0.0230741166, 0.0261765961, 0.0110780308,
      0.0183983073, 0.0182256121, 0.0148246279, 0.0271243099, 0.0143028656,
      0.0163370911, 0.0192669258, 0.494734228, 0.0247155037, 0.018558858,
      0.0291163251, 0.0265498776, 0.0170763526, 0.0108619919, 0.0140103903),
    Array(0.0259277225, 0.0125311781, 0.0307329874, 0.065152958, 0.0114418296,
      0.0184534397, 0.0400158726, 0.013119516, 0.053252276, 0.0163531564,
      0.0296084508, 0.0342792273, 0.0219701566, 0.213927627, 0.0481641777,
      0.0330796316, 0.0271108765, 0.0159916375, 0.0174508635, 0.0209363215),
    Array(0.0316208042, 0.0159438513, 0.0295820124, 0.0495871529, 0.0196494833,
      0.0232232194, 0.047329884, 0.01830885, 0.107183754, 0.0244586486,
      0.0321337506, 0.0443124585, 0.0248513632, 0.0725536719, 0.344018161,
      0.0395923629, 0.034979254, 0.0216796994, 0.0203916393, 0.0286937151),
    Array(0.0842473879, 0.0422575176, 0.0522790961, 0.054389853, 0.0251796823,
      0.0517112613, 0.0421644077, 0.0253618285, 0.0533355437, 0.0245456453,
      0.0342549123, 0.0704782382, 0.0432361849, 0.055259604, 0.0439059362,
      0.219921842, 0.0923625231, 0.0323476605, 0.0220510755, 0.0319077261),
    Array(0.0500943735, 0.0376844294, 0.0353570729, 0.0377310403, 0.0245133787,
      0.0294781439, 0.0283724442, 0.0396840945, 0.0403511636, 0.0336037278,
      0.0403961353, 0.0500819869, 0.0350569673, 0.0402709283, 0.0344923995,
      0.0821290463, 0.245900333, 0.0499198511, 0.0219307933, 0.0291685946),
    Array(0.0682856143, 0.0551133044, 0.0245375652, 0.0312789567, 0.0543317385,
      0.0245706532, 0.0247534607, 0.176277503, 0.0332914293, 0.0958310589,
      0.0925281718, 0.0269099344, 0.0323090889, 0.0340375938, 0.0306326039,
      0.0412156023, 0.0715304688, 0.269222349, 0.0273055173, 0.0479854234),
    Array(0.00542752491, 0.0058630812, 0.00302429358, 0.00487734145, 0.0179080535,
      0.00549448188, 0.00578664336, 0.00532766571, 0.0046770703, 0.00740144262,
      0.00795220118, 0.00361950835, 0.00367220724, 0.00663698651, 0.00514838379,
      0.00502038142, 0.00561513565, 0.00487908628, 0.496525496, 0.0274908468),
    Array(0.0175153017, 0.0140156141, 0.0111583034, 0.0160260201, 0.089392364,
      0.011256136, 0.0580373369, 0.0203485005, 0.0171793401, 0.0223392211,
      0.0228655785, 0.0156885367, 0.0117341969, 0.0197260361, 0.0179469641,
      0.0179965068, 0.0185014978, 0.0212413874, 0.0681041479, 0.317378342))

  /** Legacy averaged-matrix PSSM (pre-round-4 builder): per-position scores
    * are the column-composition-weighted average of matrix rows, scaled x4
    * so the aligner's >>2 recovers matrix magnitude. A single-sequence
    * profile reproduces 4x its matrix rows exactly — kept because that
    * property pins the ProfileScorer wiring in specs.
    */
  def fromAlignedSeqsAvg(rows: Seq[String],
      m: Matrices = Matrices.blosum62): Array[Byte] = {
    require(rows.nonEmpty && rows.forall(_.length == rows.head.length))
    val len = rows.head.length
    val nRes = QueryOffset // 20
    val scoreRows = new scala.collection.mutable.ArrayBuffer[Array[Int]](len)
    val query = new StringBuilder(len)
    val consensus = new StringBuilder(len)
    (0 until len).foreach { p =>
      val resCounts = Array.fill(nRes)(0)
      rows.foreach { r =>
        val c = r.charAt(p)
        if (c != '-' && c != '.') {
          val o = m.aa2num(c & 0xff)
          if (o < nRes) resCounts(o) += 1
        }
      }
      val total = resCounts.sum
      val row = Array.tabulate(nRes) { r =>
        if (total == 0) 0
        else {
          val avg = (0 until nRes).map(c =>
            resCounts(c).toDouble / total * m.scores(c)(r)).sum
          math.round(avg * 4).toInt
        }
      }
      scoreRows += row
      val consOrd =
        if (total == 0) nRes else (0 until nRes).maxBy(resCounts)
      val consChar = m.alphabet(if (consOrd >= nRes) nRes else consOrd)
      consensus += consChar
      val qc = rows.head.charAt(p)
      query += (if (qc == '-' || qc == '.') consChar else qc)
    }
    encode(scoreRows.toSeq, query.toString, consensus.toString, m)
  }
}

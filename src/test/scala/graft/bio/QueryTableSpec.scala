package graft.bio

import org.scalatest.funsuite.AnyFunSuite

class QueryTableSpec extends AnyFunSuite {
  private val m = Matrices.vtml80Seed

  test("similarKmers: self kmer comes first, all scores >= threshold, capped") {
    val window = "MKVLATTPF".map(c => m.aa2num(c.toInt)).toArray
    val selfScore = window.map(o => m.scores(o)(o)).sum
    val res = QueryTable.similarKmers(window, m, 225, 20)
    assert(res.length <= 20 && res.nonEmpty)
    // first enumerated = all rank-0 = per-position max = includes self match
    val selfCode = {
      var c = 0L; var pw = 1L
      window.foreach { o => c += o * pw; pw *= 20L }
      c
    }
    assert(res.contains(selfCode))
    // every emitted kmer scores >= 225 against the window
    res.foreach { code =>
      var c = code
      var s = 0
      window.foreach { o =>
        s += m.scores(o)((c % 20).toInt); c /= 20
      }
      assert(s >= 225, s"emitted kmer scores $s < 225")
      assert(s <= selfScore)
    }
  }

  test("similarKmers: high threshold returns empty") {
    val window = "AAAAAAAAA".map(c => m.aa2num(c.toInt)).toArray
    val selfScore = window.map(o => m.scores(o)(o)).sum
    assert(QueryTable.similarKmers(window, m, selfScore + 1, 20).isEmpty)
  }

  test("entropy mask hits homopolymer runs, spares diverse sequence") {
    val homo = "AAAAAAAAAAAAAAAA".map(c => m.aa2num(c.toInt)).toArray
    val masked = QueryTable.entropyMask(homo, m.xOrdinal)
    assert(masked.forall(_ == m.xOrdinal))
    val diverse = "MKVLATTPFGWSDEWI".map(c => m.aa2num(c.toInt)).toArray
    assert(QueryTable.entropyMask(diverse, m.xOrdinal).sameElements(diverse))
  }

  test("bias correction is ~zero on background-like sequence, negative on biased") {
    // strongly biased (poly-W) windows get negative bias -> raised threshold
    val w = "WWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWWW".map(c => m.aa2num(c.toInt)).toArray
    val bias = QueryTable.biasCorrection(w, m)
    assert(bias.forall(_ < 0))
  }

  test("rowsForSequence: exact mode = plain windows; expansion adds rows") {
    val seq = "MKVLATTPFGWSDEWIRRQ"
    val exact = QueryTable.rowsForSequence(seq,
      QueryTable.Config(exactKmerMatching = true, maskMode = false,
        biasCorrection = false)).toSeq
    assert(exact.length == seq.length - 9 + 1)
    val expanded = QueryTable.rowsForSequence(seq,
      QueryTable.Config(maskMode = false, biasCorrection = false)).toSeq
    assert(expanded.length >= exact.length)
    // exact windows are a subset of the expanded rows
    assert(exact.toSet.subsetOf(expanded.toSet))
  }
}

package graft.bio

import org.scalatest.funsuite.AnyFunSuite

class TantanSpec extends AnyFunSuite {
  private val m = Matrices.vtml80Seed
  private def ords(s: String) = s.map(c => m.aa2num(c.toInt)).toArray

  test("homopolymer runs are masked") {
    val masked = Tantan.mask(ords("A" * 40), m)
    assert(masked.count(_ == m.xOrdinal) > 30)
  }

  test("short-period tandem repeat of a DIVERSE unit is masked (entropy cannot)") {
    val unit = "MKVLWETP" // 8 distinct residues: high entropy
    val seq = unit * 6 // period-8 tandem repeat
    val o = ords(seq)
    val masked = Tantan.mask(o, m)
    assert(masked.count(_ == m.xOrdinal) > seq.length / 2,
      s"tantan masked ${masked.count(_ == m.xOrdinal)}/${seq.length}")
    // entropy masking misses it completely
    val entropyMasked = QueryTable.entropyMask(o, m.xOrdinal)
    assert(entropyMasked.sameElements(o))
  }

  test("random diverse sequence stays unmasked") {
    val rnd = new scala.util.Random(9)
    val A = Matrices.KmerAlphabet
    val seq = Array.fill(120)(A(rnd.nextInt(20))).mkString
    val masked = Tantan.mask(ords(seq), m)
    assert(masked.count(_ == m.xOrdinal) == 0)
  }

  test("posteriors are probabilities and peak inside the repeat") {
    val seq = "MKVDWQHRILFECA" + ("ST" * 15) + "GHWKERVLDANFMY"
    val post = Tantan.repeatProbabilities(ords(seq), m)
    assert(post.forall(p => p >= 0.0 && p <= 1.0 + 1e-9))
    val inRepeat = post.slice(20, 35)
    val outside = post.slice(0, 10)
    assert(inRepeat.min > outside.max)
  }
}

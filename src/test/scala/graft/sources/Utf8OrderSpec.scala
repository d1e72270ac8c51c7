package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Utf8Order]] must agree with Spark's UTF8String (UTF-8 byte) order —
  * the order every string min/max stat is computed under — including on
  * supplementary-plane characters, where the JVM's UTF-16 code-unit
  * order DISAGREES (surrogate pairs 0xD800+ sort below U+E000..U+FFFF
  * despite higher code points).
  */
class Utf8OrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("supplementary plane: code-point order, not JVM char order") {
    val supp = new String(Character.toChars(0x10000)) // U+10000
    val bmp = ""
    assert(supp.compareTo(bmp) < 0) // the JVM order (wrong for stats)
    assert(Utf8Order.ord.compare(supp, bmp) > 0) // the UTF-8 order
  }

  test("agrees with Spark min/max over seeded random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def randString(): String = {
      val n = 1 + rnd.nextInt(6)
      val sb = new java.lang.StringBuilder
      (0 until n).foreach { _ =>
        val cp = rnd.nextInt(4) match {
          case 0 => 'a' + rnd.nextInt(26)
          case 1 => 0xE000 + rnd.nextInt(0x100)
          case 2 => 0x10000 + rnd.nextInt(0x1000) // supplementary
          case _ => rnd.nextInt(0xD7FF) + 1
        }
        sb.appendCodePoint(cp)
      }
      sb.toString
    }
    (0 until 20).foreach { _ =>
      val xs = Seq.fill(16)(randString())
      val r = xs.toDF("s").agg(min(col("s")), max(col("s"))).head()
      assert(r.getString(0) == xs.min(Utf8Order.ord),
        s"min mismatch on ${xs.map(_.codePoints.toArray.mkString("+"))}")
      assert(r.getString(1) == xs.max(Utf8Order.ord))
    }
  }

  test("incLast: rounds up, skips the surrogate gap, drops at max") {
    def inc(s: String) =
      Utf8Order.incLast(Utf8Order.codePoints(s)).map(Utf8Order.fromCodePoints)
    assert(inc("ab").contains("ac"))
    assert(inc("a퟿").contains("a")) // never lands in D800-DFFF
    val max = new String(Character.toChars(Character.MAX_CODE_POINT))
    assert(inc(max * 3).isEmpty) // cannot round up: bound must stay open
    assert(inc("a" + max).contains("b"))
    // the incremented bound really is greater than any same-prefix string
    assert(Utf8Order.ord.compare(inc("ab").get, "ab￿￿") > 0)
  }
}

package graft.sources

/** Code-point string ordering + bound arithmetic for the stats/skipping
  * family. Spark stores and compares strings as `UTF8String` (UTF-8
  * bytes, whose order equals CODE-POINT order), while JVM
  * `String.compareTo` / `Ordering[String]` compare UTF-16 CODE UNITS —
  * the two disagree for supplementary characters (U+10000 and above sort
  * *below* U+E000..U+FFFF under code units because they are stored as
  * surrogate pairs 0xD800-0xDFFF). A driver-side prune that compares
  * probe bounds against Spark-computed min/max with the JVM order could
  * therefore falsely drop a file that holds matching rows. Every
  * driver-side string comparison against Spark-born bounds goes through
  * [[ord]], and every bound increment/truncation through the code-point
  * helpers here.
  */
private[sources] object Utf8Order {

  /** Matches `UTF8String.compareTo` (binary UTF-8 order). */
  val ord: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  def codePoints(s: String): Array[Int] = s.codePoints.toArray

  def fromCodePoints(cps: Array[Int]): String =
    new String(cps, 0, cps.length)

  /** The smallest string GREATER than every string having `cps` as a
    * prefix: drop trailing max code points, increment the last remaining
    * one (skipping the surrogate gap D800-DFFF — not valid code points,
    * so the bound stays tight and well-formed). None when no such string
    * exists (all-max prefix): the caller must leave the bound open.
    */
  def incLast(cps: Array[Int]): Option[Array[Int]] = {
    val i = cps.lastIndexWhere(_ != Character.MAX_CODE_POINT)
    if (i < 0) None
    else {
      val n0 = cps(i) + 1
      val n = if (n0 >= 0xD800 && n0 <= 0xDFFF) 0xE000 else n0
      Some(cps.take(i) :+ n)
    }
  }
}

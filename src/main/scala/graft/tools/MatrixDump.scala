package graft.tools

import graft.bio.Matrices

/** Dev tool: print an integer substitution matrix (same layout as the
  * reference-probe dump) for differential matrix validation.
  *
  * Usage: runMain graft.tools.MatrixDump <name>   (blosum62|vtml80|nucleotide)
  */
object MatrixDump {
  def main(args: Array[String]): Unit = {
    val m = Matrices.byName(args(0))
    println("alphabet: " + m.alphabet)
    (0 until 20).foreach { a =>
      println((0 until 20).map(b => m.scores(a)(b)).mkString(" "))
    }
  }
}

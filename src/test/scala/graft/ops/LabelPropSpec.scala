package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side synchronous LPA mirroring Graph.labelPropagation:
    * pure neighbor vote, argmax count, min label on ties.
    */
  private def refLabelProp(pairs: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct }
    var lbl: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (v, ns) =>
        val counts = ns.map(lbl).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        val maxC = counts.values.max
        v -> counts.collect { case (l, c) if c == maxC => l }.min
      }
    }
    lbl
  }

  private def run(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    Graph.labelPropagation(pairs.toDF("a", "b"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches driver-side synchronous LPA on bridged triangles") {
    // two triangles joined by one bridge, plus duplicate + reversed rows
    // to exercise the mirror+distinct normalization
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (3L, 10L), (2L, 1L), (1L, 2L))
    for (r <- 1 to 4)
      assert(run(pairs, r) == refLabelProp(pairs, r), s"rounds=$r")
  }

  test("disjoint cliques converge to their minimum member label") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val got = run(k4 ++ tri, rounds = 3)
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
  }

  test("fixed rounds pin the oscillating path deterministically") {
    // a 3-path under synchronous update never converges — the contract is
    // a fixed round count both engines unroll, so the partial state IS
    // the answer (same stance as kCore's partial peel)
    val pairs = Seq((1L, 2L), (2L, 3L))
    assert(run(pairs, 3) == refLabelProp(pairs, 3))
    assert(run(pairs, 3) == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    assert(run(pairs, 4) == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}

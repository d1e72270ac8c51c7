package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling on hand-built graphs. */
class KcoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int = 10) =
    Graph.kCore(edges.toDF("a", "b"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-core keeps the triangle, peels the pendant chain") {
    // triangle 1-2-3 with a chain 3-4-5 hanging off
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(g, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("chain peeling needs multiple rounds; bounded rounds give the partial peel") {
    // path 1-2-3-4-5: the 2-core is empty, reached after 2 peel rounds
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(core(path, 2) == Map.empty)
    // one round removes only the endpoints' edges: 2-3-4 remains
    assert(core(path, 2, rounds = 1) == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("3-core extracts K4 from K4 plus satellites; duplicates/mirrors collapse") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    // mirrored + duplicated edges and satellites must not change the core
    val g = k4 ++ k4.map(_.swap) ++ Seq((1L, 9L), (9L, 10L), (2L, 9L))
    assert(core(g, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}

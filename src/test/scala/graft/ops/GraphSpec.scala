package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference power iteration on a driver-side adjacency map. */
  private def refPageRank(pairs: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val n = adj.size
    var r = adj.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      r = adj.map { case (v, _) =>
        // .iterator: mapping over a Set would collapse EQUAL contributions
        v -> ((1 - d) / n + d * adj.filter(_._2.contains(v)).keys.iterator
          .map(u => r(u) / adj(u).size).sum)
      }
    }
    r
  }

  test("pageRank matches driver-side power iteration on a path + triangle") {
    // path 1-2-3 (rank concentrates on the middle), disjoint triangle 10-11-12
    // (symmetric: all equal), plus a duplicate/reversed pair to exercise
    // the mirror+distinct normalization
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
      (2L, 1L), (1L, 2L))
    val got = Graph.pageRank(pairs.toDF("a", "b"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(pairs, 4, 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    // total rank mass conserved (symmetric graph, no dangling leakage)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // middle of the path outranks its leaves; triangle nodes are equal
    assert(got(2L) > got(1L) && got(2L) > got(3L))
    assert(math.abs(got(10L) - got(11L)) < 1e-12)
    assert(math.abs(got(11L) - got(12L)) < 1e-12)
  }

  test("pageRank: zero iterations returns the uniform vector") {
    val got = Graph.pageRank(Seq((1L, 2L), (3L, 4L)).toDF("a", "b"),
      iterations = 0).collect().map(r => r.getDouble(1))
    assert(got.length == 4 && got.forall(v => math.abs(v - 0.25) < 1e-15))
  }

  test("pageRank: empty pair set yields an empty ranking") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.pageRank(empty).collect().isEmpty)
  }

  /** Driver-side PPR reference mirroring personalizedPageRank. */
  private def refPpr(pairs: Seq[(Long, Long)], sources: Set[Long],
      iters: Int, d: Double): Map[Long, Double] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val s = sources.intersect(adj.keySet)
    val tele = adj.keys.map(v => v -> (if (s(v)) 1.0 / s.size else 0.0)).toMap
    var r = tele
    for (_ <- 1 to iters) {
      r = adj.map { case (v, _) =>
        v -> ((1 - d) * tele(v) + d * adj.filter(_._2.contains(v))
          .keys.iterator.map(u => r(u) / adj(u).size).sum)
      }
    }
    r
  }

  test("personalizedPageRank: matches reference; seedless component reads 0") {
    // path 1-2-3 with seed 1; disjoint pair 10-11 with no seed; seed 99
    // is outside the graph and must be ignored
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val seeds = Seq(1L, 99L).toDF("node")
    val got = Graph.personalizedPageRank(pairs.toDF("a", "b"), seeds,
      iterations = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPpr(pairs, Set(1L, 99L), 4, 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    // mass conserved at 1; the seed holds the most mass (note: NOT
    // monotone along the path — degree-1 node 3 returns mass slowly, so
    // it can outrank node 2); the seedless component is exactly zero
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    assert(got(1L) > got(2L) && got(1L) > got(3L))
    assert(got(10L) == 0.0 && got(11L) == 0.0)
  }

  test("personalizedPageRank: rejects a source set disjoint from the graph") {
    val e = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(Seq((1L, 2L)).toDF("a", "b"),
        Seq(50L).toDF("node"))
    }
    assert(e.getMessage.contains("no source node"))
  }

  test("cooccurrenceEdges: adjacent lowercased pairs, no self-loops, distinct") {
    val df = Seq(
      "The cat sat",
      "the CAT ran",
      "solo",
      "loop loop word").toDF("text")
    val got = TextAnalysis.cooccurrenceEdges(df, "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // "the cat" appears twice -> once; "loop loop" self-loop dropped
    assert(got == Set(("the", "cat"), ("cat", "sat"), ("cat", "ran"),
      ("loop", "word")))
  }

  test("pageRankWeighted: matches reference; strong ties attract mass") {
    // star 1-{2,3}: edge 1-2 has weight 9, 1-3 weight 1 → node 2 must
    // outrank node 3 although degrees are equal; duplicate edge rows sum
    val pairs = Seq((1L, 2L, 5.0), (1L, 2L, 4.0), (1L, 3L, 1.0))
    val adjW = Map(
      1L -> Seq((2L, 9.0), (3L, 1.0)),
      2L -> Seq((1L, 9.0)),
      3L -> Seq((1L, 1.0)))
    val n = adjW.size
    val d = 0.85
    var r = adjW.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 4) {
      r = adjW.map { case (v, _) =>
        val inflow = adjW.iterator.flatMap { case (u, es) =>
          es.collect { case (t, w) if t == v =>
            r(u) / es.map(_._2).sum * w }
        }.sum
        v -> ((1 - d) / n + d * inflow)
      }
    }
    val got = Graph.pageRankWeighted(pairs.toDF("a", "b", "w"),
      iterations = 4).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(got.keySet == r.keySet)
    for ((k, v) <- r) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    assert(got(2L) > got(3L))
  }

  test("triangles: counts and coefficients on known shapes") {
    // triangle 1-2-3; square 10-11-12-13 (no triangles); pendant 4 on
    // node 1; duplicate + reversed edges exercise normalization
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L), (2L, 1L))
    val got = Graph.triangles(pairs.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet ==
      Set(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L))
    assert(got(2L) == ((1L, 1.0)) && got(3L) == ((1L, 1.0)))
    // node 1 has deg 3 (2, 3, 4): one triangle of 3 possible pairs
    assert(got(1L)._1 == 1L && math.abs(got(1L)._2 - 1.0 / 3) < 1e-12)
    assert(got(4L) == ((0L, 0.0)))
    for (n <- Seq(10L, 11L, 12L, 13L)) assert(got(n) == ((0L, 0.0)))
  }

  test("triangles: matches brute force on a pseudo-random graph") {
    val rng = new scala.util.Random(11)
    val pairs = (0 until 120).map(_ =>
      (rng.nextInt(20).toLong, rng.nextInt(20).toLong))
      .filter(p => p._1 != p._2)
    val und = pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    val undSet = und.toSet
    val nodes = und.flatMap(p => Seq(p._1, p._2)).distinct
    val want = nodes.map { n =>
      val nb = und.collect {
        case (a, b) if a == n => b
        case (a, b) if b == n => a
      }.distinct
      val t = nb.combinations(2).count { case Seq(x, y) =>
        undSet((math.min(x, y), math.max(x, y)))
      }
      n -> t.toLong
    }.toMap
    val got = Graph.triangles(pairs.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("degrees counts mirrored-distinct neighbors") {
    val got = Graph.degrees(
      Seq((1L, 2L), (2L, 3L), (2L, 1L), (1L, 2L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("bfsDistances: frontier expansion == driver BFS == relax-min, bounded") {
    // path 1-2-3-4-5, triangle 6-7-8, isolated edge 9-10; sources {1, 6}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L), (9L, 10L))
    val src = Seq(1L, 6L)
    def driverBfs(rounds: Int): Map[Long, Long] = {
      val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).toSet }
      var dist = src.map(_ -> 0L).toMap
      var frontier = src.toSet
      for (r <- 1 to rounds) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .diff(dist.keySet)
        dist = dist ++ next.map(_ -> r.toLong)
        frontier = next
      }
      dist
    }
    // relax-min reference (the oracle's form)
    def relaxMin(rounds: Int): Map[Long, Long] = {
      val edges = (pairs ++ pairs.map(_.swap)).distinct
      var dist = src.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val relax = edges.flatMap { case (a, b) =>
          dist.get(a).map(d => b -> (d + 1)) }
        dist = (dist.toSeq ++ relax).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      dist
    }
    for (rounds <- 0 to 4) {
      val got = Graph.bfsDistances(pairs.toDF("a", "b"),
          src.map(Tuple1(_)).toDF("node"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == driverBfs(rounds), s"frontier != BFS at rounds=$rounds")
      assert(got == relaxMin(rounds), s"frontier != relax at rounds=$rounds")
    }
    // bound is honored: node 5 is 4 hops out, absent at rounds=3
    val d3 = Graph.bfsDistances(pairs.toDF("a", "b"),
        src.map(Tuple1(_)).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!d3.contains(5L) && d3(4L) == 3L && d3(8L) == 1L)
    assert(!d3.contains(9L) && !d3.contains(10L)) // unreachable component
  }
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence of the bucketed (scale-path) pair generators with their
  * brute-force definitions.
  *
  *  - simhashPairs: pigeonhole banding is EXACT — (maxHamming+1) disjoint
  *    bands mean any pair within the Hamming radius shares at least one
  *    band, so the banded result must equal the brute-force join.
  *  - embeddingNearDup: SRP bucketing is approximate by design; the spec
  *    plants exact-duplicate vectors (identical SRP bits — always collide)
  *    and checks they survive, and that every reported pair is a true pair
  *    (precision 1 by construction: exact cosine verify).
  */
class BucketedPairsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("simhashPairs banding == brute-force Hamming join") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0L until 60L).map { i =>
      val toks = (0 until 8).map(j => words(((i / 6) + j).toInt % words.length))
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")

    val banded = Dedup.simhashPairs(docs, "doc_id", "text",
      col("id") % 3 === 0, maxHamming = 4)
      .orderBy("a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue))

    // brute force straight from the signatures: a < b, either side in Q
    val sig = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sig.keys
      b <- sig.keys if a < b && (a % 3 == 0 || b % 3 == 0)
      h = java.lang.Long.bitCount(sig(a) ^ sig(b)) if h <= 4
    } yield (a, b, h)).toSeq.sorted

    assert(banded.toSeq == brute)
    assert(brute.nonEmpty) // the test corpus must actually produce pairs
  }

  test("minhash + lshCandidates == fused minhashBanded (same candidate pairs)") {
    val docs = (0L until 30L).map { i =>
      (i, (0 until 10).map(j => s"w${(i / 3 + j) % 12}").mkString(" "))
    }.toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 2).cache()
    val unfused = Dedup.lshCandidates(Dedup.minhash(sh, 8), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = Dedup.minhashBanded(sh, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unfused == fused)
    assert(fused.nonEmpty)
  }

  test("SRP bucketing recall measured vs exact baseline on random vectors") {
    val rnd = new scala.util.Random(11)
    val dims = 32
    // correlated pairs: base vector + noisy copy (high cosine), plus noise
    val base = (0L until 60L).map(i => (i, Array.fill(dims)(rnd.nextGaussian())))
    val copies = base.filter(_._1 % 10 == 0).map { case (i, v) =>
      (i + 500L, v.map(_ + rnd.nextGaussian() * 0.15))
    }
    val emb = (base ++ copies).toDF("vec_id", "embedding")
    val pred = col("vec_id") % 10 === 0
    val exact = Similarity.embeddingNearDupExact(emb, pred, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.embeddingNearDup(emb, pred, 0.8,
      nProj = 8, rowsPerBand = 2, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // precision is exact by construction; recall must be high at cos>=0.8
    assert(bucketed.subsetOf(exact))
    val recall = bucketed.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${bucketed.size}/${exact.size})")
  }

  test("hot-bucket cap bounds LSH candidate volume on a template corpus") {
    // 200 byte-identical template docs: every band bucket they share has 200
    // members -> 200*199/2 candidate pairs PER BAND uncapped. The cap drops
    // those buckets wholesale; the genuine near-dup pair living in its own
    // small buckets must survive.
    val template = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val hot = (0L until 200L).map(i => (i, template))
    val a = (1000L, "unique alpha beta gamma delta epsilon zeta eta theta")
    val b = (1001L, "unique alpha beta gamma delta epsilon zeta eta iota")
    val docs = (hot :+ a :+ b).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 2).cache()

    val uncapped = Dedup.minhashBanded(sh, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size >= 200 * 199 / 2) // the quadratic blowup is real

    val capped = Dedup.minhashBanded(sh, 8, 2, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the uncapped pairs that avoid the hot buckets: candidate
    // volume is bounded by cap^2 per bucket, and real near-dups survive
    assert(capped == uncapped.filter { case (x, _) => x >= 1000L })
    assert(capped.contains((1000L, 1001L)))
  }

  test("embeddingNearDup hot-bucket cap drops degenerate SRP buckets") {
    val dims = 16
    // 100 identical vectors: identical SRP bits in every band
    val hot = (0L until 100L).map(i => (i, Array.fill(dims)(1.0)))
    val rnd = new scala.util.Random(3)
    val v = Array.fill(dims)(rnd.nextGaussian())
    val pair = Seq((2000L, v), (2001L, v.map(_ * 1.000001)))
    val emb = (hot ++ pair).toDF("vec_id", "embedding")

    val uncapped = Similarity.embeddingNearDup(emb, lit(true), 0.99,
      nProj = 8, rowsPerBand = 2, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size >= 100 * 99 / 2)

    val capped = Similarity.embeddingNearDup(emb, lit(true), 0.99,
      nProj = 8, rowsPerBand = 2, dims = dims, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped.filter { case (x, _) => x >= 2000L })
    assert(capped.contains((2000L, 2001L)))
  }

  /** Capture WARNs from the cap listener (async QueryExecutionListener ->
    * slf4j -> log4j2) while `body` runs: hook an appender onto the root
    * logger config, hand the captured list to the body, detach after.
    */
  private def withWarnCapture(body: java.util.List[String] => Unit): Unit = {
    val warns = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      s"capwarn-capture-${System.nanoTime()}", null, null, false,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        warns.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try body(warns)
    finally {
      rootCfg.removeAppender(appender.getName)
      ctx.updateLoggers()
      appender.stop()
    }
  }

  /** Poll the captured WARN list until the cap warning shows (the listener
    * fires asynchronously after the action completes).
    */
  private def awaitCapWarn(warns: java.util.List[String]): Boolean = {
    val deadline = System.currentTimeMillis() + 15000
    var fired = false
    while (!fired && System.currentTimeMillis() < deadline) {
      fired = warns.synchronized {
        warns.toArray.exists(w => w.toString.contains("lsh_bucket_cap") &&
          w.toString.contains("INVISIBLE"))
      }
      if (!fired) Thread.sleep(100)
    }
    fired
  }

  test("hot-bucket cap fire drill: driver WARN fires, exact-dedup-first recovers the cluster") {
    withWarnCapture { warns =>

      // a near-identical cluster LARGER than the cap: hot in EVERY band, so
      // LSH alone is blind to it — the documented trade-off
      val template = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
      val hot = (0L until 80L).map(i => (i, template))
      val a = (1000L, "unique alpha beta gamma delta epsilon zeta eta theta")
      val b = (1001L, "unique alpha beta gamma delta epsilon zeta eta iota")
      val docs = (hot :+ a :+ b).toDF("doc_id", "text")

      val lshOnly = Dedup.nearDuplicates(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 8, rowsPerBand = 2, threshold = 0.2,
        maxBucket = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the oversized cluster is invisible; the small genuine pair survives
      assert(!lshOnly.exists(_._1 < 80L))
      assert(lshOnly == Set((1000L, 1001L)))

      // the drop must be LOUD: the observed-metric listener raises a driver
      // WARN (asynchronously — poll the captured log)
      assert(awaitCapWarn(warns), s"no lsh_bucket_cap WARN captured; got: $warns")

      // documented mitigation: exact dedup FIRST collapses the
      // byte-identical cluster to one keeper, then LSH runs uncapped-clean
      val ex = Dedup.exact(docs, "doc_id", Seq(col("text"))).cache()
      val cluster = ex.filter(col("n_copies") === 80L).collect()
      assert(cluster.length == 1 && cluster(0).getAs[Long]("keeper_id") == 0L)
      val collapsed = docs.join(
        ex.select(col("keeper_id").as("doc_id")), Seq("doc_id"), "left_semi")
      val afterExact = Dedup.nearDuplicates(collapsed, "doc_id", "text",
        shingleSize = 2, numHashes = 8, rowsPerBand = 2, threshold = 0.2,
        maxBucket = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // nothing hot remains (no bucket above the cap -> no blind spot), and
      // every hot-cluster member is accounted for via its exact-dedup keeper
      assert(afterExact == Set((1000L, 1001L)))
      val recovered = (0L until 80L).map(i => (0L, i)).filter(p => p._1 != p._2)
      assert(ex.filter(col("n_copies") === 80L).count() == 1 &&
        recovered.size == 79) // cluster membership fully known from exact()
    }
  }

  test("simhashPairs hot-bucket cap fire drill: over-cap cluster drops with WARN, exact-dedup-first recovers") {
    withWarnCapture { warns =>
      // 80 byte-identical docs share ONE simhash, so every (band, bval)
      // bucket they land in has 80 members — over the cap in EVERY band,
      // the same blind spot as the minhash drill. The genuine pair (two
      // more identical docs with a different text) lives in its own size-2
      // buckets and must survive.
      val template = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
      val hot = (0L until 80L).map(i => (i, template))
      val other = "unique alpha beta gamma delta epsilon zeta eta theta"
      val docs = (hot :+ (1000L, other) :+ (1001L, other))
        .toDF("doc_id", "text")

      val capped = Dedup.simhashPairs(docs, "doc_id", "text",
        lit(true), maxHamming = 3, maxBucket = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the oversized cluster is invisible; the small genuine pair survives
      assert(capped == Set((1000L, 1001L)))

      assert(awaitCapWarn(warns), s"no lsh_bucket_cap WARN captured; got: $warns")

      // documented mitigation: exact dedup FIRST collapses the identical
      // cluster to its keeper, then the capped banding sees small buckets
      val ex = Dedup.exact(docs, "doc_id", Seq(col("text")))
      val collapsed = docs.join(
        ex.select(col("keeper_id").as("doc_id")), Seq("doc_id"), "left_semi")
      val afterExact = Dedup.simhashPairs(collapsed, "doc_id", "text",
        lit(true), maxHamming = 3, maxBucket = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue)).toSet
      // the two keepers (0 and 1000) have different texts; only the
      // genuine near-dup pair remains IF within radius — and since doc
      // 1001 collapsed into keeper 1000, membership is known from exact()
      assert(afterExact.forall(p => p._3 <= 3))
      assert(!afterExact.exists(p => p._1 >= 1L && p._1 < 80L))
    }
  }

  test("components: chains merge transitively, separate clusters stay apart") {
    // chain 1-2, 2-3, 3-4 -> all label 1; pair 10-11 -> label 10; 20-21 + 21-22
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (10L, 11L), (21L, 22L),
      (20L, 21L)).toDF("a", "b")
    val got = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("mergeComponents: directed cases — bridge, new-new, untouched pass-through") {
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b")
    val labels = Dedup.components(old)
    // one batch: a bridge merging clusters 1 and 10 via a NEW doc 100, a
    // pair of brand-new docs, and nothing touching cluster {20, 21}
    val batch = Seq((3L, 100L), (100L, 10L), (500L, 501L)).toDF("a", "b")
    val got = Dedup.mergeComponents(labels, batch).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      100L -> 1L, 500L -> 500L, 501L -> 500L, 20L -> 20L, 21L -> 20L))
  }

  test("mergeComponents == full components recompute on random pair splits") {
    val rnd = new scala.util.Random(23)
    (0 until 3).foreach { round =>
      // random sparse graph: ~90 edges over 120 nodes -> many multi-node
      // components, chains, and isolated pairs
      val pairs = (0 until 90).map { _ =>
        val x = rnd.nextInt(120).toLong
        val y = rnd.nextInt(120).toLong
        (math.min(x, y), math.max(x, y))
      }.filter(p => p._1 != p._2).distinct
      val (oldP, newP) = pairs.splitAt(pairs.length * 2 / 3)
      val full = Dedup.components(pairs.toDF("a", "b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val merged = Dedup.mergeComponents(
        Dedup.components(oldP.toDF("a", "b")), newP.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(merged == full, s"round $round: incremental != full recompute")
    }
  }

  test("embeddingNearDup: plants survive bucketing, precision is exact") {
    val rnd = new scala.util.Random(7)
    val dims = 16
    val base = (0L until 40L).map { i =>
      (i, Array.fill(dims)(rnd.nextGaussian()))
    }
    // plant near-identical copies of the query-side vectors (id % 10 == 0)
    val plants = base.filter(_._1 % 10 == 0).map { case (i, v) =>
      (i + 1000L, v.map(_ * 1.0000001))
    }
    val emb = (base ++ plants).toDF("vec_id", "embedding")

    val got = Similarity.embeddingNearDup(emb, col("vec_id") % 10 === 0,
      threshold = 0.95, nProj = 8, rowsPerBand = 2, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted copy found (identical direction -> identical SRP bits)
    val want = base.filter(_._1 % 10 == 0).map(p => (p._1, p._1 + 1000L)).toSet
    assert(want.subsetOf(got))

    // precision: all reported pairs really have cosine >= threshold
    val exact = Similarity.embeddingNearDupExact(emb, col("vec_id") % 10 === 0,
      threshold = 0.95).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
  }

  test("embeddingNearDup either-side membership: query doc with the LARGER id emits") {
    val rnd = new scala.util.Random(13)
    val dims = 16
    val v = Array.fill(dims)(rnd.nextGaussian())
    // NON-query doc 5 (smaller id) is a near-identical copy of QUERY doc
    // 900 (larger id): the one-sided rule tested only the smaller-id
    // member for query membership and silently dropped this pair
    val emb = (Seq((5L, v.map(_ * 1.0000001)), (900L, v)) ++
      (10L until 30L).map(i => (i, Array.fill(dims)(rnd.nextGaussian()))))
      .toDF("vec_id", "embedding")
    val pred = col("vec_id") >= 900L
    val got = Similarity.embeddingNearDup(emb, pred, threshold = 0.95,
      nProj = 8, rowsPerBand = 2, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((5L, 900L)))
    // the exact baseline shares the contract, and precision still holds
    val exact = Similarity.embeddingNearDupExact(emb, pred, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((5L, 900L)))
    assert(got.subsetOf(exact))
  }
}

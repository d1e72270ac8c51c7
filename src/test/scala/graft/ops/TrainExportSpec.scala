package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training export: deterministic sharding, context packing,
  * decontamination. */
class TrainExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = docs((0L until 100L).map { i =>
    (i, (0 until (3 + (i % 7).toInt)).map(j => s"w${(i * 31 + j * 7) % 23}")
      .mkString(" "))
  })

  test("assignShards: stable, in-range, and reproducible") {
    val a = TrainExport.assignShards(corpus, "doc_id", 8).collect()
    assert(a.forall(r => (0 until 8).contains(r.getAs[Int]("shard"))))
    val b = TrainExport.assignShards(corpus, "doc_id", 8).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    // every doc present exactly once — sharding is a partition, not a sample
    assert(a.map(_.getAs[Long]("doc_id")).toSet == (0L until 100L).toSet)
  }

  test("writeShards: re-export produces identical shard contents") {
    val p1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val p2 = java.nio.file.Files.createTempDirectory("shards2").toString
    TrainExport.writeShards(corpus, "doc_id", p1, 4)
    TrainExport.writeShards(corpus, "doc_id", p2, 4)
    val r1 = spark.read.parquet(p1).collect().map(_.toSeq).toSet
    val r2 = spark.read.parquet(p2).collect().map(_.toSeq).toSet
    assert(r1 == r2 && r1.size == 100)
    // shard dirs exist as partition directories
    val dirs = new java.io.File(p1).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length == 4)
  }

  test("packContexts: contexts are contiguous token-budget bins per shard") {
    val packed = TrainExport.packContexts(corpus, "doc_id", "text", 2, 20)
      .collect()
    assert(packed.map(_.getAs[Long]("doc_id")).toSet == (0L until 100L).toSet)
    packed.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(r =>
        (r.getAs[String]("sort_key"), r.getAs[Long]("doc_id")))
      var cum = 0L
      inOrder.foreach { r =>
        // ctx_id is the bin of the tokens PRECEDING this doc
        assert(r.getAs[Long]("ctx_id") == cum / 20)
        cum += r.getAs[Long]("tokens")
      }
      // ctx ids are a prefix 0..max with no gaps
      val ids = inOrder.map(_.getAs[Long]("ctx_id"))
      assert(ids.distinct.toSeq == (0L to ids.max).toSeq)
    }
  }

  test("sampleToMixture: binding group survives whole, shares approach targets") {
    import spark.implicits._
    // 300 a / 60 b / 40 c; targets 50/25/25 -> M = min(600, 240, 160) = 160
    val rows = ((0 until 300).map(i => (i.toLong, "a")) ++
      (300 until 360).map(i => (i.toLong, "b")) ++
      (360 until 400).map(i => (i.toLong, "c")) ++
      (400 until 410).map(i => (i.toLong, "junk"))).toDF("doc_id", "grp")
    val kept = TrainExport.sampleToMixture(rows, "doc_id", "grp",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .select("doc_id", "grp").as[(Long, String)].collect()
    val byGrp = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // c is binding: keep fraction 1.0 -> ALL 40 rows survive exactly
    assert(byGrp("c") == 40)
    // non-target group dropped entirely
    assert(!byGrp.contains("junk"))
    // hash sampling: expected 80 a (of 300) and 40 b (of 60) — allow
    // binomial slack (4+ sigma), the determinism spec is the re-run below
    assert(byGrp("a") > 50 && byGrp("a") < 110)
    assert(byGrp("b") > 25 && byGrp("b") < 55)
    // deterministic: identical output on a re-run
    val again = TrainExport.sampleToMixture(rows, "doc_id", "grp",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .select("doc_id", "grp").as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("sampleTemperature: alpha=1 is the identity, smallest group binds") {
    import spark.implicits._
    // 3200 a / 200 b: q ∝ sqrt(n) at alpha=0.5 -> shares 4:1 instead of
    // the natural 16:1; M = z·sqrt(200), so b keeps everything and a
    // thins to 4× b's count in expectation (800 of 3200)
    val rows = ((0 until 3200).map(i => (i.toLong, "a")) ++
      (3200 until 3400).map(i => (i.toLong, "b"))).toDF("doc_id", "grp")
    val all = TrainExport.sampleTemperature(rows, "doc_id", "grp", 1.0)
      .count()
    assert(all == 3400, "alpha=1 must keep every row")
    val kept = TrainExport.sampleTemperature(rows, "doc_id", "grp", 0.5)
      .select("doc_id", "grp").as[(Long, String)].collect()
    val byGrp = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGrp("b") == 200, "smallest group is kept in full")
    // expected 800 of 3200; allow 4+ sigma binomial slack (~±100)
    assert(byGrp("a") > 650 && byGrp("a") < 950, s"got ${byGrp("a")}")
    // deterministic: identical row set on a re-run
    val again = TrainExport.sampleTemperature(rows, "doc_id", "grp", 0.5)
      .select("doc_id", "grp").as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("splitByComponent: whole near-dup components land on one side") {
    import spark.implicits._
    // chain 1-2-3 is one component; 10-11 another; the rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val split = TrainExport.splitByComponent(corpus, "doc_id", pairs, 0.25)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster"), r.getAs[String]("split"))).toMap
    // every input row present, components share cluster AND side
    assert(split.size == 100)
    assert(Seq(1L, 2L, 3L).map(split(_)).distinct.size == 1)
    assert(Seq(10L, 11L).map(split(_)).distinct.size == 1)
    assert(split(1L)._1 == 1L && split(10L)._1 == 10L)
    // singletons cluster to themselves
    assert(split(50L)._1 == 50L)
    // both sides non-empty at evalFrac 0.25 over ~97 clusters, and the
    // pick is deterministic across runs
    val sides = split.values.map(_._2).toSet
    assert(sides == Set("train", "eval"))
    val again = TrainExport.splitByComponent(corpus, "doc_id", pairs, 0.25)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    assert(again == split.map { case (k, v) => k -> v._2 })
  }

  test("bm25: hand-computed scores on a tiny corpus, top-k order, absent terms score 0") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "spark spark hash join"),   // tf(spark)=2, tf(hash)=1, dl=4
      (1L, "hash table lookup here"),  // tf(hash)=1, dl=4
      (2L, "nothing relevant at all"), // no query terms
      (3L, "spark hash hash hash spark join extra pad")) // dl=8
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25(tiny, "doc_id", "text",
      Seq("spark", "hash"), k1 = 1.2, b = 0.75, topK = 10)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("score"), r.getAs[Long]("n_matched"))).toMap
    // doc 2 has no matching term: absent entirely (absent terms score 0)
    assert(!got.contains(2L))
    assert(got(0L)._2 == 2 && got(1L)._2 == 1 && got(3L)._2 == 2)
    // hand replay (Lucene idf, N=4, avgdl=5)
    val n = 4.0; val avgdl = (4 + 4 + 4 + 8) / 4.0
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val want0 = term(2, 4, 2) + term(1, 4, 3)
    val want1 = term(1, 4, 3)
    val want3 = term(2, 8, 2) + term(3, 8, 3)
    assert(math.abs(got(0L)._1 - want0) < 1e-9)
    assert(math.abs(got(1L)._1 - want1) < 1e-9)
    assert(math.abs(got(3L)._1 - want3) < 1e-9)
  }

  test("decontaminate flags planted overlap and only that") {
    val eval = (0L, "alpha beta gamma delta epsilon zeta")
    val copier = (1L, "intro words alpha beta gamma delta epsilon outro")
    val partial = (2L, "alpha beta gamma unrelated tail here")   // 1 shared gram
    val clean = (3L, "completely different content with no overlap at all")
    val df = docs(Seq(eval, copier, partial, clean))
    val flagged = Curate.decontaminate(df, "doc_id", "text",
      col("doc_id") === 0, shingleSize = 3, minShared = 3)
    val byId = flagged.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("n_shared")).toMap
    assert(byId.keySet == Set(1L))
    assert(byId(1L) == 3) // alpha-beta-gamma, beta-gamma-delta, gamma-delta-epsilon
    val kept = Curate.removeContaminated(df, "doc_id", flagged)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 3L))

    // attribution names the leaked-from eval doc, pairwise
    val who = Curate.decontaminateAttribution(df, "doc_id", "text",
      col("doc_id") === 0, shingleSize = 3, minShared = 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("eval_id"),
        r.getAs[Long]("n_shared"))).toSet
    assert(who == Set((1L, 0L, 3L)))
    // at minShared 1, the partial overlap attributes too — to eval 0 only
    val whoLoose = Curate.decontaminateAttribution(df, "doc_id", "text",
      col("doc_id") === 0, shingleSize = 3, minShared = 1)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("eval_id"))).toSet
    assert(whoLoose == Set((1L, 0L), (2L, 0L)))
  }

  test("decontaminateBloom == decontaminate (sketch is execution-only)") {
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_shared")).toSet
    for (minShared <- Seq(1, 2, 3)) {
      val exact = rows(Curate.decontaminate(corpus, "doc_id", "text",
        col("doc_id") % 10 === 0, shingleSize = 2, minShared = minShared))
      val bloom = rows(Curate.decontaminateBloom(corpus, "doc_id", "text",
        col("doc_id") % 10 === 0, shingleSize = 2, minShared = minShared))
      assert(bloom == exact, s"minShared=$minShared")
      assert(exact.nonEmpty, s"vacuous fixture at minShared=$minShared")
    }
    // a sloppy sketch (fpp near 1 admits almost everything) still cannot
    // change the output: false positives die in the exact-verify join
    val loose = rows(Curate.decontaminateBloom(corpus, "doc_id", "text",
      col("doc_id") % 10 === 0, shingleSize = 2, minShared = 1, fpp = 0.5))
    val exact1 = rows(Curate.decontaminate(corpus, "doc_id", "text",
      col("doc_id") % 10 === 0, shingleSize = 2, minShared = 1))
    assert(loose == exact1)
  }

  test("decontaminateBloom: planted overlap, flags and counts match exact") {
    val df = docs(Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "intro words alpha beta gamma delta epsilon outro"),
      (2L, "alpha beta gamma unrelated tail here"),
      (3L, "completely different content with no overlap at all")))
    val flagged = Curate.decontaminateBloom(df, "doc_id", "text",
      col("doc_id") === 0, shingleSize = 3, minShared = 3)
    val byId = flagged.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("n_shared")).toMap
    assert(byId == Map(1L -> 3L))
  }

  /** Driver-side replay of the A-ES key: ln((md5int60 + 0.5)/2^60)/w. */
  private def aesKey(seed: String, id: Long, w: Double): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(digest.take(15), 16)
    math.log((v + 0.5) / math.pow(2, 60)) / w
  }

  test("weightedSample: matches the driver-side A-ES selection exactly") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, (i % 13 + 1).toDouble))
      .toDF("doc_id", "w")
    val got = TrainExport.weightedSample(df, "doc_id", col("w"), 25, "7")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = (0L until 200L)
      .map(i => i -> aesKey("7", i, (i % 13 + 1).toDouble))
      .sortBy { case (id, k) => (-k, id) }.take(25).map(_._1).toSet
    assert(got == want)
    assert(got.size == 25)
  }

  test("weightedSample: overwhelming weight is always drawn; w<=0 never") {
    import spark.implicits._
    val df = ((0L until 50L).map(i => (i, 1.0)) ++
      Seq((99L, 1e12), (100L, 0.0), (101L, -3.0))).toDF("doc_id", "w")
    for (seed <- Seq("a", "b", "c")) {
      val ids = TrainExport.weightedSample(df, "doc_id", col("w"), 10, seed)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(99L), s"seed $seed missed the 1e12-weight row")
      assert(!ids.contains(100L) && !ids.contains(101L))
      assert(ids.size == 10)
    }
  }

  test("weightedSamplePerGroup: k per group, each matching the global rule") {
    import spark.implicits._
    val df = (0L until 120L).map(i => (i, (i % 5 + 1).toDouble,
      s"g${i % 3}")).toDF("doc_id", "w", "grp")
    val got = TrainExport.weightedSamplePerGroup(
      df, "doc_id", col("w"), 7, "s", "grp")
      .select("grp", "doc_id").collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        g -> rs.map(_.getLong(1)).toSet
      }
    assert(got.keySet == Set("g0", "g1", "g2"))
    for ((g, ids) <- got) {
      val want = (0L until 120L).filter(i => s"g${i % 3}" == g)
        .map(i => i -> aesKey("s", i, (i % 5 + 1).toDouble))
        .sortBy { case (id, k) => (-k, id) }.take(7).map(_._1).toSet
      assert(ids == want, s"group $g")
    }
  }

  test("curriculumOrder: phases partition by score quantile, pos contiguous") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, (i * 37 % 101).toDouble))
      .toDF("doc_id", "score")
    val out = TrainExport.curriculumOrder(df, "doc_id", col("score"),
      phases = 4, nShards = 3)
      .select("doc_id", "score", "phase", "shard", "pos").collect()
    assert(out.length == 200)
    // every score in phase p is <= every score in phase p+1 (quantile
    // partition), and phase sizes are near-balanced
    val byPhase = out.groupBy(_.getAs[Int]("phase"))
    assert(byPhase.keySet == Set(0, 1, 2, 3))
    val maxOf = byPhase.map { case (p, rs) =>
      p -> rs.map(_.getAs[Double]("score")).max }
    val minOf = byPhase.map { case (p, rs) =>
      p -> rs.map(_.getAs[Double]("score")).min }
    for (p <- 0 to 2) assert(maxOf(p) <= minOf(p + 1))
    for (p <- 0 to 3) assert(byPhase(p).length >= 30)
    // pos is 1..k contiguous within each (phase, shard)
    out.groupBy(r => (r.getAs[Int]("phase"), r.getAs[Int]("shard")))
      .foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Long]("pos")).sorted
          .sameElements(1L to rs.length))
      }
    // deterministic across runs
    val again = TrainExport.curriculumOrder(df, "doc_id", col("score"),
      phases = 4, nShards = 3)
      .select("doc_id", "phase", "shard", "pos").collect().map(_.toSeq).toSet
    assert(again ==
      out.map(r => Seq(r.get(0), r.get(2), r.get(3), r.get(4))).toSet)
  }

  test("weightedSample: heavier items are drawn more often across seeds") {
    import spark.implicits._
    // 50 light (w=1) + 50 heavy (w=9) docs, draw 20 over 10 seeds: heavy
    // expectation ~18/draw vs light ~2 — a wide margin, so assert > 3x
    val df = (0L until 100L).map(i =>
      (i, if (i >= 50) 9.0 else 1.0)).toDF("doc_id", "w")
    var heavy = 0
    var light = 0
    for (seed <- (0 until 10).map(_.toString)) {
      val ids = TrainExport.weightedSample(df, "doc_id", col("w"), 20, seed)
        .select("doc_id").collect().map(_.getLong(0))
      heavy += ids.count(_ >= 50L)
      light += ids.count(_ < 50L)
    }
    assert(heavy + light == 200)
    assert(heavy > 3 * light, s"heavy=$heavy light=$light")
  }
}

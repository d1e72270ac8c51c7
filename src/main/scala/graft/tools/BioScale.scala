package graft.tools

import org.apache.spark.sql.{functions => F}

import graft.bio.{Fasta, PetaSearch}

/** Dev tool: the FLAGSHIP bio search's scale leg — `searchPartitioned`
  * (one job across a `dbId`-partitioned corpus, the shape recommended
  * for 1000 executors) on a MakeScale-style replicated FASTA corpus.
  *
  * Construction keeps the OUTPUT invariant per DB: every replica DB
  * holds the same sequences under the same per-DB seqIds, so the per-DB
  * result sets must be identical to the ×1 run (per-DB unique-k-mer
  * dedup and per-DB e-value residue counts — the tool ASSERTS both),
  * and total output scales exactly ×R. Wall-clock should then show the
  * ~linear index-build term: index build, prefilter join, and align all
  * key on dbId, so ×R is R× the work at the same parallelism.
  *
  * Usage: runMain graft.tools.BioScale [replicas] (default 10)
  */
object BioScale {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(10)
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = DevSession.local()
    import spark.implicits._

    // the bundled Cas7-11 fixture, degapped (the bio_selfsearch corpus)
    val tmp = java.io.File.createTempFile("cas711", ".fa")
    tmp.deleteOnExit()
    val in = getClass.getResourceAsStream("/MSA_Cas7-11_multiline.fa")
    val degapped = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(l => if (l.startsWith(">")) l
      else l.replace("-", "").replace(".", ""))
      .mkString("\n")
    java.nio.file.Files.writeString(tmp.toPath, degapped)
    val queries = Fasta.read(spark, tmp.getAbsolutePath).localCheckpoint()

    def corpus(replicas: Int) = {
      val ids = spark.range(replicas).select(F.col("id").as("dbId"))
      // every sequence in every DB under the same per-DB seqIds — the
      // output-invariant construction (a 21-seq × R frame; the cross
      // join is the corpus DEFINITION here, not a query plan)
      queries.crossJoin(ids)
        .select(F.col("dbId"), F.col("seqId"), F.col("seq"),
          F.col("seqLen"))
        .localCheckpoint()
    }

    def run(replicas: Int): (Double, Long, Map[Long, Long]) = {
      val targets = corpus(replicas)
      val times = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        PetaSearch.searchPartitioned(spark, queries, targets).count()
        (System.nanoTime() - t0) / 1e9
      }
      val res = PetaSearch.searchPartitioned(spark, queries, targets)
      val perDb = res.groupBy("dbId").count().collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      (times.min, res.count(), perDb)
    }

    val (t1, n1, per1) = run(1)
    val (tr, nr, perR) = run(r)
    // output invariance: every replica DB reproduces the ×1 result count
    require(perR.values.toSet == Set(per1(0L)),
      s"per-DB counts diverged: base=${per1(0L)} got=$perR")
    require(nr == n1 * r, s"total rows: want ${n1 * r}, got $nr")
    println(f"[bioscale] searchPartitioned x1: $t1%.2f s ($n1 rows); " +
      f"x$r: $tr%.2f s ($nr rows); ratio ${tr / t1}%.2f")
  }
}

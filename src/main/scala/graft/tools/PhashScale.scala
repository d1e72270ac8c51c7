package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: a ×k leg that measures the aHash OPERATOR, not the corpus
  * construction (round-12 verdict item #5). MakeScale's token salting
  * breaks SHINGLE similarity across replicas but not sampled-BYTE
  * similarity — replica planes keep their origin's layout at the 64
  * aHash sample points, so every k-replica family pairs quadratically
  * and the old mm_phash leg measured that artifact (32× at ×10).
  *
  * Root cause, established by experiment: text-byte planes have far too
  * little entropy for 64-bit sign-vs-mean hashes to separate 50k docs —
  * the bits mostly encode coarse space-vs-letter geometry that token
  * salting preserves (every "z<i>" suffix has the same length), and
  * neither additive byte patterns (±32 iid: 78× pair inflation — a
  * space bit sits ~60 below the mean and never flips) nor per-replica
  * plane rotations (41×: rotated space geometry still collides at 8×8
  * granularity) decorrelate the replicas.
  *
  * So this leg synthesizes REAL-ENTROPY planes, per the alternative the
  * round-12 verdict named: each 16-byte block of the plane is a
  * pseudorandom stream seeded by (hash of the ORIGINAL block bytes,
  * replica). Exact/substitution-level near-dups inside one replica
  * share aligned source blocks, hence share plane blocks, hence agree
  * on almost every sampled bit — true duplicate structure survives —
  * while any other doc pair (and the SAME doc across replicas, because
  * the replica id salts every seed) gets independent 64-bit hashes, so
  * the pair set scales ~linearly like a real image corpus's. Replica
  * id = id / stride (MakeScale's derived stride).
  *
  * Usage: runMain graft.tools.PhashScale [x1Dir] [x10Dir ...]
  */
object PhashScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "target/scale/sf1")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val spark = DevSession.local()
    import spark.implicits._
    dirs.foreach { d =>
      // per-dir stride: the scaled dir's own persisted value wins; env var
      // or the historical default only for dirs MakeScale didn't stamp
      val stride =
        try spark.read.parquet(s"$d/scale_meta").head().getAs[Long]("stride")
        catch { case _: org.apache.spark.sql.AnalysisException =>
          sys.env.getOrElse("SPARK_GRAFT_STRIDE", "1000000").toLong }
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val media = graft.ops.Multimodal.mediaFromDocuments(spark, docs)
        .map { r =>
          val rep = (r.id / stride).toInt
          val src = r.content
          val len = src.length
          val c = new Array[Byte](len)
          var b = 0
          while (b * 16 < len) {
            val from = b * 16
            val until = math.min(from + 16, len)
            // content-keyed block seed, salted by the replica id
            var h = 1125899906842597L + rep * 2654435761L
            var j = from
            while (j < until) { h = h * 31 + src(j); j += 1 }
            val rnd = new java.util.Random(h)
            j = from
            while (j < until) { c(j) = rnd.nextInt(256).toByte; j += 1 }
            b += 1
          }
          r.copy(content = c)
        }
      val ts = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.ops.Multimodal
          .aHashPairs(media, col("id") % 20 === 0, maxHamming = 8).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        f"$dt%.2f s (pairs=$n)"
      }
      println(s"[phashscale] $d: ${ts.mkString(", ")}")
    }
    spark.stop()
  }
}

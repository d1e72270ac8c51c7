package graft.bio

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** searchPartitioned (single job, dbId column) must equal searchMany (loop
  * of independent jobs) on the same DB split.
  */
class PartitionedSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dbId-partitioned search == per-DB loop search") {
    val fixture = getClass.getResource("/MSA_Cas7-11_multiline.fa").getPath
    val degapped = {
      val src = scala.io.Source.fromFile(fixture)
      val out = try src.getLines().map(l =>
        if (l.startsWith(">")) l else l.replace("-", "")).mkString("\n")
      finally src.close()
      val f = java.io.File.createTempFile("part_src", ".fa")
      f.deleteOnExit()
      java.nio.file.Files.writeString(f.toPath, out)
      f.getAbsolutePath
    }
    val all = Fasta.read(spark, degapped).cache()
    val queries = all
    // split into 2 DBs with per-DB dense seqIds
    val db0 = all.filter($"seqId" < 10)
    val db1 = all.filter($"seqId" >= 10)
      .withColumn("seqId", $"seqId" - 10)
    val looped = PetaSearch.searchMany(spark, queries, Seq(db0, db1))
      .select("queryId", "targetId", "bits", "eval")
      .as[(Long, Long, Int, Double)].collect()
    val partitioned = PetaSearch.searchPartitioned(spark, queries,
      db0.withColumn("dbId", lit(0L)).unionByName(db1.withColumn("dbId", lit(1L))))
      .select("dbId", "queryId", "targetId", "bits", "eval")
      .as[(Long, Long, Long, Int, Double)].collect()
    // compare as multisets of (dbId-resolved) rows: looped targets are
    // per-DB ids in order db0 then db1 — same key space as partitioned
    val loopedSet = looped.groupBy(identity).view.mapValues(_.length).toMap
    val partSet = partitioned.map { case (db, q, t, b, e) => (q, t, b, e) -> db }
    // row multiplicity: a (q,t,bits,eval) may appear once per DB
    val partCounts = partSet.map(_._1).groupBy(identity).view.mapValues(_.length).toMap
    assert(partCounts == loopedSet,
      s"mismatch: only-looped=${loopedSet.keySet -- partCounts.keySet}, " +
        s"only-part=${partCounts.keySet -- loopedSet.keySet}")
    assert(partitioned.nonEmpty)
  }
}

package graft.bio

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** The bio pipeline's relational skeleton exercised on the driver's generic
  * corpus (documents.text over a lowercase-letter alphabet instead of amino
  * acids — same operators: F1 extract, C2 encode, A1 argmax dedup, J1 join,
  * A2 count gate), each with an independent DuckDB formulation as oracle.
  * Plus the flagship protein self-search as a rows-only check.
  */
object BioQueries {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"
  private val K = 9

  /** Whitespace is stripped before windowing (documents are word streams;
    * un-stripped, every 9-window crosses a space and the index is empty).
    */
  private def docsAsSeqs(s: org.apache.spark.sql.SparkSession, d: String) =
    T.documents(s, d).select(
      col("doc_id").as("seqId"),
      regexp_replace(col("text"), "\\s+", "").as("seq"))
      .withColumn("seqLen", length(col("seq")).cast("int"))

  /** SQL fragment computing (doc_id, n_chars, pos, kmer) over letter-only
    * 9-windows — the DuckDB mirror of explodeKmers + KmerEncode.
    */
  private val duckKmersCte = s"""
    ds AS (
      SELECT doc_id, regexp_replace(text, '\\s+', '', 'g') AS text,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS n_chars
      FROM documents),
    kmi AS (
      SELECT doc_id, n_chars, text,
             unnest(generate_series(1, n_chars - ${K - 1})) AS i
      FROM ds WHERE n_chars >= $K
    ),
    km AS (
      SELECT doc_id, n_chars, i - 1 AS pos, substr(text, CAST(i AS INT), $K) AS s
      FROM kmi
    ),
    enc AS (
      SELECT doc_id, n_chars, pos,
             CAST(SUM((strpos('$Alpha', substr(s, CAST(j.j AS INT), 1)) - 1)
                  * POWER(26, j.j - 1)) AS BIGINT) AS kmer,
             MIN(strpos('$Alpha', substr(s, CAST(j.j AS INT), 1))) AS minp
      FROM km, generate_series(1, $K) AS j(j)
      GROUP BY doc_id, n_chars, pos, s
    ),
    valid AS (SELECT doc_id, n_chars, pos, kmer FROM enc WHERE minp > 0)"""

  /** F1+C2+A1: unique-k-mer index with argmax representative (longest doc,
    * ties -> smallest id) and the representative's first occurrence position.
    */
  val bioKmerIndex = Q(
    "bio_kmer_index",
    (s, d) => {
      KmerIndex.buildWithPos(docsAsSeqs(s, d), K, Alpha)
        .select(col("kmer"), col("seqId").as("doc_id"), col("tpos"))
        .orderBy(col("kmer"))
    },
    Some(s"""
      WITH $duckKmersCte,
      perdoc AS (
        SELECT kmer, doc_id, n_chars, CAST(MIN(pos) AS INT) AS tpos
        FROM valid GROUP BY 1, 2, 3),
      ranked AS (
        SELECT kmer, doc_id, tpos,
               ROW_NUMBER() OVER (PARTITION BY kmer
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM perdoc)
      SELECT kmer, doc_id, tpos FROM ranked WHERE rn = 1 ORDER BY kmer"""))

  /** J1+A2: query docs (doc_id % 20 = 0) against the index, count-gated
    * (strict > 2, the reference's requiredKmerMatches).
    */
  val bioPrefilter = Q(
    "bio_prefilter",
    (s, d) => {
      val seqs = docsAsSeqs(s, d)
      val index = KmerIndex.buildWithPos(seqs, K, Alpha)
      val qk = Prefilter.queryKmers(seqs.filter(col("seqId") % 20 === 0), K, Alpha)
      qk.join(index.select(col("kmer"), col("seqId").as("target_id")), Seq("kmer"))
        .groupBy(col("queryId").as("query_id"), col("target_id"))
        .agg(count(lit(1)).as("n_matches"))
        .filter(col("n_matches") > Prefilter.RequiredKmerMatches)
        .orderBy(col("query_id"), col("target_id"))
    },
    Some(s"""
      WITH $duckKmersCte,
      perdoc AS (
        SELECT kmer, doc_id, n_chars FROM valid GROUP BY 1, 2, 3),
      idx AS (
        SELECT kmer, doc_id AS target_id FROM (
          SELECT kmer, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY kmer
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM perdoc) WHERE rn = 1)
      SELECT v.doc_id AS query_id, i.target_id,
             CAST(COUNT(*) AS BIGINT) AS n_matches
      FROM valid v JOIN idx i USING (kmer)
      WHERE v.doc_id % 20 = 0
      GROUP BY 1, 2 HAVING COUNT(*) > 2
      ORDER BY 1, 2"""))

  /** Flagship: full protein self-search (ingest -> index -> prefilter ->
    * align -> m8) on the bundled Cas7-11 fixture. Not SQL-expressible =>
    * rows-only check; correctness is covered by PetaSearchSpec's golden
    * invariants.
    */
  val bioSelfSearch = Q(
    "bio_selfsearch_m8",
    (s, _) => {
      val tmp = java.io.File.createTempFile("cas711", ".fa")
      tmp.deleteOnExit()
      val in = getClass.getResourceAsStream("/MSA_Cas7-11_multiline.fa")
      val degapped = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(l => if (l.startsWith(">")) l else l.replace("-", "").replace(".", ""))
        .mkString("\n")
      java.nio.file.Files.writeString(tmp.toPath, degapped)
      PetaSearch.easySearch(s, tmp.getAbsolutePath, tmp.getAbsolutePath)
    },
    None,
    bench = false) // fixed-size fixture — doesn't scale with sf, skews BENCH

  /** F4 profile search: one PSSM profile built from the bundled Cas7-11 MSA
    * (all 21 aligned rows), searched against the degapped member sequences —
    * consensus k-mers seed the prefilter, the gapped aligner scores targets
    * against the per-position profile columns. Not SQL-expressible =>
    * rows-only; scoring correctness is covered by ProfilesSpec.
    */
  val bioProfileSearch = Q(
    "bio_profile_search",
    (s, _) => {
      import s.implicits._
      val in = getClass.getResourceAsStream("/MSA_Cas7-11_multiline.fa")
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      // records: header line, then wrapped sequence lines
      val msa = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      lines.foreach { l =>
        if (l.startsWith(">")) {
          if (cur.nonEmpty) { msa += cur.toString; cur.clear() }
        } else cur ++= l.trim
      }
      if (cur.nonEmpty) msa += cur.toString
      val prof = Profiles.fromAlignedSeqs(msa.toSeq)
      val profiles = Seq((0L, "cas711_profile", prof))
        .toDF("seqId", "header", "profile")
      val targets = msa.zipWithIndex.map { case (row, i) =>
        val seq = row.replace("-", "").replace(".", "").toUpperCase
        (i.toLong, s"member$i", s"member$i", seq, seq.length)
      }.toSeq.toDF("seqId", "header", "name", "seq", "seqLen")
      PetaSearch.searchProfiles(s, profiles, targets)
        .select(col("queryId"), col("targetId"), col("bits"),
          round(col("fident"), 3).as("fident"))
        .orderBy(col("targetId"))
    },
    None,
    bench = false) // fixed-size fixture, like bio_selfsearch_m8

  def all: Seq[Q] = Seq(bioKmerIndex, bioPrefilter, bioSelfSearch,
    bioProfileSearch)
}

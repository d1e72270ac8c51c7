package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer-training primitives (Sennrich et al. 2016).
  *
  * The operation a training-data pipeline runs once per corpus snapshot to
  * size/fit a subword vocabulary. The scale shape is the whole point:
  *
  *   - The ONLY corpus-scale work is the unique-word frequency count — one
  *     explode + one hash aggregation with map-side partial combine. At
  *     100 TB that shuffle moves (word, partial-count) pairs, not tokens.
  *   - Everything after — symbol splitting, pair counting, every merge
  *     iteration — runs over the UNIQUE-WORD table (vocab-sized: millions
  *     of rows, not trillions), because pair frequencies are word
  *     frequencies times within-word pair multiplicity. This mirrors how
  *     every real BPE trainer (subword-nmt, SentencePiece) operates on the
  *     word-count dictionary, re-expressed relationally.
  *   - Each merge iteration collects exactly ONE row (the argmax pair) —
  *     a bounded scalar read, same pattern as the kmeans centroid step.
  *
  * Words carry a terminal `</w>` symbol so merges can't cross word
  * boundaries and end-of-word units stay distinct (the paper's setup).
  */
object Bpe {

  val EndMarker = "</w>"

  /** Unique words with frequencies: the one corpus-scale aggregation. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("wf"))

  /** Initial symbol table: one row per unique word, its character-split
    * symbol sequence (plus the end marker) and its corpus frequency.
    * Explicit substring transform — not split(word, "") — so regex
    * trailing-empty edge cases can't differ across engines.
    */
  def initVocab(df: DataFrame, textCol: String): DataFrame = {
    wordCounts(df, textCol).select(
      col("word"), col("wf"),
      concat(
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        array(lit(EndMarker))).as("syms"))
  }

  /** Adjacent-pair frequencies over a symbol table (syms, wf):
    * sum of word frequencies per (lhs, rhs) adjacent symbol pair.
    * Vocab-sized input; the zip_with avoids an index explode.
    */
  def pairsOf(vocab: DataFrame): DataFrame = {
    val n = greatest(size(col("syms")) - 1, lit(0))
    vocab
      .select(col("wf"),
        explode(zip_with(
          slice(col("syms"), lit(1), n),
          slice(col("syms"), lit(2), n),
          (l, r) => struct(l.as("lhs"), r.as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("wf")).as("cnt"))
  }

  /** One-pass pair statistics straight from documents — the "what would
    * the first merges be" corpus report. Deterministic total order.
    */
  def pairCounts(df: DataFrame, textCol: String, topK: Int = 50): DataFrame =
    pairsOf(initVocab(df, textCol))
      .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
      .limit(topK)

  /** Apply one merge (lhs, rhs) -> lhs+rhs to every symbol sequence,
    * greedy left-to-right non-overlapping (the BPE contract). A fold over
    * the symbol array: merge when the accumulated tail is `lhs` and the
    * next symbol is `rhs`. A just-merged token can never re-match `lhs`
    * within the pass (lhs+rhs == lhs would need an empty rhs).
    * Interpreted HOF, but it runs over the vocab-sized table only.
    */
  private def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    aggregate(
      syms,
      typedlit(Array.empty[String]),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(lhs) && x === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(x))))

  /** Segment one word with a trained merge list: start from characters
    * (+ end marker) and apply each merge in rank order, greedy
    * left-to-right non-overlapping — subword-nmt's apply semantics, and
    * exactly the end state train() leaves a corpus word in. Works on OOV
    * words too (merges that don't occur are no-ops).
    */
  def segmentWord(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = (word.map(_.toString) :+ EndMarker).toVector
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Tokenize the corpus with a trained merge list:
    * (id, subwords, n_subwords) per document.
    *
    * Scale shape: ONE corpus pass, ZERO shuffle — a mapPartitions whose
    * per-partition word->segmentation memo recovers most of the
    * unique-word dedup a join-based apply would buy, without the explode
    * + re-assembly-by-position shuffle that plan needs. The merge list
    * rides the closure (tokenizer-sized, i.e. small). mapPartitions is
    * justified here the same way the SW kernel is: an iterative
    * per-element algorithm Catalyst can't express.
    */
  def applyBpe(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, text) =>
          val subs = text.split("\\s+").iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, segmentWord(w, merges)))
            .toSeq
          (id, subs, subs.length.toLong)
        }
      }
      .toDF(idCol, "subwords", "n_subwords")
  }

  /** Train nMerges BPE merges; returns the ordered merge table
    * (merge_rank, lhs, rhs, cnt). Stops early when no pair remains or the
    * best pair drops below minCount. Each iteration: one vocab-sized
    * aggregation, one 1-row collect, one vocab-sized map, then a
    * localCheckpoint so lineage doesn't grow with the merge count.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 1L): DataFrame = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val spark = df.sparkSession
    var vocab = initVocab(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val top = pairsOf(vocab)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank + 1, l, r, c))
        val next = vocab.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
        vocab.unpersist()
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "cnt")
      .orderBy(col("merge_rank"))
  }

  /** DuckDB CTE chain replaying `train`'s state: `v0` is the char-split
    * unique-word table; each round r derives pair counts `pc{r}`, the
    * argmax pair `b{r}` (cnt desc, lhs, rhs — binary string order, same
    * both engines on UTF-8), and the merged vocab `v{r}`.
    *
    * The merge application uses the RELATIONAL form of greedy
    * left-to-right non-overlapping matching: mark candidate positions
    * (sym=lhs ∧ next=rhs), then within each maximal run of CONSECUTIVE
    * candidate indices keep the even offsets. Runs longer than 1 exist
    * only when lhs=rhs (a candidate at i and i+1 forces s[i+1]=lhs=rhs),
    * and greedy consumes exactly the even offsets of such a run — so this
    * equals `applyMerge`'s left fold on every input (BpeTrainSpec pins it
    * property-style).
    */
  private def duckRound(r: Int): String = {
    val prev = s"v${r - 1}"
    s"""s$r AS (
        SELECT word, wf, i, syms[i] AS sym
        FROM (SELECT word, wf, syms,
                     unnest(generate_series(1, len(syms))) AS i FROM $prev)),
      pc$r AS (
        SELECT lhs, rhs, CAST(SUM(wf) AS BIGINT) AS cnt FROM (
          SELECT wf, sym AS lhs,
                 LEAD(sym) OVER (PARTITION BY word ORDER BY i) AS rhs
          FROM s$r)
        WHERE rhs IS NOT NULL GROUP BY 1, 2),
      b$r AS (SELECT lhs, rhs, cnt FROM pc$r
              ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      c$r AS (
        SELECT s.word, s.wf, s.i, s.sym, b.lhs AS blhs, b.rhs AS brhs,
               COALESCE(s.sym = b.lhs AND
                 LEAD(s.sym) OVER (PARTITION BY s.word ORDER BY s.i) = b.rhs,
                 FALSE) AS cand
        FROM s$r s CROSS JOIN b$r b),
      k$r AS (
        SELECT word, wf, i, sym, brhs,
               cand AND ((i - MIN(i) OVER (PARTITION BY word, grp)) % 2 = 0)
                 AS keep
        FROM (SELECT *,
                CASE WHEN cand THEN i - ROW_NUMBER()
                  OVER (PARTITION BY word, cand ORDER BY i) END AS grp
              FROM c$r)),
      v$r AS (
        SELECT word, wf, list(tok ORDER BY i) AS syms FROM (
          SELECT word, wf, i,
                 CASE WHEN keep THEN sym || brhs ELSE sym END AS tok,
                 LAG(keep, 1, FALSE) OVER (PARTITION BY word ORDER BY i)
                   AS drop_me
          FROM k$r)
        WHERE NOT drop_me GROUP BY word, wf)"""
  }

  private def duckV0: String =
    """v0 AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wf,
               list_transform(generate_series(1, length(word)),
                 i -> substring(word, i, 1)) || ['</w>'] AS syms
        FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+'))
                AS word FROM documents)
        WHERE length(word) > 0 GROUP BY 1"""

  /** Full `train(nMerges)` oracle: the ordered merge table. */
  def duckTrainSql(nMerges: Int): String = {
    require(nMerges >= 1)
    val rounds = (1 to nMerges).map(duckRound).mkString(",\n      ")
    val out = (1 to nMerges)
      .map(r => s"SELECT $r AS merge_rank, lhs, rhs, cnt FROM b$r")
      .mkString("\n      UNION ALL ")
    s"""WITH $duckV0),
      $rounds
      SELECT CAST(merge_rank AS INT) AS merge_rank, lhs, rhs, cnt FROM (
      $out) ORDER BY merge_rank"""
  }

  /** `applyBpe` oracle: after nMerges rounds the final vocab v{n} IS every
    * corpus word's segmentation (train and apply share greedy-in-rank-order
    * semantics), so per-document subword counts are one word join away.
    * Docs whose text splits to no words keep n_subwords = 0 via the left
    * join.
    */
  def duckSegmentSql(nMerges: Int): String = {
    require(nMerges >= 1)
    val rounds = (1 to nMerges).map(duckRound).mkString(",\n      ")
    s"""WITH $duckV0),
      $rounds,
      tok AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
          FROM documents)
        WHERE length(word) > 0),
      per_doc AS (
        SELECT t.doc_id, CAST(SUM(len(v.syms)) AS BIGINT) AS n
        FROM tok t JOIN v$nMerges v USING (word) GROUP BY 1)
      SELECT d.doc_id, COALESCE(p.n, 0) AS n_subwords
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
      ORDER BY d.doc_id"""
  }
}

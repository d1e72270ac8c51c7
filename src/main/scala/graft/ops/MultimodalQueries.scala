package graft.ops

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Multimodal plumbing exercised end-to-end: documents' bytes stand in for
  * media payloads; the binary pipeline (encode -> mapPartitions feature
  * extraction) is validated against a DuckDB character-code mirror (ASCII
  * corpus => byte == char code).
  */
object MultimodalQueries {

  val mmFeatures = Q(
    "mm_features",
    (s, d) => {
      val media = Multimodal.mediaFromDocuments(s, T.documents(s, d))
      Multimodal.extractFeatures(media).toDF()
        .select(col("id"), col("n_bytes"), col("checksum"),
          col("frames_sampled"),
          concat_ws(",", col("histo_head")).as("histo"))
        .orderBy(col("id"))
    },
    Some("""
      WITH chars AS (
        SELECT doc_id, unicode(substr(text, CAST(i AS INT), 1)) AS code
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
              FROM documents)),
      base AS (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bytes,
               CAST(SUM(code) AS BIGINT) AS checksum,
               CAST(FLOOR((COUNT(*) + 3) / 4) AS INT) AS frames_sampled
        FROM chars GROUP BY 1),
      spine AS (
        SELECT d.doc_id, b.bin
        FROM (SELECT DISTINCT doc_id FROM documents) d,
             (SELECT unnest(generate_series(0, 7)) AS bin) b),
      hist AS (
        SELECT doc_id, CAST(FLOOR(code * 8.0 / 256) AS INT) AS bin, COUNT(*) AS n
        FROM chars GROUP BY 1, 2),
      histo AS (
        SELECT s.doc_id,
               string_agg(CAST(COALESCE(h.n, 0) AS VARCHAR), ',' ORDER BY s.bin) AS histo
        FROM spine s LEFT JOIN hist h ON h.doc_id = s.doc_id AND h.bin = s.bin
        GROUP BY 1)
      SELECT b.doc_id AS id, b.n_bytes, b.checksum, b.frames_sampled, histo.histo
      FROM base b JOIN histo ON histo.doc_id = b.doc_id
      ORDER BY id"""))

  /** Nearest-neighbor resize to an 8x8 plane: dst(x,y) = src(2x, y*h//8)
    * over the 16-wide text-byte plane, out-of-payload reads = 0. The oracle
    * mirrors the integer geometry exactly (`//` floor division).
    */
  val mmResize = Q(
    "mm_resize",
    (s, d) => {
      val media = Multimodal.mediaFromDocuments(s, T.documents(s, d))
      Multimodal.resizeFeatures(media, 8, 8).toDF()
        .select(col("id"), col("checksum"), col("n_src_bytes"))
        .orderBy(col("id"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
               (length(text) // 16) + 1 AS h,
               unnest(generate_series(0, 63)) AS p
        FROM documents),
      b AS (
        SELECT doc_id, len, text,
               ((p // 8) * h // 8) * 16 + ((p % 8) * 16 // 8) AS idx
        FROM g)
      SELECT doc_id AS id,
             CAST(SUM(CASE WHEN idx < len
                  THEN unicode(substr(text, CAST(idx AS INT) + 1, 1))
                  ELSE 0 END) AS BIGINT) AS checksum,
             len AS n_src_bytes
      FROM b GROUP BY doc_id, len ORDER BY id"""))

  /** Per-frame sampling: payload chunked into 32-byte frames, every 2nd
    * frame emitted as its own row; the oracle groups character codes by
    * frame index and keeps even frames.
    */
  val mmFrameSample = Q(
    "mm_frame_sample",
    (s, d) => {
      val media = Multimodal.mediaFromDocuments(s, T.documents(s, d))
      Multimodal.sampleFrameRows(media, frameBytes = 32, everyK = 2).toDF()
        .select(col("id"), col("frame_idx"), col("n_bytes"), col("checksum"))
        .orderBy(col("id"), col("frame_idx"))
    },
    Some("""
      WITH chars AS (
        SELECT doc_id, CAST((i - 1) // 32 AS INT) AS frame_idx,
               unicode(substr(text, CAST(i AS INT), 1)) AS code
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
              FROM documents))
      SELECT doc_id AS id, frame_idx, CAST(COUNT(*) AS INT) AS n_bytes,
             CAST(SUM(code) AS BIGINT) AS checksum
      FROM chars WHERE frame_idx % 2 = 0
      GROUP BY 1, 2 ORDER BY id, frame_idx"""))

  /** Audio features through the REAL WAV container: Spark encodes each
    * doc's bytes as PCM16 into a RIFF/WAVE payload, decodes it back, and
    * extracts rms/zero-crossings; the oracle recomputes both straight from
    * character codes ((code-128)/128 is exactly the normalized sample), so
    * a hash match proves the container round-trip, not just the math.
    *
    * ASCII assumption (shared with mm_frame_sample): Spark derives samples
    * from UTF-8 BYTES (getBytes) while the oracle walks CODE POINTS
    * (unicode/substr/length) — equal only while every char is single-byte
    * ASCII, which the driver's synthetic corpus guarantees by
    * construction. A non-ASCII corpus would need the oracle rewritten over
    * encode(text) blobs.
    */
  val mmAudio = Q(
    "mm_audio",
    (s, d) => {
      val media = Multimodal.audioFromDocuments(s, T.documents(s, d))
      Multimodal.audioFeatures(media, nWindows = 4).toDF()
        .select(col("id"), col("sample_rate"), col("n_samples"),
          round(col("rms"), 4).as("rms"), col("zero_crossings"))
        .orderBy(col("id"))
    },
    Some("""
      WITH chars AS (
        SELECT doc_id, i,
               (unicode(substr(text, CAST(i AS INT), 1)) - 128) / 128.0 AS v
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
              FROM documents)),
      zc AS (
        SELECT doc_id,
               SUM(CASE WHEN prev IS NOT NULL AND (v < 0) <> (prev < 0)
                        THEN 1 ELSE 0 END) AS zero_crossings
        FROM (SELECT doc_id, v,
                     LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
              FROM chars)
        GROUP BY 1)
      SELECT c.doc_id AS id, 8000 AS sample_rate,
             CAST(COUNT(*) AS INT) AS n_samples,
             ROUND(SQRT(AVG(c.v * c.v)), 4) AS rms,
             CAST(zc.zero_crossings AS BIGINT) AS zero_crossings
      FROM chars c JOIN zc USING (doc_id)
      GROUP BY c.doc_id, zc.zero_crossings
      ORDER BY id"""))

  /** WebDataset tar shard round trip: pack the documents table into
    * `shard-NNNNN.tar` files (`graft.sources.WebDataset.writeTarShards`,
    * one sequential tar per task, fixed mtimes), read them back with the
    * tar-walking `binaryFile` source, and decode the payloads. The oracle
    * is the documents table itself — the container layer must be
    * byte-lossless end to end. (The build-inside-the-query pattern of
    * text_dsir_indexed / emb_ann_index_search.)
    */
  val mmWdsRoundtrip = Q(
    "mm_wds_roundtrip",
    (s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("wds").toString
      val rows = T.documents(s, d).select(
        (col("doc_id") % 8).cast("int").as("shard"),
        col("doc_id").cast("string").as("key"),
        lit("txt").as("ext"),
        col("text").cast("binary").as("payload"))
      graft.sources.WebDataset.writeTarShards(rows, dir)
      graft.sources.WebDataset.readTarShards(s, s"$dir/*.tar")
        .select(col("key").cast("long").as("doc_id"),
          col("payload").cast("string").as("text"))
        .orderBy(col("doc_id"))
    },
    Some("SELECT doc_id, text FROM documents ORDER BY doc_id"))

  /** Perceptual (aHash) image near-dup pairs: the oracle replays the
    * nearest-neighbor 8×8 resize (the mm_resize formula), the 64-pixel
    * mean threshold, the bit-63-safe hash packing, and a brute-force
    * Hamming join — the banded cascade's candidate recall is exact
    * (pigeonhole), so the outputs must agree pair-for-pair.
    */
  val mmPhashPairs = Q(
    "mm_phash_pairs",
    (s, d) => {
      val media = Multimodal.mediaFromDocuments(s, T.documents(s, d))
      Multimodal.aHashPairs(media, col("id") % 20 === 0, maxHamming = 8)
        .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("a"), col("b"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
               (length(text) // 16) + 1 AS h,
               unnest(generate_series(0, 63)) AS p
        FROM documents),
      px AS (
        SELECT doc_id, p,
               CASE WHEN idx < len
                    THEN unicode(substr(text, CAST(idx AS INT) + 1, 1))
                    ELSE 0 END AS pix
        FROM (SELECT doc_id, len, text, p,
                     ((p // 8) * h // 8) * 16 + ((p % 8) * 16 // 8) AS idx
              FROM g)),
      m AS (SELECT doc_id, SUM(pix) / 64.0 AS mean FROM px GROUP BY 1),
      sig AS (
        SELECT px.doc_id AS id,
               CAST(SUM(CASE WHEN pix <= mean THEN 0
                             WHEN p = 63
                             THEN CAST(-9223372036854775807 AS BIGINT) - 1
                             ELSE (CAST(1 AS BIGINT) << CAST(p AS INT)) END)
                    AS BIGINT) AS ph
        FROM px JOIN m USING (doc_id) GROUP BY 1)
      SELECT q.id AS a, c.id AS b,
             CAST(bit_count(xor(q.ph, c.ph)) AS INT) AS hamming
      FROM sig q JOIN sig c ON q.id < c.id
      WHERE (q.id % 20 = 0 OR c.id % 20 = 0)
        AND bit_count(xor(q.ph, c.ph)) <= 8
      ORDER BY a, b"""))

  def all: Seq[Q] = Seq(mmFeatures, mmResize, mmFrameSample, mmAudio,
    mmWdsRoundtrip, mmPhashPairs)
}

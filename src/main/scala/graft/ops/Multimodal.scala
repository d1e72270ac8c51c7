package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-batched functions over the binary payload.
  *
  * Image decode is REAL for the JDK-native formats: `image/png`,
  * `image/bmp`, `image/gif`, `image/jpeg` payloads go through
  * `javax.imageio` and come out as a row-major grayscale plane (integer
  * BT.601 luminance). Audio decode is REAL for canonical RIFF/WAVE PCM16
  * (`audio/wav`, [[decodeWavPcm16]] — a pure byte walk, no external
  * codec). Any other `kind` treats the payload as a raw byte plane with
  * the row's declared width/height — the path the synthetic corpus (text
  * bytes standing in for blobs) exercises. Compressed audio/video codecs
  * are out of scope for this container; their payloads ride the raw path.
  *
  * Scale notes: binary payloads stay columnar in Parquet (never exploded),
  * the mapPartitions batches amortize per-task setup (ImageIO reader
  * lookup), and feature vectors are fixed-width arrays friendly to
  * downstream ANN (see [[Similarity]]).
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int)

  final case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
      checksum: Long, histo_head: Seq[Long], frames_sampled: Int)

  /** A decoded payload: row-major byte plane + its actual geometry. */
  final case class Plane(bytes: Array[Byte], width: Int, height: Int)

  private val ImageKinds =
    Set("image/png", "image/bmp", "image/gif", "image/jpeg")

  /** Decode a payload to a grayscale plane. Image kinds dispatch to
    * `javax.imageio` (readers ship with the JDK) and take their geometry
    * from the decoded image; everything else is a raw plane with the
    * declared geometry. A corrupt image payload fails loudly with the row
    * id rather than silently falling back to raw bytes.
    */
  def decode(r: MediaRow): Plane =
    if (ImageKinds.contains(r.kind)) {
      // in-memory decode only: the default ImageIO path spills a temp file
      // per read, which would thrash executor-local disks at scale
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.content))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext)
        throw new IllegalArgumentException(
          s"media id=${r.id}: no ImageIO reader for kind=${r.kind}")
      val reader = readers.next()
      try {
        reader.setInput(in)
        val img = reader.read(0)
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](w * h)
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            out(i) = lum.toByte
            i += 1
            x += 1
          }
          y += 1
        }
        Plane(out, w, h)
      } finally {
        reader.dispose()
        in.close()
      }
    } else Plane(r.content, r.width, r.height)

  /** Deterministic "frame sampling": every `stride`-th byte of the decoded
    * plane stands in for a sampled frame.
    */
  def sampleFrames(plane: Array[Byte], stride: Int): Array[Byte] =
    plane.indices.collect { case i if i % stride == 0 => plane(i) }.toArray

  /** Feature extraction over the decoded payload: size, checksum, head of
    * the byte histogram. Runs partition-batched; the per-partition prefix is
    * where a real codec's context would be initialized once.
    */
  def extractFeatures(media: Dataset[MediaRow], histoBins: Int = 8,
      frameStride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val plane = decode(r).bytes
        val frames = sampleFrames(plane, frameStride)
        val histo = new Array[Long](histoBins)
        var sum = 0L
        var i = 0
        while (i < plane.length) {
          val b = plane(i) & 0xff
          histo(b * histoBins / 256) += 1
          sum += b
          i += 1
        }
        MediaFeatures(r.id, r.kind, plane.length, sum, histo.toSeq, frames.length)
      }
    }
  }

  /** Nearest-neighbor resize of a row-major byte plane: dst(x, y) =
    * src(x*srcW/dstW, y*srcH/dstH), integer floor; indexes past the actual
    * payload read as 0 (planes are logically width x height but payloads
    * may be shorter). The geometry kernel a real image path would replace
    * with a codec resampler — the plumbing (schema, batching, bounds) is
    * what's exercised here.
    */
  def resizePlane(plane: Array[Byte], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Byte] = {
    val out = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        val idx = sy * srcW + sx
        out(y * dstW + x) = if (idx < plane.length) plane(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  final case class FrameRow(id: Long, frame_idx: Int, n_bytes: Int,
      checksum: Long)

  /** Frame sampling with one OUTPUT ROW PER FRAME: the decoded payload is
    * cut into consecutive `frameBytes`-byte chunks ("frames"; the last may
    * be short) and every `everyK`-th frame is emitted with its own
    * summary — the shape a video pipeline needs when sampled frames feed
    * per-frame downstream work (frame dedup, per-frame embeddings) rather
    * than a per-media scalar. A real codec swaps the chunking for keyframe
    * decode; the Spark surface (flatMap fan-out, per-frame rows, bounded
    * memory per row) is what's exercised.
    */
  def sampleFrameRows(media: Dataset[MediaRow], frameBytes: Int,
      everyK: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && everyK > 0,
      s"frameBytes and everyK must be positive, got $frameBytes, $everyK")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val plane = decode(r).bytes
        val nFrames = (plane.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames).filter(_ % everyK == 0).map { f =>
          val s = f * frameBytes
          val e = math.min(s + frameBytes, plane.length)
          var sum = 0L
          var i = s
          while (i < e) { sum += plane(i) & 0xff; i += 1 }
          FrameRow(r.id, f, e - s, sum)
        }
      }
    }
  }

  final case class ResizedFeatures(id: Long, dst_w: Int, dst_h: Int,
      checksum: Long, n_src_bytes: Long)

  /** Resize every payload to dstW x dstH and summarize (checksum = sum of
    * resized bytes) — partition-batched like [[extractFeatures]].
    */
  def resizeFeatures(media: Dataset[MediaRow], dstW: Int,
      dstH: Int): Dataset[ResizedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = decode(r)
        val resized = resizePlane(p.bytes, p.width, p.height, dstW, dstH)
        var sum = 0L
        var i = 0
        while (i < resized.length) { sum += resized(i) & 0xff; i += 1 }
        ResizedFeatures(r.id, dstW, dstH, sum, p.bytes.length.toLong)
      }
    }
  }

  final case class AudioFeatures(id: Long, sample_rate: Int, n_samples: Int,
      rms: Double, zero_crossings: Long, window_rms: Seq[Double])

  /** Decode a canonical RIFF/WAVE PCM16 payload: chunk-walk to `fmt ` and
    * `data`, little-endian samples, stereo averaged to mono. Returns
    * (sampleRate, samples). Pure JDK byte walk — audio's answer to the
    * ImageIO image path: REAL decode, zero external codecs. Malformed or
    * non-PCM16 payloads fail loudly with the row id (the image path's
    * corrupt-payload rule).
    */
  def decodeWavPcm16(id: Long, bytes: Array[Byte]): (Int, Array[Short]) = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"media id=$id: not a RIFF/WAVE payload")
    // the offset walks in LONG: a corrupt near-Int.MaxValue chunk size
    // would overflow an Int offset to negative and the next tag() would
    // throw a raw StringIndexOutOfBounds instead of the id-tagged error
    // this decoder promises
    var off = 12L
    var rate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val o = off.toInt
      val chunk = tag(o)
      val sz = le32(o + 4)
      // a corrupt negative size would walk the offset backwards forever
      require(sz >= 0, s"media id=$id: negative RIFF chunk size $sz")
      if (chunk == "fmt ") {
        require(o + 24 <= bytes.length,
          s"media id=$id: truncated fmt chunk")
        val fmt = le16(o + 8)
        require(fmt == 1,
          s"media id=$id: WAV audioFormat=$fmt, only PCM (1) supported")
        channels = le16(o + 10)
        rate = le32(o + 12)
        val bits = le16(o + 22)
        require(bits == 16,
          s"media id=$id: $bits-bit WAV, only PCM16 supported")
        require(channels > 0, s"media id=$id: zero-channel WAV")
      } else if (chunk == "data") { dataOff = o + 8; dataLen = sz }
      off += 8L + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(rate > 0 && dataOff >= 0, s"media id=$id: missing fmt/data chunk")
    val end = math.min(dataOff.toLong + dataLen, bytes.length.toLong).toInt
    val nFrames = (end - dataOff) / (2 * channels)
    val out = new Array[Short](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0
      var c = 0
      while (c < channels) {
        acc += le16(dataOff + (f * channels + c) * 2).toShort
        c += 1
      }
      out(f) = (acc / channels).toShort
      f += 1
    }
    (rate, out)
  }

  /** Per-payload audio features over REAL PCM16 WAV decode: RMS and
    * zero-crossings over [-1, 1]-normalized samples, plus per-window RMS —
    * the fixed-width vector shape downstream ANN consumes (see
    * [[Similarity]]). Partition-batched like [[extractFeatures]]; non-WAV
    * kinds fail loudly rather than silently reading garbage.
    */
  def audioFeatures(media: Dataset[MediaRow],
      nWindows: Int = 8): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    require(nWindows > 0, s"nWindows must be positive, got $nWindows")
    media.mapPartitions { rows =>
      rows.map { r =>
        require(r.kind == "audio/wav",
          s"media id=${r.id}: audioFeatures expects kind=audio/wav, got ${r.kind}")
        val (rate, s) = decodeWavPcm16(r.id, r.content)
        val n = s.length
        var sumSq = 0.0
        var zc = 0L
        var i = 0
        while (i < n) {
          val v = s(i) / 32768.0
          sumSq += v * v
          if (i > 0 && ((s(i - 1) < 0) != (s(i) < 0))) zc += 1
          i += 1
        }
        val wrms = (0 until nWindows).map { w =>
          val a = w.toLong * n / nWindows
          val b = (w + 1).toLong * n / nWindows
          var ss = 0.0
          var j = a.toInt
          while (j < b) { val v = s(j) / 32768.0; ss += v * v; j += 1 }
          if (b > a) math.sqrt(ss / (b - a)) else 0.0
        }
        AudioFeatures(r.id, rate, n,
          if (n > 0) math.sqrt(sumSq / n) else 0.0, zc, wrms)
      }
    }
  }

  /** Encode PCM16 mono samples as a canonical 44-byte-header RIFF/WAVE
    * payload — the sink-side twin of [[decodeWavPcm16]] (round-trip is
    * bit-exact, spec-pinned).
    */
  def encodeWavPcm16Mono(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate)
      .putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Audio media table derived from the documents corpus: each text byte
    * becomes one centered PCM16 sample ((code - 128) * 256) inside a REAL
    * WAV container. The oracle can then recompute features straight from
    * character codes while Spark runs the full encode → container →
    * [[decodeWavPcm16]] → [[audioFeatures]] path — so the hash compare
    * covers the container round-trip, not just the arithmetic.
    */
  def audioFromDocuments(spark: SparkSession, documents: DataFrame,
      rate: Int = 8000): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val samples = text.getBytes("UTF-8")
          .map(b => (((b & 0xff) - 128) * 256).toShort)
        MediaRow(id, "audio/wav", encodeWavPcm16Mono(rate, samples), 0, 0)
      }
  }

  /** 64-bit average-hash (aHash) perceptual signature per media row: the
    * decoded plane shrinks to 8×8 by the same nearest-neighbor
    * [[resizePlane]] the resize op uses, and bit p is set when resized
    * pixel p exceeds the 64-pixel mean — the classic perceptual-dedup
    * signature (near-identical images agree on almost every bit; crops/
    * re-encodes flip a few). Row-local, one pass; the hash is what gets
    * STORED at scale (8 bytes per image, not the image).
    */
  def aHash64(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val p = decode(r)
      val small = resizePlane(p.bytes, p.width, p.height, 8, 8)
      var sum = 0L
      var i = 0
      while (i < 64) { sum += (small(i) & 0xff); i += 1 }
      // /64.0 is exact (power-of-two denominator) — the oracle's AVG
      // computes the identical double, so the > threshold can never
      // straddle an engine rounding difference
      val mean = sum / 64.0
      var h = 0L
      i = 0
      while (i < 64) {
        if ((small(i) & 0xff) > mean) h |= (1L << i)
        i += 1
      }
      (r.id, h)
    }.toDF("id", "phash")
  }

  /** Perceptual near-dup pairs over the media table: [[aHash64]]
    * signatures through [[Dedup.hammingPairs]]'s pigeonhole-band cascade
    * — image dedup with the same scale posture as text SimHash dedup
    * (banded equi-join candidates, never all-pairs; hot buckets capped).
    * Output (a, b, hamming), a < b, at least one side matching
    * `queryPred` (over the id).
    */
  def aHashPairs(media: Dataset[MediaRow],
      queryPred: org.apache.spark.sql.Column, maxHamming: Int,
      maxBucket: Int = graft.ops.Dedup.DefaultMaxBucket): DataFrame =
    graft.ops.Dedup.hammingPairs(
      aHash64(media).withColumnRenamed("phash", "simhash"),
      queryPred, maxHamming, bits = 64, maxBucket = maxBucket)

  /** Build a media table from the documents corpus (text bytes as payload —
    * the stand-in for real image/audio blobs in this environment).
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    // widen: the per-row decode/resize/hash consumers of this table are
    // CPU-bound map work (graft.Par — no-op at scale)
    graft.Par.widen(documents).select(
      col("doc_id").as("id"),
      lit("image/raw").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit(16).as("width"),
      (length(col("text")) / 16 + 1).cast("int").as("height"))
      .as[MediaRow]
  }
}

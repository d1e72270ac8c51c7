package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Real image decode through javax.imageio: synthetic images with a known
  * gradient encode -> decode round-trip to the exact BT.601 luminance plane
  * (PNG/BMP are lossless RGB; GIF palettizes, so it checks geometry and
  * successful decode only), and the Spark feature/resize paths consume the
  * DECODED geometry, not the declared one.
  */
class MultimodalSpec extends AnyFunSuite {

  private def synth(w: Int, h: Int, fmt: String): (Array[Byte], Array[Byte]) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val expected = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 40) % 256
      val g = (y * 70) % 256
      val b = (x + y) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      expected(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    (bos.toByteArray, expected)
  }

  test("PNG/BMP decode to the exact luminance plane; GIF to the right geometry") {
    for ((fmt, kind) <- Seq("png" -> "image/png", "bmp" -> "image/bmp")) {
      val (bytes, expected) = synth(7, 5, fmt)
      val p = Multimodal.decode(Multimodal.MediaRow(1L, kind, bytes, 0, 0))
      assert(p.width == 7 && p.height == 5)
      assert(p.bytes.toSeq == expected.toSeq, s"$fmt plane mismatch")
    }
    val (gif, _) = synth(7, 5, "gif")
    val pg = Multimodal.decode(Multimodal.MediaRow(2L, "image/gif", gif, 0, 0))
    assert(pg.width == 7 && pg.height == 5 && pg.bytes.length == 35)
  }

  test("non-image kinds stay raw; corrupt image payloads fail loudly") {
    val raw = Multimodal.decode(
      Multimodal.MediaRow(3L, "audio/pcm", Array[Byte](1, 2, 3, 4), 2, 2))
    assert(raw.bytes.toSeq == Seq[Byte](1, 2, 3, 4) && raw.width == 2)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decode(
        Multimodal.MediaRow(9L, "image/png", Array[Byte](1, 2, 3), 0, 0))
    }
    assert(e.getMessage.contains("id=9"))
  }

  test("sampleFrameRows: per-frame rows over the DECODED plane, short tail kept") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (png, expected) = synth(10, 5, "png") // 50-byte decoded plane
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png", png, 1, 1),
      Multimodal.MediaRow(2L, "audio/pcm", Array.tabulate(7)(_.toByte), 7, 1)
    ).toDS()
    val frames = Multimodal.sampleFrameRows(media, frameBytes = 16, everyK = 2)
      .collect().map(f => (f.id, f.frame_idx) -> f).toMap
    // id 1: 50 bytes -> frames 0..3 (last 2 bytes), sampled 0 and 2
    assert(frames.keySet == Set((1L, 0), (1L, 2), (2L, 0)))
    assert(frames((1L, 0)).n_bytes == 16 && frames((1L, 2)).n_bytes == 16)
    assert(frames((1L, 0)).checksum ==
      expected.take(16).map(_ & 0xff).map(_.toLong).sum)
    assert(frames((1L, 2)).checksum ==
      expected.slice(32, 48).map(_ & 0xff).map(_.toLong).sum)
    // id 2 raw path: one short frame of all 7 bytes
    assert(frames((2L, 0)).n_bytes == 7 && frames((2L, 0)).checksum == 21)
  }

  test("Spark feature/resize paths use the decoded geometry end-to-end") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (png, expected) = synth(16, 4, "png")
    // declared geometry is WRONG on purpose: decode must override it
    val media = Seq(Multimodal.MediaRow(7L, "image/png", png, 1, 1)).toDS()

    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.n_bytes == 64)
    assert(f.checksum == expected.map(_ & 0xff).map(_.toLong).sum)

    val r = Multimodal.resizeFeatures(media, 8, 2).collect().head
    assert(r.n_src_bytes == 64)
    // nearest-neighbor on the DECODED 16x4 plane: src(x*2, y*2)
    val want = (for (y <- 0 until 2; x <- 0 until 8)
      yield expected((y * 2) * 16 + x * 2) & 0xff).map(_.toLong).sum
    assert(r.checksum == want)
  }

  /** Canonical 44-byte-header RIFF/WAVE PCM16 writer for the tests. */
  private def wav(rate: Int, channels: Int,
      frames: Array[Array[Short]]): Array[Byte] = {
    val n = frames.length
    val dataLen = n * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach(f => f.foreach(bb.putShort))
    bb.array()
  }

  test("WAV PCM16 decode: mono sine features, stereo channel averaging") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rate = 8000
    val n = 800 // 0.1 s
    val amp = 0.5
    val mono = Array.tabulate(n)(i => Array(
      (amp * 32767 * math.sin(2 * math.Pi * 440 * i / rate)).toShort))
    val (gotRate, s) = Multimodal.decodeWavPcm16(1L, wav(rate, 1, mono))
    assert(gotRate == rate && s.length == n)
    assert(s.toSeq == mono.map(_(0)).toSeq) // bit-exact sample round-trip
    // the library's own encoder round-trips bit-exactly too
    val enc = Multimodal.encodeWavPcm16Mono(rate, mono.map(_(0)))
    val (r2, s2) = Multimodal.decodeWavPcm16(1L, enc)
    assert(r2 == rate && s2.toSeq == mono.map(_(0)).toSeq)

    val media = Seq(Multimodal.MediaRow(1L, "audio/wav",
      wav(rate, 1, mono), 0, 0)).toDS()
    val f = Multimodal.audioFeatures(media, nWindows = 4).collect().head
    assert(f.sample_rate == rate && f.n_samples == n)
    // sine at amplitude 0.5: rms = 0.5/sqrt(2), zero crossings = 2 per
    // cycle x 44 cycles (+-1 for the boundary)
    assert(math.abs(f.rms - amp / math.sqrt(2)) < 0.01, s"rms ${f.rms}")
    assert(math.abs(f.zero_crossings - 88L) <= 2, s"zc ${f.zero_crossings}")
    // stationary signal: every window's rms equals the global rms
    assert(f.window_rms.length == 4)
    f.window_rms.foreach(w => assert(math.abs(w - f.rms) < 0.01))

    // stereo with R = -L averages to silence sample-by-sample
    val stereo = Array.tabulate(n) { i =>
      val v = (amp * 32767 * math.sin(2 * math.Pi * 440 * i / rate)).toShort
      Array(v, (-v).toShort)
    }
    val (_, sz) = Multimodal.decodeWavPcm16(2L, wav(rate, 2, stereo))
    assert(sz.length == n && sz.forall(v => math.abs(v.toInt) <= 1))

    // loud failure on a non-wav payload, with the row id in the message
    val bad = intercept[Exception] {
      Multimodal.audioFeatures(Seq(Multimodal.MediaRow(7L, "audio/wav",
        "not a wav".getBytes, 0, 0)).toDS()).collect()
    }
    assert(bad.getMessage.contains("id=7"))
  }

  test("WAV decode: huge corrupt chunk size fails with the id-tagged error, not overflow") {
    // a chunk claiming ~Int.MaxValue bytes would wrap an Int offset
    // negative (off += 8 + sz) and crash with a raw
    // StringIndexOutOfBoundsException from tag(); the Long walk must
    // instead terminate and raise the contractual id-tagged require
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(Int.MaxValue - 4)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16(9L, bb.array())
    }
    assert(e.getMessage.contains("id=9"), e.getMessage)
  }
}

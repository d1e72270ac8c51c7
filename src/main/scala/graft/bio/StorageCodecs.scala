package graft.bio

import scala.collection.mutable.ArrayBuffer

/** Byte-parity codecs for the reference's on-disk formats. In the Spark
  * engine these are STORAGE concerns that Parquet owns (dictionary/ZSTD for
  * sequences, DELTA_BINARY_PACKED for sorted k-mer runs) — the codecs exist
  * to prove format fidelity and to read/write reference-produced files if
  * ever needed.
  */
object StorageCodecs {

  /** C1: 5-bit residue packing, 3 chars per uint16
    * (`src/commons/BitManipulateMacros.h:5-17`,
    * `src/sra/convert2sradb.cpp:134-157`): each char contributes its low 5
    * bits; '@' (0x40) pads to a multiple of 3; the high bit of the LAST
    * short flags end-of-sequence. Decoding ORs 0x40 back
    * (`src/commons/SRADBReader.cpp:236-265`).
    */
  def pack5(seq: String): Array[Int] = {
    val padded = seq + ("@" * ((3 - seq.length % 3) % 3))
    val out = new Array[Int](padded.length / 3)
    var i = 0
    while (i < out.length) {
      val a = padded(i * 3) & 0x1f
      val b = padded(i * 3 + 1) & 0x1f
      val c = padded(i * 3 + 2) & 0x1f
      out(i) = (a << 10) | (b << 5) | c
      i += 1
    }
    if (out.nonEmpty) out(out.length - 1) |= 0x8000
    out
  }

  def unpack5(packed: Array[Int]): String = {
    val sb = new StringBuilder(packed.length * 3)
    packed.foreach { s =>
      sb += (0x40 | ((s >> 10) & 0x1f)).toChar
      sb += (0x40 | ((s >> 5) & 0x1f)).toChar
      sb += (0x40 | (s & 0x1f)).toChar
    }
    sb.toString.takeWhile(_ != '@')
  }

  /** C3: 15-bit-payload delta varint stream over an ascending u64 sequence
    * (`src/sra/createkmertable.cpp:229-245`): each gap is emitted as uint16
    * words carrying 15 payload bits, high bit set on the LAST word of each
    * gap (`IS_LAST_15_BITS`), most-significant chunk first.
    */
  def deltaVarintEncode(sorted: Array[Long]): Array[Int] = {
    val out = new ArrayBuffer[Int]
    var prev = 0L
    sorted.foreach { v =>
      var gap = v - prev
      require(gap >= 0, "input must be ascending")
      prev = v
      val chunks = new ArrayBuffer[Int]
      do {
        chunks.prepend((gap & 0x7fff).toInt)
        gap >>>= 15
      } while (gap != 0)
      chunks.indices.foreach { i =>
        out += (if (i == chunks.length - 1) chunks(i) | 0x8000 else chunks(i))
      }
    }
    out.toArray
  }

  def deltaVarintDecode(stream: Array[Int]): Array[Long] = {
    val out = new ArrayBuffer[Long]
    var current = 0L
    var acc = 0L
    stream.foreach { word =>
      acc = (acc << 15) | (word & 0x7fff)
      if ((word & 0x8000) != 0) {
        current += acc
        out += current
        acc = 0L
      }
    }
    out.toArray
  }
}

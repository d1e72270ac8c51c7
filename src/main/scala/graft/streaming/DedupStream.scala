package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the streaming face of
  * `ops.Dedup.simhashPairs`: per-row 16-bit SimHash, (maxHamming+1)-band
  * pigeonhole bucketing (same exact-recall scheme as batch), and per-bucket
  * state holding the signatures seen so far. A new document emits one
  * NearDupHit per stored bucket-mate within the Hamming radius.
  *
  * Pairs colliding in several bands are emitted once per band — run
  * `dropDuplicates("a","b")` (or dedupe at the sink) when exact-once pairs
  * matter. State grows with distinct docs per bucket; production bounds it
  * with an event-time timeout, exactly like [[EventsStream.sessionize]]'s
  * note.
  */
object DedupStream {

  final case class DocRow(doc_id: Long, text: String)
  final case class BandRow(band: Int, bval: Int, doc_id: Long, sig: Int)
  final case class NearDupHit(a: Long, b: Long, hamming: Int)

  /** Per-row 16-bit SimHash, value-identical to `ops.Dedup.simhash16`'s
    * grouped formulation: token h16 = first 4 hex chars of md5, per-bit
    * majority vote of ±1, ties -> 0. Plain Scala so it runs inside typed
    * streaming maps without a groupBy (streaming aggs would need their own
    * watermark/output-mode machinery).
    */
  def simhash16Value(text: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](16)
    text.split("\\s+").iterator.filter(_.nonEmpty).foreach { tok =>
      val d = md.digest(tok.getBytes("UTF-8"))
      // first 4 hex chars == high 2 bytes of the digest
      val h16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var b = 0
      while (b < 16) {
        votes(b) += (if (((h16 >> b) & 1) == 1) 1 else -1)
        b += 1
      }
    }
    (0 until 16).map(b => if (votes(b) > 0) 1 << b else 0).sum
  }

  /** Pigeonhole band rows for a signature (same bounds as the batch
    * operator: band i covers bits [i*16/nb, (i+1)*16/nb)).
    */
  def bandRows(docId: Long, sig: Int, maxHamming: Int): Seq[BandRow] = {
    val nb = maxHamming + 1
    val bounds = (0 to nb).map(i => i * 16 / nb)
    (0 until nb).map { i =>
      val lo = bounds(i)
      val mask = (1 << (bounds(i + 1) - lo)) - 1
      BandRow(i, (sig >> lo) & mask, docId, sig)
    }
  }

  /** Streaming near-dup pairs: every emitted hit pairs a new document with
    * an earlier one in the same band bucket at Hamming distance <=
    * maxHamming. Exact recall (pigeonhole): any qualifying pair shares at
    * least one bucket. Output orientation: a < b.
    */
  def nearDupPairs(docs: Dataset[DocRow], maxHamming: Int): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => bandRows(d.doc_id, simhash16Value(d.text), maxHamming))
      .groupByKey(r => (r.band, r.bval))
      .flatMapGroupsWithState[List[(Long, Int)], NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[List[(Long, Int)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            seen.foreach { case (oid, osig) =>
              if (oid != r.doc_id) {
                val ham = Integer.bitCount(osig ^ r.sig)
                if (ham <= maxHamming)
                  out += NearDupHit(math.min(oid, r.doc_id),
                    math.max(oid, r.doc_id), ham)
              }
            }
            seen ::= (r.doc_id, r.sig)
          }
          state.update(seen)
          out.iterator
      }
  }
}

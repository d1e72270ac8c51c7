package graft.bio

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** k-mer <-> integer code conversions.
  *
  * Encoding follows the reference's polynomial scheme
  * (`lib/mmseqs/src/prefiltering/Indexer.h:20-86`):
  * `code = sum_i ord(seq[i]) * A^i` — first character least significant,
  * base `A` = alphabet size (20 for proteins: X excluded, so any k-mer
  * containing a non-alphabet character encodes to null, which doubles as
  * the X-drop filter, `lib/mmseqs/src/commons/Sequence.h:97-99`).
  */
object KmerCodec {

  /** -1 encodes "contains non-alphabet character". */
  def encodeBytes(bytes: Array[Byte], lut: Array[Int], base: Long): Long = {
    var code = 0L
    var pw = 1L
    var i = 0
    while (i < bytes.length) {
      val v = lut(bytes(i) & 0xff)
      if (v < 0) return -1L
      code += v * pw
      pw *= base
      i += 1
    }
    code
  }

  def decode(code: Long, alphabet: String, k: Int): String = {
    val base = alphabet.length.toLong
    val sb = new StringBuilder
    var c = code
    var i = 0
    while (i < k) {
      sb += alphabet((c % base).toInt)
      c /= base
      i += 1
    }
    sb.toString
  }

  def lutFor(alphabet: String): Array[Int] = {
    val lut = Array.fill(256)(-1)
    alphabet.zipWithIndex.foreach { case (ch, i) => lut(ch.toInt) = i }
    lut
  }

  /** Codegen'd Catalyst expression: string k-mer -> long code (null when the
    * k-mer contains a character outside `alphabet`).
    */
  case class KmerEncode(child: Expression, alphabet: String)
      extends UnaryExpression {
    private lazy val lut: Array[Int] = lutFor(alphabet)

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "kmer_encode"

    override protected def nullSafeEval(input: Any): Any = {
      val code = encodeBytes(
        input.asInstanceOf[UTF8String].getBytes, lut, alphabet.length.toLong)
      if (code < 0) null else java.lang.Long.valueOf(code)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val lutRef = ctx.addReferenceObj("kmerLut", lut, "int[]")
        // freshName every local — fixed names collide (Janino "Redefinition")
        // as soon as two KmerEncodes land in one generated method.
        val bytes = ctx.freshName("kmerBytes")
        val code = ctx.freshName("kmerCode")
        val pw = ctx.freshName("kmerPw")
        val bad = ctx.freshName("kmerBad")
        val i = ctx.freshName("kmerI")
        val v = ctx.freshName("kmerV")
        s"""
        byte[] $bytes = $c.getBytes();
        long $code = 0L; long $pw = 1L; boolean $bad = false;
        for (int $i = 0; $i < $bytes.length; $i++) {
          int $v = $lutRef[$bytes[$i] & 0xFF];
          if ($v < 0) { $bad = true; break; }
          $code += $v * $pw; $pw *= ${alphabet.length}L;
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $code; }
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def kmerEncode(c: Column, alphabet: String): Column =
    GraftShim.column(KmerEncode(GraftShim.expression(c), alphabet))

  /** Table-generating rolling-window extraction: one pass over the
    * sequence, O(1) amortized per emitted k-mer (the polynomial code shifts
    * by `code/base + ord*base^(k-1)` — first char least significant means
    * dropping it is an exact integer division). Out-of-alphabet characters
    * reset the window (P4). Emits (kmerPos INT, kmer BIGINT).
    */
  case class KmerGenerate(child: Expression, k: Int, alphabet: String)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.Generator
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    private lazy val lut: Array[Int] = lutFor(alphabet)
    private val base = alphabet.length.toLong
    private lazy val topPow: Long = {
      var p = 1L; (1 until k).foreach(_ => p *= base); p
    }

    override def elementSchema: org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("kmerPos",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("kmer", LongType, nullable = false)))

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
      val v = child.eval(input)
      if (v == null) return Nil
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow](
        math.max(bytes.length - k + 1, 0))
      var code = 0L
      var pw = 1L
      var validRun = 0
      var i = 0
      while (i < bytes.length) {
        val o = lut(bytes(i) & 0xff)
        if (o < 0) { code = 0L; pw = 1L; validRun = 0 }
        else if (validRun < k) {
          code += o * pw
          validRun += 1
          if (validRun < k) pw *= base
        } else {
          code = code / base + o * topPow
        }
        if (validRun == k && lut(bytes(i) & 0xff) >= 0)
          out += org.apache.spark.sql.catalyst.InternalRow(i - k + 1, code)
        i += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Explode a sequence column into `(kmerPos INT, kmer BIGINT)` rows — the
    * reference's sliding-window extraction F1
    * (`lib/mmseqs/src/commons/Sequence.h:92-130`): positions 0..L-k, k-mers
    * containing out-of-alphabet characters dropped (P4). Implemented by the
    * rolling-window generator above.
    */
  def explodeKmers(df: org.apache.spark.sql.DataFrame, seqCol: String, k: Int,
      alphabet: String): org.apache.spark.sql.DataFrame =
    df.select(col("*"),
      GraftShim.column(KmerGenerate(GraftShim.expression(col(seqCol)), k, alphabet))
        .as(Seq("kmerPos", "kmer")))
}

package graft.sources

import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine scalar functions exposed through the DSv2 `FunctionCatalog`
  * seam (the Iceberg `system.bucket`/`system.truncate` shape): plain SQL
  * calls like `SELECT lake.ns.kmer_encode(seq)` resolve to BOUND scalar
  * functions whose `invoke` magic method Spark codegens as a direct call
  * inside whole-stage codegen — no UDF serialization, no Row boxing on
  * the hot path.
  *
  * Each function is a scalar face of an EXISTING, spec-covered engine
  * primitive, and its spec differentially pins it against that
  * primitive:
  *  - `kmer_encode(seq)` — [[graft.bio.KmerCodec.encodeBytes]] with the
  *    house protein alphabet (the k-mer table's packing);
  *  - `hamming64(a, b)` — the SimHash near-dup distance
  *    (`bit_count(a ^ b)`, the Dedup.hammingPairs metric);
  *  - `ws_tokens(s)` — whitespace token count, exactly
  *    [[graft.ops.TextAnalysis.tokenCounts]]' `ws_tokens` column
  *    (including Spark's `split` empty-string edge).
  */
private[sources] object GraftFunctions {

  val names: Seq[String] = Seq("kmer_encode", "hamming64", "ws_tokens")

  def load(name: String): Option[UnboundFunction] = name match {
    case "kmer_encode" => Some(KmerEncodeUnbound)
    case "hamming64" => Some(Hamming64Unbound)
    case "ws_tokens" => Some(WsTokensUnbound)
    case _ => None
  }

  /** Arity check only (UnsupportedOperationException is what the
    * analyzer converts into its clean cannot-bind error); argument
    * TYPES are reconciled by Spark against the bound function's
    * `inputTypes()` — that is what lets `hamming64(sig, 0)` upcast the
    * int literal instead of dying on exact-type equality.
    */
  private def expect(inputType: StructType, arity: Int, fn: String): Unit =
    if (inputType.fields.length != arity)
      throw new UnsupportedOperationException(
        s"$fn expects $arity argument(s), got ${inputType.fields.length}")

  object KmerEncodeUnbound extends UnboundFunction {
    override def name(): String = "kmer_encode"
    override def description(): String =
      "kmer_encode(seq STRING) -> BIGINT: the k-mer table's base-20 " +
        "packing of a protein k-mer; X/unknown residues yield NULL " +
        "(the X-k-mer drop contract)"
    override def bind(inputType: StructType): BoundFunction = {
      expect(inputType, 1, name())
      new KmerEncodeBound
    }
  }

  class KmerEncodeBound extends ScalarFunction[java.lang.Long] {
    private val alphabet = graft.bio.Matrices.KmerAlphabet
    private val lut = graft.bio.KmerCodec.lutFor(alphabet)
    private val base = alphabet.length.toLong
    override def name(): String = "kmer_encode"
    override def canonicalName(): String = "graft.kmer_encode"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    /** The MAGIC method Spark codegens as a direct Invoke. Boxed return:
      * an invalid residue (the expression's X-k-mer drop contract) is
      * NULL, exactly like [[graft.bio.KmerCodec.KmerEncode]].
      */
    def invoke(s: UTF8String): java.lang.Long = {
      if (s == null) return null // constant folding invokes with literal nulls
      val code = graft.bio.KmerCodec.encodeBytes(s.getBytes, lut, base)
      if (code < 0) null else java.lang.Long.valueOf(code)
    }
    override def produceResult(
        row: org.apache.spark.sql.catalyst.InternalRow): java.lang.Long =
      if (row.isNullAt(0)) null else invoke(row.getUTF8String(0))
  }

  object Hamming64Unbound extends UnboundFunction {
    override def name(): String = "hamming64"
    override def description(): String =
      "hamming64(a BIGINT, b BIGINT) -> INT: SimHash signature distance " +
        "(bit_count(a ^ b))"
    override def bind(inputType: StructType): BoundFunction = {
      expect(inputType, 2, name())
      new Hamming64Bound
    }
  }

  class Hamming64Bound extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "hamming64"
    override def canonicalName(): String = "graft.hamming64"
    override def inputTypes(): Array[DataType] = Array(LongType, LongType)
    override def resultType(): DataType = IntegerType
    def invoke(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    override def produceResult(
        row: org.apache.spark.sql.catalyst.InternalRow): java.lang.Integer =
      if (row.isNullAt(0) || row.isNullAt(1)) null
      else invoke(row.getLong(0), row.getLong(1))
  }

  object WsTokensUnbound extends UnboundFunction {
    override def name(): String = "ws_tokens"
    override def description(): String =
      "ws_tokens(s STRING) -> INT: whitespace token count " +
        "(TextAnalysis.tokenCounts' ws_tokens column, exactly)"
    override def bind(inputType: StructType): BoundFunction = {
      expect(inputType, 1, name())
      new WsTokensBound
    }
  }

  object WsTokensBound {
    private[GraftFunctions] val Ws = java.util.regex.Pattern.compile("\\s+")
  }

  class WsTokensBound extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "ws_tokens"
    override def canonicalName(): String = "graft.ws_tokens"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = IntegerType
    /** `size(split(trim(s), "\\s+"))` semantics, bit-for-bit: SQL trim
      * strips SPACES only (Java's String.trim would also eat tabs/CR
      * and change the count — "\thello" is 2 tokens here, the leading
      * empty string survives a non-space head), and split keeps every
      * empty token (Spark's limit = -1), so a trimmed empty string is
      * one token. The pattern is compiled ONCE — this runs per row
      * inside whole-stage codegen.
      */
    def invoke(s: UTF8String): java.lang.Integer = {
      if (s == null) return null
      var str = s.toString
      var from = 0
      var to = str.length
      while (from < to && str.charAt(from) == ' ') from += 1
      while (to > from && str.charAt(to - 1) == ' ') to -= 1
      str = str.substring(from, to)
      Integer.valueOf(WsTokensBound.Ws.split(str, -1).length)
    }
    override def produceResult(
        row: org.apache.spark.sql.catalyst.InternalRow): java.lang.Integer =
      if (row.isNullAt(0)) null else invoke(row.getUTF8String(0))
  }
}

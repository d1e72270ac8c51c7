package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit bloom runtime filter for big-fact ⋈ filtered-dim joins — the
  * semi-join reduction Spark's AQE applies opportunistically
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), exposed as a
  * deterministic operator (public prior art: Bloom-join, Mackert &
  * Lohman 1986; the reference's analogue is its prefilter stage — a
  * cheap, complete-but-inexact membership gate ahead of the expensive
  * exact stage, `prefiltering.cpp`).
  *
  * Why not just broadcast the dim? A broadcast ships the dim's ROWS
  * (every column, every executor); the bloom ships a FIXED-SIZE bit set
  * (mBits/8 bytes — 16 KiB at the default), so the reduction applies even
  * when the dim is far past the broadcast threshold: fact rows whose key
  * cannot match are dropped BEFORE the fact-side shuffle, which at 100 TB
  * is the dominant cost of the join. False positives ride through to the
  * exact join and die there — the filter is complete (no false
  * negatives), so the join result is exactly the plain join's.
  *
  * Everything is codegen'd SQL expressions — no UDF: the bits land in the
  * plan as an array<bigint> LITERAL (driver state mBits/64 longs, from
  * ONE map-side-combined `bit_or` aggregation of the dim's key
  * contributions — the [[graft.sources.BloomIndex]] build shape with file
  * granularity collapsed to a single global filter), and the probe is k
  * `element_at`+`bitwiseAND` tests. NULL fact keys fail the probe, which
  * matches inner-join semantics (a null key joins nothing).
  */
object RuntimeFilter {

  // the hash-domain mapping is BloomIndex's (one definition, like
  // contribs — build and probe can never fork): integral->long,
  // string->native UTF-8, anything else rejected loudly. The old
  // behavior cast everything to long, and a non-null key whose long
  // cast is null ('abc') made xxhash64 skip the null child and probe
  // seed-only positions — a matching fact row could be dropped.
  private def domainOf(dt: org.apache.spark.sql.types.DataType): String =
    graft.sources.BloomIndex.hashDomainOf(dt)

  /** Global bloom bits of `dim[keyCol]` in its type's hash domain: one
    * aggregation, driver state mBits/64 longs (never the key count).
    */
  def buildBits(dim: DataFrame, keyCol: String, mBits: Int = 1 << 17,
      k: Int = 4): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0 && k >= 1,
      s"bad geometry: mBits=$mBits k=$k")
    val domain = domainOf(dim.schema(keyCol).dataType)
    // the (word, mask) contribution exprs are BloomIndex's — one
    // definition, so a geometry/hash tweak can never fork build vs probe
    val words = dim.select(col(keyCol).cast(domain).as("k"))
      .filter(col("k").isNotNull)
      .select(explode(graft.sources.BloomIndex.contribs(mBits, k)).as("c"))
      .groupBy(col("c.w").as("w")).agg(bit_or(col("c.m")).as("bits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Array.tabulate(mBits / 64)(w => words.getOrElse(w, 0L))
  }

  /** Codegen'd membership probe against literal bits (1-based
    * `element_at`; word = pos >> 6, bit = pos & 63). `domain` is REQUIRED
    * and must be the build side's hash domain ("long" or "string") — a
    * defaulted "long" would silently reintroduce the seed-only-probe
    * false negative for string-key bits the moment a caller forgot it;
    * within the right domain the cast is identity-or-widening, so a
    * non-null key can never turn null under it.
    */
  def mightContain(key: Column, bits: Array[Long], domain: String,
      k: Int = 4): Column = {
    require(domain == "long" || domain == "string", s"bad domain: $domain")
    val mBits = bits.length * 64
    val arr = typedLit(bits)
    // the explicit isNotNull guard is load-bearing: xxhash64 SKIPS null
    // children (hashing only the seed), so without it a null key would
    // probe deterministic positions and could pass on a dense filter
    key.isNotNull && (0 until k).map { s =>
      val pos = pmod(xxhash64(key.cast(domain), lit(s)), lit(mBits.toLong))
      val word = element_at(arr, (shiftright(pos, 6) + 1).cast("int"))
      word.bitwiseAND(call_function("shiftleft", lit(1L),
        pos.bitwiseAND(63).cast("int"))) =!= 0
    }.reduce(_ && _)
  }

  /** `fact ⋈ dim` on `factKey = dimKey`, with fact rows pre-filtered by
    * the dim key set's bloom BEFORE the fact-side shuffle. Result is
    * exactly the inner join's (the exact condition re-applies; the bloom
    * only removes rows that cannot match). Both key columns must share a
    * hash domain (integral×integral or string×string — enforced), since
    * a cross-domain equality would hash the two sides differently.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, mBits: Int = 1 << 17, k: Int = 4): DataFrame = {
    val domain = domainOf(dim.schema(dimKey).dataType)
    require(domainOf(fact.schema(factKey).dataType) == domain,
      s"bloomSemiJoin key domains differ: fact.$factKey is " +
        s"${fact.schema(factKey).dataType.simpleString}, dim.$dimKey is " +
        s"${dim.schema(dimKey).dataType.simpleString}")
    val bits = buildBits(dim, dimKey, mBits, k)
    val reduced = fact.filter(mightContain(col(factKey), bits, domain, k))
    // same-named keys would make col(factKey) === col(dimKey) ambiguous;
    // join USING in that case (merging the key column, the usual shape)
    if (factKey == dimKey) reduced.join(dim, Seq(factKey))
    else reduced.join(dim, reduced(factKey) === dim(dimKey))
  }
}

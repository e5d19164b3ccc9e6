package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking in one native pass (the Rabin-boundary family:
  * Muthitacharoen et al. 2001 "A low-bandwidth network file system" §3.1;
  * FastCDC, Xia et al. 2016): cut a document where a rolling window hash
  * hits a fixed bit pattern, so chunk boundaries follow CONTENT, not
  * offsets — inserting a sentence at the top of a page shifts every
  * fixed-window n-gram but leaves all later CDC boundaries (and so the
  * chunks' hashes) unchanged. That shift resilience is what makes exact
  * sub-document dedup work on boilerplate-wrapped reposts where the
  * wrapper moves the payload by a few bytes.
  *
  * Contract (the DuckDB oracle replays it step for step):
  *  - positions are 1-based UNICODE CODEPOINT indices (DuckDB `substr`/
  *    `ord` semantics — the house hashing convention);
  *  - window hash at position i (defined for i ≥ `window`): the seeded
  *    131-fold `h ← (131·h + cp) mod P` over codepoints [i−window+1, i],
  *    P = 2³¹−1;
  *  - i is a CANDIDATE boundary iff `h mod 2^avgBits == 2^avgBits − 1`
  *    (expected chunk length ≈ 2^avgBits);
  *  - chunks are greedy: a chunk starting at `start` ends at the smallest
  *    candidate p with `p − start + 1 ≥ minLen`, forced at
  *    `start + maxLen − 1`, clamped to the document end (the final
  *    remainder chunk may be shorter than minLen);
  *  - each chunk's `hash` is the seeded 131-fold over its own codepoints
  *    — the dedup identity.
  *
  * Output: array<struct<start int, len int, hash bigint>> (empty for an
  * empty string). One pass, no intermediate arrays — the hot-path-fold
  * discipline (NgramBucketHashes is the model). */
case class CdcChunks(child: Expression, window: Int, avgBits: Int,
                     minLen: Int, maxLen: Int, seed: Long)
    extends UnaryExpression {
  require(window >= 1, s"window must be >= 1, got $window")
  require(avgBits >= 1 && avgBits <= 30, s"avgBits must be in [1,30], got $avgBits")
  require(minLen >= 1, s"minLen must be >= 1, got $minLen")
  require(maxLen >= minLen, s"maxLen ($maxLen) must be >= minLen ($minLen)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(v: Any): Any =
    CdcChunks.compute(v.asInstanceOf[UTF8String], window, avgBits, minLen,
      maxLen, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CdcChunks.compute($v, $window, " +
        s"$avgBits, $minLen, $maxLen, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  private val P = 2147483647L

  /** Plain-Scala executable specification over a codepoint array — the
    * reference the native pass is bit-parity-pinned against (and the
    * mirror of the oracle's list_reduce replay). */
  private[graft] def chunksRef(cps: Array[Int], window: Int, avgBits: Int,
                               minLen: Int, maxLen: Int,
                               seed: Long): Seq[(Int, Int, Long)] = {
    val n = cps.length
    if (n == 0) return Seq.empty
    val s0 = ((seed % P) + P) % P
    val mask = (1L << avgBits) - 1L
    // candidate positions (1-based): full-window hash hits the pattern
    val cand = (window to n).filter { i =>
      var h = s0
      var j = i - window
      while (j < i) { h = (h * 131L + cps(j)) % P; j += 1 }
      (h & mask) == mask
    }
    def chunkHash(start: Int, end: Int): Long = {
      var h = s0
      var j = start - 1
      while (j < end) { h = (h * 131L + cps(j)) % P; j += 1 }
      h
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var start = 1
    while (start <= n) {
      val lo = start + minLen - 1
      val hi = start + maxLen - 1
      val p = math.min(n,
        cand.find(c => c >= lo && c <= hi).getOrElse(hi))
      out += ((start, p - start + 1, chunkHash(start, p)))
      start = p + 1
    }
    out.toSeq
  }

  /** The one-pass production form: the window hash updates INCREMENTALLY
    * (`h_i = (131·h_{i−1} + c_i − c_{i−W}·131^W) mod P` — constant work
    * per position instead of the reference's re-walked window), chunk
    * hashes accumulate as a running fold reset at each cut, and
    * boundaries are decided in stream order with the same greedy rule.
    * Bit-identical to [[chunksRef]] (CdcParitySpec pins it on random
    * multi-byte inputs). */
  def compute(s: UTF8String, window: Int, avgBits: Int, minLen: Int,
              maxLen: Int, seed: Long): ArrayData = {
    val str = s.toString
    val nChars = str.codePointCount(0, str.length)
    val cps = new Array[Int](nChars)
    var ci = 0
    var si = 0
    while (si < str.length) {
      val cp = str.codePointAt(si)
      cps(ci) = cp
      ci += 1
      si += Character.charCount(cp)
    }
    val n = nChars
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val s0 = ((seed % P) + P) % P
    val mask = (1L << avgBits) - 1L
    // 131^window mod P, and the seed's contribution after `window` shifts
    // (the window fold starts from s0, so position i's hash carries
    // s0·131^window; the incremental form keeps it because both h_{i-1}
    // and the subtraction term are window-relative)
    var powW = 1L
    var k = 0
    while (k < window) { powW = (powW * 131L) % P; k += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 1 // 1-based codepoint index of the current chunk start
    var chunkH = s0 // running fold of the current chunk
    var winH = s0 // rolling window fold (seeded, over the last `window` cps)
    var i = 1
    var cut = false
    while (i <= n) {
      val cp = cps(i - 1)
      chunkH = (chunkH * 131L + cp) % P
      winH = (winH * 131L + cp) % P
      if (i > window) {
        // h_ref(i) = 131·h_ref(i−1) + c_i − c_{i−W}·131^W − 130·s0·131^W
        // (mod P): shifting the previous window hash moves the seed to
        // 131^(W+1), so besides the leaving codepoint the seed's excess
        // share (131·s0 − s0)·131^W must come off too
        val leaving = cps(i - window - 1)
        winH = ((winH - leaving.toLong % P * powW % P) % P + P) % P
        winH = ((winH - s0 * 130L % P * powW % P) % P + P) % P
      }
      val len = i - start + 1
      cut = false
      if (i == n) cut = true
      else if (len >= maxLen) cut = true
      else if (len >= minLen && i >= window && (winH & mask) == mask) cut = true
      if (cut) {
        out += InternalRow(start, len, chunkH)
        start = i + 1
        chunkH = s0
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

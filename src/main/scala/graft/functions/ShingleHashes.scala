package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass DISTINCT shingle-hash set — the verify-side substrate of
  * the dedup family (Jaccard over 64-bit double-murmur shingle hashes: the
  * cross-corpus verify join, the persisted dedup index's `shingles` table).
  * Replaces the Scala UDF around [[graft.llm.TextOps.shingleHashSet]] whose
  * per-shingle substring and boxed `HashSet[Long]` dominated the
  * incoming-batch cost of `dedup_against` (the same UDF→native shape as
  * [[MinHashSignature]]). Bit-parity with the UDF — including element ORDER
  * (first occurrence) — is pinned in MinHashParitySpec; the normalization /
  * windowing / hash contract is [[MinHashSignature]]'s, shared code.
  *
  * Dedup uses an open-addressing primitive-long table (zero = empty slot;
  * the all-zero hash, reachable only by a 1-in-2⁶⁴ murmur coincidence, is
  * tracked by a flag) — no boxing, no rehash churn (capacity is sized to
  * the window count up front). */
case class ShingleHashSet(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      ShingleHashes.distinctHashes(v.asInstanceOf[UTF8String], shingleSize))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleHashes.distinctHashes($v, $shingleSize));")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** Native 64-bit SimHash over the DISTINCT shingle-hash set: per-bit sign
  * vote across the set's hashes (Charikar 2002). Same shingle substrate as
  * [[ShingleHashSet]]; bit-parity with the UDF form pinned in
  * MinHashParitySpec — the signature VALUES matter because the streaming
  * near-dup suppressor bands them ([[graft.streaming.StreamingDedup]]). */
case class SimHash64(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    ShingleHashes.simHash(v.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleHashes.simHash($v, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object ShingleHashes {

  /** Distinct 64-bit shingle hashes in FIRST-OCCURRENCE order — exactly the
    * UDF's `java.util.HashSet.add` + builder composition. */
  def distinctHashes(s: UTF8String, shingleSize: Int): Array[Long] = {
    val (cs, m) = MinHashSignature.normalizedChars(s)
    if (m < shingleSize) return Array.emptyLongArray
    val nSh = m - shingleSize + 1
    // open addressing, power-of-two capacity ≥ 2·windows (load ≤ 0.5)
    var cap = 4
    while (cap < nSh * 2) cap <<= 1
    val table = new Array[Long](cap)
    var seenZero = false
    val out = new Array[Long](nSh)
    var k = 0
    var j = 0
    while (j < nSh) {
      val h = MinHashSignature.windowHash64(cs, j, shingleSize)
      if (h == 0L) {
        if (!seenZero) { seenZero = true; out(k) = 0L; k += 1 }
      } else {
        var idx = (scala.util.hashing.byteswap64(h) & (cap - 1)).toInt
        while (table(idx) != 0L && table(idx) != h) idx = (idx + 1) & (cap - 1)
        if (table(idx) == 0L) { table(idx) = h; out(k) = h; k += 1 }
      }
      j += 1
    }
    if (k == nSh) out else java.util.Arrays.copyOf(out, k)
  }

  /** Sign-vote SimHash over [[distinctHashes]]. */
  def simHash(s: UTF8String, shingleSize: Int): Long = {
    val hs = distinctHashes(s, shingleSize)
    val counts = new Array[Int](64)
    var j = 0
    while (j < hs.length) {
      var b = 0
      while (b < 64) {
        if (((hs(j) >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass feature-hashing embedding: the L2-normalized signed
  * token-count vector of a whitespace tokenization, as ARRAY<DOUBLE>.
  *
  * Replaces [[graft.llm.TextOps]]'s declarative scatter-accumulate —
  * `aggregate(tokens, zeroVec, (acc, t) → transform(acc, per-slot when))` —
  * which evaluated O(dim × tokens) interpreted lambdas and allocated a
  * fresh dim-length array per token (the heaviest map-only op left in the
  * 10×-corpus profile at ~0.07 ms/doc; the comparable codegen filters run
  * at ~0.015). One compiled pass brings it into the native kernel family
  * (CLAUDE.md convention; the declarative form survives as
  * `TextOps.hashEmbedReference`, the executable specification the DuckDB
  * oracle replays — HashEmbedParity in QualityCurationSpec pins bit
  * equality).
  *
  * Bit-parity contract with the declarative form:
  *  - token hashes: exactly [[NgramBucketHashes]] in raw-unigram mode
  *    (numBuckets 0, bigrams off) — the same fold the oracle's
  *    `list_reduce` replays; the caller lowercases/trims OUTSIDE;
  *  - slot: `(h >> 1) mod dim`; sign: `+1` when `h mod 2 == 0` else `-1`
  *    (h is already in [0, P) so pmod ≡ %);
  *  - counts accumulate as longs in token order;
  *  - norm: left-to-right double fold of `x·x` in slot order (the long
  *    square widens to double exactly as Spark's `acc + x*x`), then
  *    `sqrt`; a zero norm (no tokens, or exact cancellation) emits the
  *    raw casts — identical to the declarative `when(n > 0, …)` guard. */
case class HashEmbedVector(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "hash_embed_vector"

  override protected def nullSafeEval(v: Any): Any =
    HashEmbedVector.compute(v.asInstanceOf[UTF8String], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HashEmbedVector.compute($v, $dim, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbedVector =
    copy(child = newChild)
}

object HashEmbedVector {

  def compute(s: UTF8String, dim: Int, seed: Long): ArrayData = {
    val hashes = NgramBucketHashes.compute(s, 0, seed, bigrams = false)
    val counts = new Array[Long](dim)
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      val h = hashes.getLong(i)
      val b = ((h >> 1) % dim).toInt
      counts(b) += (if (h % 2 == 0) 1L else -1L)
      i += 1
    }
    // left-to-right double accumulation in slot order — the exact
    // association of the declarative aggregate(r, 0.0, (a,x) -> a + x*x)
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += (counts(j) * counts(j)).toDouble; j += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](dim)
    j = 0
    if (norm > 0) while (j < dim) { out(j) = counts(j).toDouble / norm; j += 1 }
    else while (j < dim) { out(j) = counts(j).toDouble; j += 1 }
    new GenericArrayData(out)
  }
}

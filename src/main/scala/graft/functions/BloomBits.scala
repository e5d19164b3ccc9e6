package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Immutable bit-array view of a built Bloom filter, carried into
  * [[BloomContains]] as a plan reference object (the [[BpeEncodeWord]]
  * `BpeRanks` discipline: a named wrapper class so `addReferenceObj` has a
  * Java-nameable type — `long[]`'s JVM name `[J` cannot appear in generated
  * code). Position derivation lives in [[graft.llm.BloomOps.positions]];
  * this class only tests bits. */
final class BloomWords(val words: Array[Long], val mBits: Long, val k: Int,
                       val seed: Long) extends Serializable {
  def testBit(pos: Long): Boolean =
    (words((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L
}

/** Native Bloom-filter bit-array aggregate: ORs the k hash positions of
  * every input row into one fixed-size `ARRAY<BIGINT>` word array.
  *
  * Scale design: this is the BUILD side of the bounded-memory
  * cross-corpus exact-dedup gate ([[graft.llm.BloomOps]]). The whole point
  * of a Bloom gate at 100 TB is that the historical corpus reduces to a
  * fixed `mBits`-bit array the cluster can broadcast — so the aggregation
  * buffer is that array itself: `update` sets bits partition-locally
  * (map-side combine — each task touches its own word array, no per-row
  * state growth), `merge` is a word-wise OR (associative, commutative,
  * order-independent), and the single output row IS the model. Buffer
  * memory per task = mBits/8 bytes, chosen by the caller against executor
  * memory exactly like any Bloom sizing (1 GiB of bits handles ~10⁹ items
  * at 1% fpp with k=7); the driver collect of the one result row is the
  * bounded model collect documented in ARCHITECTURE.md.
  *
  * Input: `ARRAY<BIGINT>` of positions, each already reduced mod mBits
  * (see `BloomOps.positionsCol` — pure codegen arithmetic on the mixer the
  * DuckDB oracle replays). Null rows are skipped (null text upstream). */
case class BloomBitsAgg(child: Expression, mBits: Long,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(mBits >= 64 && mBits <= (1L << 33),
    s"mBits must be in [64, 2^33] (8 B .. 1 GiB of bit-array), got $mBits")

  private val numWords: Int = ((mBits + 63L) >>> 6).toInt

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val pos = arr.getLong(i)
        b((pos >>> 6).toInt) |= (1L << (pos & 63L))
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(numWords * 8)
    var i = 0
    while (i < numWords) { buf.putLong(b(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = new Array[Long](numWords)
    var i = 0
    while (i < numWords) { out(i) = buf.getLong; i += 1 }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT> positions, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "bloom_bits"

  override def withNewMutableAggBufferOffset(offset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): BloomBitsAgg =
    copy(child = newChild)
}

/** Native Bloom membership test: `fingerprint BIGINT → BOOLEAN`, the
  * SCORING side of the cross-corpus exact-dedup gate.
  *
  * The bit array rides as a plan reference object (not a literal, not a
  * join side), so scoring is a pure map-only projection that fuses into
  * the preceding scan — no exchange, no state, streaming-safe. Position
  * derivation is the same double-hash mixer arithmetic the build side and
  * the DuckDB oracle use ([[graft.llm.BloomOps.positions]] is the single
  * owner); BloomOpsSpec pins expression ≡ Scala spec ≡ Column-arithmetic
  * replay on randomized fingerprints. Short-circuits on the first clear
  * bit (the common case for non-duplicates). */
case class BloomContains(child: Expression, bloom: BloomWords)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT fingerprint, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(v: Any): Any =
    BloomContains.contains(v.asInstanceOf[Long], bloom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", bloom, classOf[BloomWords].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BloomContains.contains($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {

  /** All k positions set ⇒ maybe-member. Delegates position math to
    * [[graft.llm.BloomOps.positions]]-equivalent inline arithmetic (same
    * constants; BloomOpsSpec pins the equality) so the hot loop allocates
    * nothing. */
  def contains(fp: Long, b: BloomWords): Boolean = {
    val h1 = graft.llm.BloomOps.mix(fp, b.seed)
    val h2 = graft.llm.BloomOps.mix(graft.llm.BloomOps.pmodP2(fp), b.seed + 1L)
    var i = 0
    while (i < b.k) {
      val pos = (h1 + i.toLong * h2) % b.mBits
      if (!b.testBit(pos)) return false
      i += 1
    }
    true
  }
}

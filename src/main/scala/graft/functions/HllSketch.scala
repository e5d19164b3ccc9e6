package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** HyperLogLog register aggregation (Flajolet-Fuster-Gandouet-Meunier 2007
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm"; stochastic-averaging register layout per Heule-Nunkesser-Hall
  * 2013 "HyperLogLog in practice"). The input is a UNIFORM integer hash
  * (`xxhash64(value)` on the production path; the 31-bit LCG mixer on the
  * oracle-replay path): the top `p` hash bits pick one of `m = 2^p`
  * registers, and the register keeps the MAXIMUM of
  * `rho(w) = (#leading zero bits of the remaining hashBits-p bits) + 1`.
  * The register array is the entire state: update is a byte max, merge is
  * an elementwise byte max — associative, commutative, idempotent — so the
  * merged sketch of any sharding equals the whole-corpus sketch EXACTLY
  * (register-for-register, not just in expectation; HllSketchSpec pins
  * this), which is what makes the summary safe to persist per shard and
  * union later.
  *
  * Scale story — the distinct-count problem ("how many unique users /
  * tokens / n-grams per source?") is otherwise a `distinct` whose exchange
  * cardinality IS the answer: at 100 TB the shuffle carries every unique
  * key. Here each partition folds into `m` bytes map-side (this class is
  * partial-aggregation capable), ONE `m`-byte buffer per (partition,
  * group) crosses the exchange, and the estimate — standard error
  * `1.04/sqrt(m)`, ~2% at p=12 — reads off the merged registers. Shuffle
  * volume is independent of both row count and cardinality.
  *
  * eval returns the registers as `array<int>` (length m) — the
  * persistable, mergeable form consumed by
  * [[graft.llm.CardinalityOps.hllEstimate]] and [[HllMergeRegisters]].
  * Null hashes are skipped. */
case class HllRegisters(child: Expression, p: Int, hashBits: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  require(hashBits > p && hashBits <= 64, s"hashBits must be in (p,64], got $hashBits")

  private val m = 1 << p
  private val suffixBits = hashBits - p
  private val suffixMask = if (suffixBits == 64) -1L else (1L << suffixBits) - 1L

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // top p bits (within the declared hash width) select the register
      val bucket = ((h >>> suffixBits) & (m - 1)).toInt
      val w = h & suffixMask
      val rho =
        if (w == 0L) suffixBits + 1
        else suffixBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): HllRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
  override def prettyName: String = "hll_registers"
}

/** Merge already-materialized HLL register arrays (the persisted-shard
  * path): input rows are `array<int>` registers from [[HllRegisters]];
  * the result is their elementwise max — by the max-merge identity,
  * exactly the sketch a single pass over the union of the shards' inputs
  * would have produced. */
case class HllMergeRegisters(child: Expression, p: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == m,
        s"register array has ${arr.numElements()} entries, sketch expects $m")
      var i = 0
      while (i < m) {
        val r = arr.getInt(i)
        if (r > buf(i)) buf(i) = r.toByte
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): HllMergeRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMergeRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeRegisters =
    copy(child = newChild)
  override def prettyName: String = "hll_merge_registers"
}

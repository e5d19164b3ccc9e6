package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count-Min sketch register aggregation (Cormode & Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications"): a `d × w` counter matrix; each input item increments
  * one counter per row, the point-frequency estimate is the MINIMUM of
  * its `d` counters — always an overcount, within `ε·N` (ε = e/w) with
  * probability `1 − e^(−d)`. Where the frequent-items sketch
  * ([[SpaceSavingTopK]]) answers "which tokens are the top-k", this
  * answers "how often does THIS token occur" for any token, without
  * vocabulary-sized state.
  *
  * The input is the token's 131-polynomial rolling hash in `[0, P)`
  * ([[NgramBucketHashes]] raw mode — the oracle-replayable path); row
  * `i`'s counter index is the 31-bit LCG mixer (the [[graft.llm
  * .SampleOps.hashBucket]] construction, constants duplicated here and
  * parity-pinned in CmSketchSpec) over the entity `hash·d + i`, reduced
  * mod `w` — so every engine replays the exact counters with BIGINT-safe
  * arithmetic (`max intermediate < P·48271 < 2^47`).
  *
  * Update is `d` integer increments, merge is elementwise SUM —
  * associative and commutative, so the merged sketch of any sharding
  * equals the whole-corpus sketch EXACTLY (counter-for-counter; the
  * identity CmSketchSpec pins), making per-shard persistence safe.
  *
  * Scale story: exact per-token counts are a groupBy whose exchange
  * cardinality is the vocabulary (10⁸⁺ on raw web text). Here every
  * partition folds its occurrences into `d·w` longs map-side (this class
  * is partial-aggregation capable), ONE buffer per (partition, group)
  * crosses the exchange, and any token's estimate reads off the merged
  * array. Shuffle volume is independent of corpus size and vocabulary.
  *
  * eval returns the counters as `array<long>` (length d·w, row-major) —
  * the persistable, mergeable form consumed by [[CmMergeRegisters]] and
  * the query path. Null hashes are skipped. */
case class CmRegisters(child: Expression, d: Int, w: Int, seed: Long,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(d >= 1 && d <= 16, s"d must be in [1,16], got $d")
  require(w >= 2, s"w must be >= 2, got $w")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < d) {
        buf(i * w + CountMinSketch.bucketOf(h, i, d, w, seed)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): CmRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CmRegisters =
    copy(child = newChild)
  override def prettyName: String = "cm_registers"
}

/** Merge already-materialized Count-Min counter arrays (the persisted-
  * shard path): elementwise sum — by linearity exactly the sketch a
  * single pass over the union of the shards' inputs would produce. */
case class CmMergeRegisters(child: Expression, d: Int, w: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(d >= 1 && d <= 16, s"d must be in [1,16], got $d")
  require(w >= 2, s"w must be >= 2, got $w")
  private val n = d * w

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == n,
        s"counter array has ${arr.numElements()} entries, sketch expects $n")
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): CmMergeRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmMergeRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CmMergeRegisters =
    copy(child = newChild)
  override def prettyName: String = "cm_merge_registers"
}

object CountMinSketch {
  /** P and the Knuth multiplier — MUST stay equal to
    * [[graft.llm.SampleOps]]'s mixer constants (CmSketchSpec pins the
    * parity against `SampleOps.hashBucket` on random entities). */
  private val P = 2147483647L
  private val Mult = 2654435761L % P

  /** Counter column for sketch row `i`: the 31-bit LCG mixer over the
    * entity `h·d + i`, reduced mod `w` — BIGINT-exact in any engine. */
  def bucketOf(h: Long, i: Int, d: Int, w: Int, seed: Long): Int = {
    val ent = h * d + i
    val s0 = ((seed % P) + P) % P
    var x = (((ent % P) + P) % P * Mult + s0) % P
    var r = 0
    while (r < 3) {
      x = ((x ^ (x >>> 16)) * 48271L) % P
      r += 1
    }
    (x % w).toInt
  }
}

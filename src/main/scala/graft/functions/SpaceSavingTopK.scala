package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items sketch state: token → estimated count, a global error
  * offset accumulated by purges, and the exact stream length. Keys are
  * defensively-copied UTF8Strings (Spark reuses row buffers). */
final class FreqSketchState(var n: Long, var offset: Long,
                            val counts: java.util.HashMap[UTF8String, Array[Long]])

/** Mergeable frequent-items (heavy hitters) sketch over token arrays —
  * the Misra-Gries / Space-Saving family (Misra & Gries 1982; Metwally
  * et al. 2005 "Efficient computation of frequent and top-k elements in
  * data streams"; merge per Agarwal et al. 2012 "Mergeable summaries"),
  * batch-purge formulation: when the map exceeds `capacity`, subtract the
  * MEDIAN stored count from every entry, drop the non-positive, and add
  * the median to a global error offset. Each purge halves the map, so
  * update cost is amortized O(1) per token and the guarantee is
  * `|stored − true| ≤ offset` with `offset ≤ 2·n/capacity` (each purge's
  * subtracted mass ≥ median·capacity/2 is charged against the stream).
  *
  * Scale story — this is [[graft.llm.TextOps.topTokens]]' 100 TB path:
  * the exact op explodes the corpus and groupBys the TOKEN, an exchange
  * whose cardinality is the vocabulary (raw web text: 10⁸⁺ types,
  * hapax-dominated). Here the corpus is consumed MAP-SIDE into one
  * bounded sketch per partition and only `capacity` counters cross the
  * single-partition exchange — the shuffle no longer scales with the
  * vocabulary at all. When `capacity` ≥ the true vocabulary no purge
  * ever fires, `offset` stays 0, and the sketch IS the exact answer
  * (the regime the driver row runs in, sharing top_tokens' oracle);
  * in the approximate regime results depend on partition layout like
  * any mergeable sketch, but the `offset` bound always holds.
  *
  * eval returns a struct (n, err, toks: array<struct<token,cnt>>) with
  * toks the top-k by (cnt DESC, token ASC binary) — deterministic given
  * the map contents. */
case class SpaceSavingTopK(child: Expression, k: Int, capacity: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketchState] with UnaryLike[Expression] {
  require(k >= 1, s"k must be >= 1, got $k")
  require(capacity >= math.max(2, k),
    s"capacity must be >= max(2, k), got capacity=$capacity k=$k")

  override def createAggregationBuffer(): FreqSketchState =
    new FreqSketchState(0L, 0L, new java.util.HashMap[UTF8String, Array[Long]]())

  private def bump(b: FreqSketchState, tok: UTF8String, by: Long): Unit = {
    val cur = b.counts.get(tok)
    if (cur != null) cur(0) += by
    else b.counts.put(tok.clone(), Array(by))
  }

  /** Subtract the median count from every entry, drop non-positive
    * entries, accumulate the median into the error offset. Runs only
    * when size > capacity; removes at least half the entries. */
  private def purge(b: FreqSketchState): Unit = {
    val vals = new Array[Long](b.counts.size)
    val it0 = b.counts.values().iterator()
    var i = 0
    while (it0.hasNext) { vals(i) = it0.next()(0); i += 1 }
    java.util.Arrays.sort(vals)
    val median = vals(vals.length / 2)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0) - median
      if (c <= 0L) it.remove() else e.getValue()(0) = c
    }
    b.offset += median
  }

  override def update(b: FreqSketchState, input: InternalRow): FreqSketchState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val len = arr.numElements()
      while (i < len) {
        if (!arr.isNullAt(i)) {
          // new entries enter at 1 (classical Misra-Gries): stored counts
          // are UNDER-estimates built purely from real stream mass, so
          // every purge's subtracted mass ≥ median·size/2 charges against
          // n and the offset stays ≤ ~2n/capacity. (Entering at offset+1
          // instead injects phantom mass the next median re-subtracts —
          // the offset then DOUBLES per purge.) A token evicted by earlier
          // purges lost at most `offset` real mass, so the invariant is
          // true − offset ≤ stored ≤ true.
          val tok = arr.getUTF8String(i)
          val cur = b.counts.get(tok)
          if (cur != null) cur(0) += 1L
          else {
            b.counts.put(tok.clone(), Array(1L))
            if (b.counts.size > capacity) purge(b)
          }
          b.n += 1L
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: FreqSketchState, o: FreqSketchState): FreqSketchState = {
    b.n += o.n
    b.offset += o.offset
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bump(b, e.getKey, e.getValue()(0))
    }
    if (b.counts.size > capacity) purge(b)
    b
  }

  override def eval(b: FreqSketchState): Any = {
    val entries = new Array[(UTF8String, Long)](b.counts.size)
    val it = b.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0))
      i += 1
    }
    val sorted = entries.sortWith { case ((ta, ca), (tb, cb)) =>
      if (ca != cb) ca > cb else ta.compareTo(tb) < 0
    }
    val top = sorted.take(k).map { case (t, c) =>
      InternalRow(t, c)
    }
    InternalRow(b.n, b.offset, new GenericArrayData(top.asInstanceOf[Array[Any]]))
  }

  override def serialize(b: FreqSketchState): Array[Byte] = {
    var bytes = 0
    val it0 = b.counts.keySet().iterator()
    while (it0.hasNext) bytes += 4 + it0.next().numBytes() + 8
    val buf = ByteBuffer.allocate(8 + 8 + 4 + bytes)
    buf.putLong(b.n)
    buf.putLong(b.offset)
    buf.putInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes
      buf.putInt(tb.length)
      buf.put(tb)
      buf.putLong(e.getValue()(0))
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong
    val offset = buf.getLong
    val size = buf.getInt
    val m = new java.util.HashMap[UTF8String, Array[Long]](size * 2)
    var i = 0
    while (i < size) {
      val len = buf.getInt
      val tb = new Array[Byte](len)
      buf.get(tb)
      m.put(UTF8String.fromBytes(tb), Array(buf.getLong))
      i += 1
    }
    new FreqSketchState(n, offset, m)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("toks", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false))))

  override def nullable: Boolean = false

  override def prettyName: String = "space_saving_top_k"

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}

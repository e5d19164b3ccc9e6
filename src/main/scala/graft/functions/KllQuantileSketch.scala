package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Quantile-sketch state: `levels(h)` holds items of weight `2^h`,
  * `parities(h)` is the alternating compaction offset for level `h`
  * (deterministic stand-in for the random coin), `n` the exact stream
  * length, and `err` the accumulated worst-case rank-error bound. */
final class KllSketchState(var n: Long, var err: Long,
                           val levels: ArrayBuffer[ArrayBuffer[Double]],
                           val parities: ArrayBuffer[Int])

/** Mergeable rank/quantile sketch over doubles — the compactor-hierarchy
  * family (Manku-Rajagopalan-Lindsay 1998; Karnin-Lang-Liberty 2016
  * "Optimal quantile approximation in streams"; merge per Agarwal et al.
  * 2012 "Mergeable summaries"). Level `h` stores items of weight `2^h`;
  * when a level exceeds `capacity` it is sorted and every other item is
  * promoted (at doubled weight) to the level above. Compacting an
  * even-length sorted run of weight-`w` items shifts any rank query by at
  * most `w`, so the sketch carries the EXPLICIT bound
  * `err = Σ 2^h per compaction at level h`: for every stored item, its
  * estimated rank (cumulative weight in value order) is within `err` of
  * its true rank. The coin is deterministic (per-level alternating
  * parity), so a fixed partition layout replays bit-identically.
  *
  * Scale story — this is [[graft.llm.QuantileOps]]' streaming/monitoring
  * path: the exact two-phase histogram selection needs the full batch; a
  * score DISTRIBUTION over a 100 TB corpus (or an unbounded ingest
  * stream) wants a bounded mergeable summary instead. Each partition
  * folds its scores map-side into `O(capacity · log(n/capacity))`
  * doubles, ONE serialized buffer per partition crosses the single
  * exchange, and the merged summary answers every quantile at once —
  * shuffle volume independent of corpus size. With `capacity` ≥ the
  * total count no compaction ever fires, `err` stays 0, and the summary
  * IS the sorted input — the regime the driver rows hash-gate against an
  * order-statistics oracle; in the approximate regime estimates are
  * partition-layout dependent (like any mergeable sketch) but the `err`
  * bound always holds (KllSketchSpec checks it against true ranks).
  *
  * Memory: levels hold ≤ `capacity` items each, ~`log2(n/capacity)`
  * levels — at capacity 16384 and n = 10^12, ~27 levels ≈ 3.5 MB of
  * doubles per aggregation buffer. Null and NaN inputs are skipped (a
  * NaN score is a broken signal, not a rankable one).
  *
  * eval returns (n, err, items: array<struct<v, w>>) with items sorted
  * by value ascending — deterministic given the sketch contents. */
case class KllQuantileSketch(child: Expression, capacity: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketchState] with UnaryLike[Expression] {
  require(capacity >= 2, s"capacity must be >= 2, got $capacity")

  override def createAggregationBuffer(): KllSketchState =
    new KllSketchState(0L, 0L, ArrayBuffer(ArrayBuffer.empty[Double]), ArrayBuffer(0))

  private def ensureLevel(b: KllSketchState, h: Int): Unit =
    while (b.levels.length <= h) { b.levels += ArrayBuffer.empty[Double]; b.parities += 0 }

  /** Sort level `h`; if odd-sized, the smallest item stays put; promote
    * alternating items of the even remainder (starting at the level's
    * flipping parity offset) to level `h+1` at doubled weight. Adds
    * `2^h` to the rank-error bound; cascades upward while over capacity. */
  private def compact(b: KllSketchState, h: Int): Unit = {
    val buf = b.levels(h)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val start = arr.length % 2 // odd: keep arr(0) at this level
    ensureLevel(b, h + 1)
    val up = b.levels(h + 1)
    var i = start + b.parities(h)
    while (i < arr.length) { up += arr(i); i += 2 }
    b.parities(h) = 1 - b.parities(h)
    buf.clear()
    if (start == 1) buf += arr(0)
    b.err += (1L << h)
    if (up.length > capacity) compact(b, h + 1)
  }

  override def update(b: KllSketchState, input: InternalRow): KllSketchState = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) {
        b.levels(0) += d
        b.n += 1L
        if (b.levels(0).length > capacity) compact(b, 0)
      }
    }
    b
  }

  override def merge(b: KllSketchState, o: KllSketchState): KllSketchState = {
    b.n += o.n
    b.err += o.err
    var h = 0
    while (h < o.levels.length) {
      if (o.levels(h).nonEmpty) {
        ensureLevel(b, h)
        b.levels(h) ++= o.levels(h)
      }
      h += 1
    }
    h = 0
    while (h < b.levels.length) {
      if (b.levels(h).length > capacity) compact(b, h)
      h += 1
    }
    b
  }

  override def eval(b: KllSketchState): Any = {
    var total = 0
    var h = 0
    while (h < b.levels.length) { total += b.levels(h).length; h += 1 }
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    var i = 0
    h = 0
    while (h < b.levels.length) {
      val w = 1L << h
      val lvl = b.levels(h)
      var j = 0
      while (j < lvl.length) { vs(i) = lvl(j); ws(i) = w; i += 1; j += 1 }
      h += 1
    }
    // sort (value, weight) pairs by value ascending
    val idx = Array.range(0, total).sortBy(vs(_))
    val items = idx.map { j => InternalRow(vs(j), ws(j)) }
    InternalRow(b.n, b.err, new GenericArrayData(items.asInstanceOf[Array[Any]]))
  }

  override def serialize(b: KllSketchState): Array[Byte] = {
    var bytes = 8 + 8 + 4
    var h = 0
    while (h < b.levels.length) { bytes += 4 + 4 + 8 * b.levels(h).length; h += 1 }
    val buf = ByteBuffer.allocate(bytes)
    buf.putLong(b.n)
    buf.putLong(b.err)
    buf.putInt(b.levels.length)
    h = 0
    while (h < b.levels.length) {
      buf.putInt(b.parities(h))
      buf.putInt(b.levels(h).length)
      val lvl = b.levels(h)
      var j = 0
      while (j < lvl.length) { buf.putDouble(lvl(j)); j += 1 }
      h += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KllSketchState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong
    val err = buf.getLong
    val nLevels = buf.getInt
    val levels = new ArrayBuffer[ArrayBuffer[Double]](nLevels)
    val parities = new ArrayBuffer[Int](nLevels)
    var h = 0
    while (h < nLevels) {
      parities += buf.getInt
      val size = buf.getInt
      val lvl = new ArrayBuffer[Double](size)
      var j = 0
      while (j < size) { lvl += buf.getDouble; j += 1 }
      levels += lvl
      h += 1
    }
    if (nLevels == 0) { levels += ArrayBuffer.empty[Double]; parities += 0 }
    new KllSketchState(n, err, levels, parities)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false))))

  override def nullable: Boolean = false

  override def prettyName: String = "kll_quantile_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantileSketch =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KllQuantileSketch =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): KllQuantileSketch =
    copy(child = newChild)
}

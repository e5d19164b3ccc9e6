package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Re-ingest PERSISTED [[KllQuantileSketch]] summaries — rows of the
  * `(n, err, items: array<struct<v, w>>)` eval struct read back from
  * parquet — and merge them into one summary (merge per Agarwal et al.
  * 2012 "Mergeable summaries": an item of weight `2^h` re-enters the
  * compactor hierarchy at level `h`, weights are powers of two by
  * construction, so the round trip loses nothing).
  *
  * This closes the restartable-ingest gap the HLL and Count-Min sketches
  * already cover (writeHllSketch/writeCmSketch + shard merge): per-crawl
  * score-distribution summaries persist as tiny parquet rows and compose
  * across corpus versions WITHOUT re-reading any corpus. In the exact
  * regime (`capacity` ≥ the total rankable count, no compaction anywhere)
  * the merged summary IS the sorted union of the shard inputs —
  * bit-identical to a single-pass sketch and hash-gateable against an
  * order-statistics oracle; in the approximate regime the summed `err`
  * bound still holds (same contract as the live aggregate).
  *
  * Scale: each input row is an already-bounded summary (O(capacity ·
  * log(n/capacity)) doubles), so the aggregation is bounded × #shards —
  * never corpus-sized. Null summaries (empty shards) are skipped. */
case class KllMergeSummaries(child: Expression, capacity: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketchState] with UnaryLike[Expression] {
  require(capacity >= 2, s"capacity must be >= 2, got $capacity")

  private val ops = new KllSketchOps(capacity)

  override def createAggregationBuffer(): KllSketchState = ops.emptyState()

  override def update(b: KllSketchState, input: InternalRow): KllSketchState = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val n = row.getLong(0)
      val err = row.getLong(1)
      val items = row.getArray(2)
      ops.ingestSummary(b, n, err, items)
    }
    b
  }

  override def merge(b: KllSketchState, o: KllSketchState): KllSketchState =
    ops.merge(b, o)

  override def eval(b: KllSketchState): Any = ops.evalState(b)

  override def serialize(b: KllSketchState): Array[Byte] = ops.serialize(b)

  override def deserialize(bytes: Array[Byte]): KllSketchState =
    ops.deserialize(bytes)

  override def dataType: DataType = KllSketchOps.outputType

  override def nullable: Boolean = false

  override def prettyName: String = "kll_merge_summaries"

  override def withNewMutableAggBufferOffset(offset: Int): KllMergeSummaries =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KllMergeSummaries =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): KllMergeSummaries =
    copy(child = newChild)
}

/** The compactor-hierarchy mechanics shared by the live aggregate
  * ([[KllQuantileSketch]]) and the summary re-ingest
  * ([[KllMergeSummaries]]) — one implementation so the two can never
  * drift in compaction order or error accounting. */
private[functions] final class KllSketchOps(capacity: Int) extends Serializable {
  import scala.collection.mutable.ArrayBuffer

  def emptyState(): KllSketchState =
    new KllSketchState(0L, 0L, ArrayBuffer(ArrayBuffer.empty[Double]), ArrayBuffer(0))

  def ensureLevel(b: KllSketchState, h: Int): Unit =
    while (b.levels.length <= h) { b.levels += ArrayBuffer.empty[Double]; b.parities += 0 }

  /** Sort level `h`; if odd-sized, the smallest item stays put; promote
    * alternating items of the even remainder (starting at the level's
    * flipping parity offset) to level `h+1` at doubled weight. Adds
    * `2^h` to the rank-error bound; cascades upward while over capacity. */
  def compact(b: KllSketchState, h: Int): Unit = {
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

  def update(b: KllSketchState, d: Double): Unit = {
    b.levels(0) += d
    b.n += 1L
    if (b.levels(0).length > capacity) compact(b, 0)
  }

  /** Re-ingest one persisted summary: item of weight 2^h → level h. */
  def ingestSummary(b: KllSketchState, n: Long, err: Long,
                    items: ArrayData): Unit = {
    b.n += n
    b.err += err
    var i = 0
    val len = items.numElements()
    while (i < len) {
      val item = items.getStruct(i, 2)
      val v = item.getDouble(0)
      val w = item.getLong(1)
      // weights are powers of two by construction (level h stores 2^h)
      val h = 63 - java.lang.Long.numberOfLeadingZeros(w)
      ensureLevel(b, h)
      b.levels(h) += v
      if (b.levels(h).length > capacity) compact(b, h)
      i += 1
    }
  }

  def merge(b: KllSketchState, o: KllSketchState): KllSketchState = {
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

  def evalState(b: KllSketchState): Any = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
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

  def serialize(b: KllSketchState): Array[Byte] = {
    import java.nio.ByteBuffer
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

  def deserialize(bytes: Array[Byte]): KllSketchState = {
    import java.nio.ByteBuffer
    import scala.collection.mutable.ArrayBuffer
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
}

private[functions] object KllSketchOps {
  val outputType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false))))
}

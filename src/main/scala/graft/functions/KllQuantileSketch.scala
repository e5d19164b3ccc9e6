package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
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
  * The compactor mechanics live in [[KllSketchOps]], shared with the
  * persisted-summary re-ingest aggregate [[KllMergeSummaries]] so the
  * live and restart paths can never drift.
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

  private val ops = new KllSketchOps(capacity)

  override def createAggregationBuffer(): KllSketchState = ops.emptyState()

  override def update(b: KllSketchState, input: InternalRow): KllSketchState = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) ops.update(b, d)
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

  override def prettyName: String = "kll_quantile_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantileSketch =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KllQuantileSketch =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): KllQuantileSketch =
    copy(child = newChild)
}

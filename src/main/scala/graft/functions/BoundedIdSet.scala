package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded id-collection state: ids kept only while the TOTAL stays within
  * the cap; the count keeps counting so overflow is detected exactly. */
final class BoundedIdState(var n: Long, var size: Int, var ids: Array[Long])

/** Native capped id-set aggregate for LSH bucket materialization: per
  * group, the sorted array of input ids when the group's TOTAL population
  * lands in [2, cap], and the EMPTY array otherwise.
  *
  * This is the skew guard of [[graft.llm.TextOps.minHashLshPairs]] folded
  * into the aggregation itself: a boilerplate bucket of m ≫ cap members
  * used to need a separate histogram pass plus a cap semi-join BEFORE the
  * bucket self-join so m² pairs never materialize; here the buffer simply
  * STOPS RETAINING ids once more than cap have been seen (the count keeps
  * counting, so overflow is exact, order-independent, and costs O(1)
  * memory beyond the cap), and an over-cap or singleton bucket evaluates
  * to the empty array. One corpus-sided aggregation replaces histogram +
  * cap join + self-join; output ids sort ascending so downstream pair
  * generation emits id_a < id_b deterministically.
  *
  * TypedImperativeAggregate (the [[TopKByScore]] discipline): ids read
  * straight off the InternalRow into a primitive array — no boxed tuples,
  * no ExpressionEncoder round trip per row. */
case class BoundedIdSet(child: Expression, cap: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedIdState] with UnaryLike[Expression] {

  override def createAggregationBuffer(): BoundedIdState =
    new BoundedIdState(0L, 0, new Array[Long](8))

  private def append(b: BoundedIdState, id: Long): Unit = {
    b.n += 1
    if (b.n <= cap) {
      if (b.size == b.ids.length) {
        val bigger = new Array[Long](math.min(math.max(8, b.ids.length * 2), cap))
        System.arraycopy(b.ids, 0, bigger, 0, b.size)
        b.ids = bigger
      }
      b.ids(b.size) = id
      b.size += 1
    }
  }

  override def update(b: BoundedIdState, input: InternalRow): BoundedIdState = {
    val v = child.eval(input)
    if (v != null) append(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: BoundedIdState, o: BoundedIdState): BoundedIdState = {
    // retention past the cap is dead weight but never wrong: eval only
    // returns ids when the TOTAL stayed <= cap, and in that case no side
    // ever overflowed, so every id was retained regardless of merge order
    var j = 0
    while (j < o.size) { append(b, o.ids(j)); j += 1 }
    b.n += o.n - o.size // rows the other side counted but did not retain
    b
  }

  override def eval(b: BoundedIdState): Any = {
    if (b.n < 2 || b.n > cap) new GenericArrayData(Array.empty[Long])
    else {
      val out = java.util.Arrays.copyOf(b.ids, b.size)
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }
  }

  override def serialize(b: BoundedIdState): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + b.size * 8)
    buf.putLong(b.n)
    buf.putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedIdState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong
    val size = buf.getInt
    val ids = new Array[Long](math.max(8, size))
    var i = 0
    while (i < size) { ids(i) = buf.getLong; i += 1 }
    new BoundedIdState(n, size, ids)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "bounded_id_set"

  override def withNewMutableAggBufferOffset(offset: Int): BoundedIdSet =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): BoundedIdSet =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): BoundedIdSet =
    copy(child = newChild)
}

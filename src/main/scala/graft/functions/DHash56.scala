package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native one-pass 56-bit difference hash (dHash) of a binary payload —
  * the perceptual fingerprint behind
  * [[graft.llm.MultimodalOps.nearDupImages]].
  *
  * Semantics are exactly [[graft.llm.MultimodalOps.StubCodec.dHash56]]
  * (the `private[graft]` executable specification this expression
  * replaces on the hot path, pinned bit-for-bit by MultimodalOpsSpec's
  * randomized parity sweep): the payload partitions into an 8×8 block
  * grid by floor division, integer-mean "luma" per cell, and bit
  * (r·7+c) is set iff cell(r, c+1) > cell(r, c). All 56 bits sit below
  * the BIGINT sign bit so band slices replay exactly in any SQL engine.
  *
  * Why native: the image near-dup operator hashes EVERY corpus payload
  * map-side, and the banding lineage can evaluate the hash column more
  * than once — an interpreted Scala UDF breaks whole-stage codegen and
  * copies the full payload `Array[Byte]` across the UDF boundary per
  * evaluation. This expression fuses into the scan projection and reads
  * the payload bytes in place (same discipline as
  * [[MinHashSignature]] / [[ShingleHashSet]] / [[BloomContains]]).
  * Empty payloads hash to 0; NULL propagates (call sites that want the
  * legacy null→0 coalesce it). */
case class DHash56(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY payload, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "dhash56"

  override protected def nullSafeEval(v: Any): Any =
    DHash56.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.DHash56.hash($v);")

  override protected def withNewChildInternal(newChild: Expression): DHash56 =
    copy(child = newChild)
}

object DHash56 {

  /** The shared hot loop (interpreted eval + generated code both land
    * here): 64 integer cell means over floor-division block bounds, then
    * 56 row-wise gradient comparisons. Allocates one 64-long scratch
    * array per call, nothing else. */
  def hash(payload: Array[Byte]): Long = {
    if (payload == null || payload.isEmpty) return 0L
    val L = payload.length
    val cells = new Array[Long](64)
    var t = 0
    while (t < 64) {
      val lo = (t.toLong * L / 64).toInt
      val hi = ((t + 1).toLong * L / 64).toInt
      if (hi > lo) {
        var s = 0L
        var i = lo
        while (i < hi) { s += payload(i) & 0xff; i += 1 }
        cells(t) = s / (hi - lo)
      }
      t += 1
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        if (cells(r * 8 + c + 1) > cells(r * 8 + c)) h |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    h
  }
}

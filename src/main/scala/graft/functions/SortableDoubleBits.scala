package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving DOUBLE → BIGINT transform (the classic sortable-bits
  * trick, e.g. Lucene's NumericUtils.doubleToSortableLong): comparing the
  * resulting longs as signed integers gives exactly the IEEE-754 total
  * order of the doubles — negatives ascend, −0.0 < +0.0 is collapsed by
  * doubleToLongBits canonicalization of NaN only (−0.0 sorts below +0.0,
  * which is fine for ranking), NaN sorts above +∞.
  *
  * Why it exists: a histogram over the TOP BITS of this value is an
  * order-preserving coarse bucketing of an arbitrary double column with a
  * FIXED bucket count — the building block that lets exact quantile
  * selection run as (bounded histogram + boundary-bucket refinement)
  * instead of a corpus-wide sort (see QuantileOps). */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "sortable_double_bits"

  override protected def nullSafeEval(v: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b")
      s"""
         |final long $b = java.lang.Double.doubleToLongBits($v);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SortableDoubleBits =
    copy(child = newChild)
}

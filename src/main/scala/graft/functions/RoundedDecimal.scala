package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType}

/** Fused `round(x, scale).cast(DECIMAL(precision, scale))` for DOUBLE input —
  * the house exact-order-independent-sum pattern (`exactSum`/`exactSum2` in
  * the SparkEntry drivers) evaluated with ONE shortest-decimal conversion
  * per row instead of two.
  *
  * Value-identical to the composed form by construction: `Round(x, s)` on a
  * double is `BigDecimal.valueOf(x).setScale(s, HALF_UP).doubleValue()` and
  * the decimal cast re-parses that double through `BigDecimal.valueOf`
  * again; since the rounded value has at most `s` decimals and ≤ 15
  * significant digits in this engine's money/measure domains, it
  * round-trips the double exactly, so parsing once and keeping the scaled
  * unscaled-long is the same value. The composed form itself only agrees
  * with the DuckDB oracle under the same round-trip premise, so the fused
  * expression holds exactly where the gate already does (VerifySpec /
  * compare.py re-check every row).
  *
  * Why it is faster: the composed chain allocates `Double.toString` +
  * `BigDecimal` twice per row and feeds the sum a NON-compact decimal
  * (BigDecimal-backed), pushing every aggregate add onto the slow
  * `BigDecimal.add` path. This expression does the string parse once and
  * emits a compact (long-backed) [[Decimal]], so `Sum`'s adds stay on the
  * long fast path. Measured on q1_pricing_summary (600k-row lineitem,
  * 5 exact sums): 2.06 s → see OPTIMIZATION_r10.md.
  *
  * Overflow semantics mirror the ANSI cast (the session default): a NaN,
  * infinite, or precision-overflowing value fails the query with an
  * ArithmeticException, exactly as `cast` would. */
case class RoundedDecimal(child: Expression, scale: Int, precision: Int)
    extends UnaryExpression {

  require(scale >= 0 && precision >= scale && precision <= DecimalType.MAX_PRECISION,
    s"invalid decimal($precision, $scale)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE input, got ${other.simpleString}")
    }

  override def dataType: DataType = DecimalType(precision, scale)

  override def prettyName: String = "rounded_decimal"

  override protected def nullSafeEval(v: Any): Any =
    RoundedDecimal.compute(v.asInstanceOf[Double], scale, precision)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RoundedDecimal.compute($v, $scale, $precision);")

  override protected def withNewChildInternal(newChild: Expression): RoundedDecimal =
    copy(child = newChild)
}

object RoundedDecimal {
  /** `round(c, scale).cast(DECIMAL(precision, scale))` — and equally the
    * bare `c.cast(DECIMAL(precision, scale))`, whose ANSI double→decimal
    * cast is the same shortest-decimal parse + HALF_UP — as one fused
    * Column. */
  def column(c: org.apache.spark.sql.Column, scale: Int = 6,
             precision: Int = 28): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      RoundedDecimal(org.apache.spark.sql.GraftExpressionBridge.expression(
        c.cast(DoubleType)), scale, precision))

  /** `round(x, scale)` semantics = HALF_UP on the SHORTEST-DECIMAL
    * representation of x (`BigDecimal.valueOf` goes through
    * `Double.toString`). The fast path avoids that per-row string parse:
    * the shortest-decimal value differs from the binary value by at most
    * half an ulp, and `x * 10^scale` adds one more rounding, so the scaled
    * value is within `3·2⁻⁵³·|r|` of the true decimal-scaled value — any
    * row whose fractional part is further than that from the .5 tie point
    * rounds identically under both readings. Only rows inside the guard
    * band (|frac − 0.5| ≤ ~1e-15·|r|, i.e. printed-vs-binary ambiguity at
    * the tie) pay the exact BigDecimal path. */
  private val GuardRel = 1.1e-15 // > 3·2⁻⁵³, with 3× margin

  def compute(x: Double, scale: Int, precision: Int): Decimal = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(
        s"rounded_decimal: $x cannot be represented as Decimal($precision, $scale) " +
          "(ANSI cast semantics)")
    if (scale >= POW10D.length) return slow(x, scale, precision)
    val r = x * POW10D(scale)
    val a = java.lang.Math.abs(r)
    if (a < (1L << 50).toDouble) {
      val n = java.lang.Math.floor(a)
      val frac = a - n
      if (java.lang.Math.abs(frac - 0.5) > GuardRel * a + java.lang.Double.MIN_NORMAL) {
        var u = n.toLong + (if (frac > 0.5) 1L else 0L)
        if (x < 0) u = -u
        // precision fit: any long has ≤ 19 digits
        if (precision >= 19 || (java.lang.Math.abs(u) < POW10L(precision)))
          return Decimal(u, precision, scale)
        throw new ArithmeticException(
          s"rounded_decimal: $x cannot be represented as Decimal($precision, $scale)")
      }
    }
    slow(x, scale, precision)
  }

  /** The scaled-long form of the same rounding — `BigDecimal.valueOf(x)
    * .setScale(scale, HALF_UP).movePointRight(scale).longValueExact()` with
    * the identical guard-band fast path as [[compute]] (same derivation:
    * outside the ~1e-15-relative band around the .5 tie the printed and
    * binary readings round identically; inside it the exact BigDecimal
    * chain runs). Used by the streaming broadcast scorers, whose
    * order-independent sums accumulate these scaled longs directly. */
  def scaledLong(x: Double, scale: Int): Long = {
    if (!java.lang.Double.isNaN(x) && !java.lang.Double.isInfinite(x) &&
        scale < POW10D.length) {
      val r = x * POW10D(scale)
      val a = java.lang.Math.abs(r)
      if (a < (1L << 50).toDouble) {
        val n = java.lang.Math.floor(a)
        val frac = a - n
        if (java.lang.Math.abs(frac - 0.5) > GuardRel * a + java.lang.Double.MIN_NORMAL) {
          val u = n.toLong + (if (frac > 0.5) 1L else 0L)
          return if (x < 0) -u else u
        }
      }
    }
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .movePointRight(scale).longValueExact()
  }

  private val POW10D: Array[Double] =
    Array.tabulate(19)(i => java.lang.Math.pow(10, i)) // 10^k exact for k ≤ 22

  private val POW10L: Array[Long] = {
    val a = new Array[Long](19); a(0) = 1L
    var i = 1; while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }; a
  }

  /** Exact reference path — one shortest-decimal parse + HALF_UP setScale,
    * emitted compact when the unscaled value fits a long. */
  private[functions] def slow(x: Double, scale: Int, precision: Int): Decimal = {
    val bd = java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (bd.precision > precision)
      throw new ArithmeticException(
        s"rounded_decimal: $x cannot be represented as Decimal($precision, $scale)")
    val unscaled = bd.unscaledValue()
    if (unscaled.bitLength() < 64) Decimal(unscaled.longValueExact(), precision, scale)
    else Decimal(new java.math.BigDecimal(unscaled, scale), precision, scale)
  }
}

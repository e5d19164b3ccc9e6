package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the fused [[graft.functions.RoundedDecimal]] against the
  * composed `round(x, 6).cast(DECIMAL(28, 6))` it replaced in the exactSum
  * family: every decimal value must be IDENTICAL — the order-independent
  * oracle sums and the driver's hash compare depend on the exact numbers.
  * The fixture stresses the fast-path guard band (printed-vs-binary
  * halfway ambiguity), signs, magnitude extremes and the null branches. */
class RoundedDecimalParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-rounded-decimal-parity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def adversarial: Seq[Double] = {
    val rnd = new scala.util.Random(42)
    val specials = Seq(
      0.0, -0.0, 1.0, -1.0, 0.5e-6, -0.5e-6, 1.5e-6, 2.5e-6, // exact ties at scale 6
      0.1234565, -0.1234565, 0.1234575, // shortest-repr ties whose binary value is off-tie
      1234567.1234565, 9876543210.9876545, // ties at larger magnitudes
      1e-7, 4.999999e-7, 5.000001e-7, // just below/above the tie
      1.0 / 3.0, math.Pi, -math.E, // non-terminating
      4.5e8, 4.6e8, 1.1e9, // around the always-slow band boundary
      (1L << 50).toDouble / 1e6, (1L << 50).toDouble / 1e6 + 1.0, // fast-path a-bound
      9.99e21, // near (but inside) the precision-28 bound
      Double.MinPositiveValue, -Double.MinPositiveValue)
    val randoms = (1 to 20000).map { _ =>
      val mag = math.pow(10, rnd.nextInt(20) - 8)
      (rnd.nextDouble() - 0.5) * mag
    }
    // values engineered to sit at printed halfway points of every width
    val printedTies = (1 to 2000).map { i =>
      val intPart = rnd.nextInt(1000000)
      val frac = rnd.nextInt(1000)
      java.lang.Double.parseDouble(s"$intPart.$frac${"5"}")
    }
    specials ++ randoms ++ printedTies
  }

  test("RoundedDecimal == round(x,6).cast(DECIMAL(28,6)) on adversarial doubles") {
    val sp = spark
    import sp.implicits._
    val df = adversarial.toDF("x")
    val fused = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.RoundedDecimal(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("x").cast(DoubleType)),
        6, 28))
    val rows = df.select(col("x"), fused.as("f"),
        round(col("x"), 6).cast(DecimalType(28, 6)).as("r"))
      .collect()
    rows.foreach { row =>
      val x = row.getDouble(0)
      val f = row.get(1)
      val r = row.get(2)
      assert(f == r || (f == null && r == null),
        s"mismatch at x=$x (bits=${java.lang.Double.doubleToRawLongBits(x)}): fused=$f composed=$r")
    }
  }

  test("RoundedDecimal matches at scale 2 as well (exactSum2 rounding domain)") {
    val sp = spark
    import sp.implicits._
    val df = adversarial.toDF("x")
    val fused = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.RoundedDecimal(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("x").cast(DoubleType)),
        2, 28))
    val rows = df.select(col("x"), fused.as("f"),
        round(col("x"), 2).cast(DecimalType(28, 2)).as("r"))
      .collect()
    rows.foreach { row =>
      val f = row.get(1)
      val r = row.get(2)
      assert(f == r || (f == null && r == null),
        s"mismatch at x=${row.getDouble(0)}: fused=$f composed=$r")
    }
  }

  test("NaN/Infinity/overflow fail the query, matching the ANSI cast") {
    Seq(Double.NaN, Double.PositiveInfinity, 1.01e22, -1.01e22).foreach { bad =>
      assertThrows[ArithmeticException](
        graft.functions.RoundedDecimal.compute(bad, 6, 28))
    }
  }

  test("scaledLong == BigDecimal setScale/movePointRight chain (broadcast scorers)") {
    adversarial.filter(d => !d.isNaN && !d.isInfinite && math.abs(d) < 1e12)
      .foreach { x =>
        val fast = graft.functions.RoundedDecimal.scaledLong(x, 6)
        val exact = java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact()
        assert(fast == exact,
          s"scaledLong mismatch at x=$x (bits=${java.lang.Double.doubleToRawLongBits(x)}): fast=$fast exact=$exact")
      }
  }

  test("sum over RoundedDecimal equals the composed exact sum") {
    val sp = spark
    import sp.implicits._
    val df = adversarial.filter(d =>
      !d.isNaN && !d.isInfinite && math.abs(d) < 1e15).toDF("x")
    val fused = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.RoundedDecimal(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("x").cast(DoubleType)),
        6, 28))
    val a = df.agg(sum(fused).cast(DoubleType)).collect()(0).getDouble(0)
    val b = df.agg(sum(round(col("x"), 6).cast(DecimalType(28, 6))).cast(DoubleType))
      .collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b),
      s"sum mismatch: fused=$a composed=$b")
  }
}

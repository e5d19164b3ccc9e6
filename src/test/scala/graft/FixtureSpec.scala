package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{TsCvOp, TsForecastOp, TsPrep}

/** Integration suite over the reference's canonical synthetic fixtures
  * (FIXTURES.md §1, from test/sql/ts_forecast_by.test:14-58 and
  * ts_type_preservation.test): trend+weekly wave, strong-seasonal,
  * intermittent-demand series, and the DATE/TIMESTAMP/INTEGER/BIGINT
  * date-column round-trip contract. */
class FixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-fixtures")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** test_groups: A = 10 + 0.5·i + 2·sin(iπ/7); B = 20 + 0.3·i + 3·cos(iπ/7). */
  private def testGroups: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 60).flatMap { i =>
      Seq(
        ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
          10.0 + 0.5 * i + 2.0 * math.sin(i * math.Pi / 7)),
        ("B", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
          20.0 + 0.3 * i + 3.0 * math.cos(i * math.Pi / 7)))
    }.toDF("id", "ds", "value")
  }

  /** test_seasonal: 100 + 20·sin(2πi/7) + 0.1·i (84 days). */
  private def testSeasonal: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 84).map { i =>
      ("S1", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        100.0 + 20.0 * math.sin(2 * math.Pi * i / 7) + 0.1 * i)
    }.toDF("id", "ds", "value")
  }

  /** test_intermittent: demand every 5th day (seeded noise). */
  private def testIntermittent: DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 60).map { i =>
      ("I1", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        if (i % 5 == 0) 10.0 + rnd.nextDouble() * 5 else 0.0)
    }.toDF("id", "ds", "value")
  }

  test("ts_forecast_by on trend+wave fixture: schema, horizon, future dates") {
    val out = TsForecastOp.forecastBy(testGroups, "id", "ds", "value",
      "SeasonalNaive", 14, "1d", Map("seasonal_period" -> "14"))
    assert(out.columns.toSeq == Seq("id", "forecast_step", "ds", "yhat",
      "yhat_lower", "yhat_upper", "model_name"))
    val rows = out.collect()
    assert(rows.length == 28) // 2 groups × 14
    assert(out.schema("ds").dataType == DateType) // type preserved
    val aDates = rows.filter(_.getString(0) == "A").map(_.getAs[java.sql.Date]("ds")).sorted
    assert(aDates.head.toString == "2024-03-01") // day after the last input date
    // lower ≤ yhat ≤ upper everywhere
    rows.foreach { r =>
      assert(r.getAs[Double]("yhat_lower") <= r.getAs[Double]("yhat") + 1e-9)
      assert(r.getAs[Double]("yhat") <= r.getAs[Double]("yhat_upper") + 1e-9)
    }
  }

  test("model distinctness on the seasonal fixture (ts_model_distinctness contract)") {
    def fc(method: String, params: Map[String, String] = Map("seasonal_period" -> "7")) =
      TsForecastOp.forecastBy(testSeasonal, "id", "ds", "value", method, 7, "1d", params)
        .orderBy("forecast_step").select("yhat").collect().map(_.getDouble(0)).toSeq
    val naive = fc("Naive", Map.empty)
    val snaive = fc("SeasonalNaive")
    val hw = fc("HoltWinters")
    assert(naive != snaive && snaive != hw && naive != hw)
    // seasonal models should track the planted wave much better than naive
    val actual = (84 until 91).map(i => 100.0 + 20.0 * math.sin(2 * math.Pi * i / 7) + 0.1 * i)
    def mae(xs: Seq[Double]) = xs.zip(actual).map { case (a, b) => math.abs(a - b) }.sum / 7
    assert(mae(hw) < mae(naive) / 2, s"hw=${mae(hw)} naive=${mae(naive)}")
  }

  test("intermittent models produce flat positive forecasts on sparse demand") {
    Seq("CrostonClassic", "CrostonSBA", "TSB", "ADIDA", "IMAPA").foreach { m =>
      val out = TsForecastOp.forecastBy(testIntermittent, "id", "ds", "value", m, 3, "1d")
        .select("yhat").collect().map(_.getDouble(0))
      assert(out.length == 3 && out.forall(v => v >= 0 && v < 12), s"$m → ${out.toSeq}")
    }
  }

  test("date-column type preservation: DATE, TIMESTAMP, INTEGER, BIGINT round-trip") {
    val s = spark
    import s.implicits._
    val base = (0 until 20).map(i => ("G", i, 5.0 + i)).toDF("id", "step", "value")
    // INTEGER ds with raw-integer frequency
    val intOut = TsForecastOp.forecastBy(
      base.withColumn("ds", col("step")), "id", "ds", "value", "Naive", 3, "1")
    assert(intOut.schema("ds").dataType == IntegerType)
    assert(intOut.select("ds").collect().map(_.getInt(0)).sorted.toSeq == Seq(20, 21, 22))
    // BIGINT
    val longOut = TsForecastOp.forecastBy(
      base.withColumn("ds", col("step").cast(LongType) * 10), "id", "ds", "value",
      "Naive", 2, "10")
    assert(longOut.schema("ds").dataType == LongType)
    // TIMESTAMP
    val tsOut = TsForecastOp.forecastBy(
      base.withColumn("ds",
        timestamp_micros(unix_micros(to_timestamp(lit("2024-01-01 00:00:00"))) +
          col("step").cast(LongType) * 3600000000L)), "id", "ds", "value", "Naive", 2, "1h")
    assert(tsOut.schema("ds").dataType == TimestampType)
    val last = tsOut.select(max("ds")).collect()(0).getTimestamp(0)
    assert(last.toString.startsWith("2024-01-01 21:00"))
  }

  test("calendar frequency forecast dates clamp month ends") {
    val s = spark
    import s.implicits._
    val monthly = (0 until 12).map { i =>
      ("M", java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 31).plusMonths(i)), 10.0 + i)
    }.toDF("id", "ds", "value")
    val out = TsForecastOp.forecastBy(monthly, "id", "ds", "value", "Naive", 3, "1mo")
    val dates = out.select("ds").collect().map(_.getAs[java.sql.Date](0).toString).sorted
    // last input is 2023-12-31 → +1mo = 2024-01-31, +2mo = 2024-02-29 (leap), +3mo = 2024-03-31
    assert(dates.toSeq == Seq("2024-01-31", "2024-02-29", "2024-03-31"), dates.toSeq)
  }

  test("cv equivalence: auto folds with explicit initial size == explicit cutoffs (ts_backtest_equivalence contract)") {
    val auto = TsCvOp.cvFoldsBy(testGroups, "id", "ds", "value", 2, 7,
      Map("initial_train_size" -> "46"))
    val cutoffs = Seq("2024-02-15 00:00:00", "2024-02-22 00:00:00") // pos 45 and 52
      .map(java.sql.Timestamp.valueOf)
    val explicit = TsCvOp.cvSplitBy(testGroups, "id", "ds", "value", cutoffs, 7)
    val a = auto.orderBy("id", "fold_id", "ds")
      .select("id", "fold_id", "ds", "split").collect().map(_.toSeq).toSeq
    val b = explicit.orderBy("id", "fold_id", "ds")
      .select("id", "fold_id", "ds", "split").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("fill_gaps output is gap-free (property from SURVEY §5)") {
    val s = spark
    import s.implicits._
    val gappy = Seq(0, 1, 2, 5, 6, 9).map { i =>
      ("G", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), i.toDouble)
    }.toDF("id", "ds", "value")
    val filled = TsPrep.fillGapsBy(gappy, "id", "ds", "value", "1d")
    val dates = filled.select("ds").collect().map(_.getAs[java.sql.Date](0).toLocalDate).sorted
    assert(dates.length == 10)
    dates.sliding(2).foreach(w => assert(w(1).toEpochDay - w(0).toEpochDay == 1))
    // original values kept, inserted rows null
    assert(filled.filter(col("value").isNull).count() == 4)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Forecast
import graft.ops.TsForecastOp

/** Port of test/sql/ts_forecast_params.test: parameter surface of the
  * forecast entry points — confidence bounds, the scalar path's
  * no-auto-seasonality contract, 'auto' aliasing, frequency grammar
  * (Polars + interval styles), horizon edges, and fit-quality fields.
  */
class ForecastParamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-forecast-params")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val trend: Seq[Double] = (0 until 12).map(i => 10.0 + 2.0 * i)
  private val seasonal: Seq[Double] = Seq.fill(6)(Seq(10.0, 20.0, 30.0)).flatten

  /** `_ts_forecast(list, h, m)` equivalent: values-only scalar, NO
    * seasonal auto-detection (ts_forecast_params.test:108-127). */
  private def scalar(values: Seq[Double], h: Int, m: String): Forecast.Output =
    Forecast.forecast(values.toArray, Array.fill(values.length)(true),
      Forecast.Options(model = Forecast.canonicalModel(m), horizon = h,
        autoDetectSeasonality = false))

  test("default confidence level produces ordered distinct bounds (:55-90)") {
    val out = scalar(trend, 3, "Naive")
    assert(out.lower.length == 3 && out.upper.length == 3)
    assert(out.lower(0) != out.upper(0))
    assert(out.lower(0) < out.point(0) && out.point(0) < out.upper(0))
  }

  test("scalar SeasonalNaive without params behaves as Naive (:108-127)") {
    // [10,20,30]×6: with auto-detection the h=1 forecast would be 10 (period
    // 3); the scalar path must NOT auto-detect, so every step repeats 30.0
    val out = scalar(seasonal, 3, "SeasonalNaive")
    assert(out.modelName == "SeasonalNaive")
    (0 until 3).foreach(h => assert(math.abs(out.point(h) - 30.0) < 0.01))
  }

  test("'auto' aliases to AutoETS and produces a model name (:133-147)") {
    assert(Forecast.canonicalModel("auto") == "AutoETS")
    val out = scalar(trend, 3, "auto")
    assert(out.point.length == 3 && out.modelName.nonEmpty)
  }

  test("frequency grammar: Polars and interval styles (:210-250)") {
    val s = spark
    import s.implicits._
    val grouped = (0 until 10).flatMap { i =>
      Seq(("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        10.0 + 2.0 * i),
        ("B", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
          100.0 + 5.0 * i))
    }.toDF("id", "ds", "value")
    Seq("1d", "1 day", "1w", "1h", "30m", "1mo", "1q", "1y").foreach { freq =>
      val n = TsForecastOp.forecastBy(grouped, "id", "ds", "value", "Naive", 3, freq).count()
      assert(n == 6, s"freq $freq → $n rows")
    }
  }

  test("confidence_level and seasonal_period map params accepted (:160-183)") {
    val s = spark
    import s.implicits._
    val grouped = (0 until 10).map { i =>
      ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), 10.0 + 2.0 * i)
    }.toDF("id", "ds", "value")
    assert(TsForecastOp.forecastBy(grouped, "id", "ds", "value", "Naive", 3, "1d",
      Map("confidence_level" -> "0.80")).count() == 3)
    assert(TsForecastOp.forecastBy(grouped, "id", "ds", "value", "SeasonalNaive", 3, "1d",
      Map("seasonal_period" -> "7")).count() == 3)
    assert(TsForecastOp.forecastBy(grouped, "id", "ds", "value", "HoltWinters", 3, "1d",
      Map("confidence_level" -> "0.95", "seasonal_period" -> "7")).count() == 3)
  }

  test("horizon edges: zero → empty, large → filled, minimum 3 obs (:300-330)") {
    assert(scalar(trend, 0, "Naive").point.isEmpty)
    assert(scalar(trend, 24, "Naive").point.length == 24)
    assert(scalar(Seq(10.0, 20.0, 30.0), 1, "Naive").point.length == 1)
    assert(scalar(Seq(10.0, 20.0, 10.0, 20.0), 2, "SeasonalNaive").point.length == 2)
  }

  test("fit-quality fields: AIC/BIC for auto models, non-negative MSE (:335-360)") {
    val auto = scalar(trend, 3, "AutoETS")
    assert(auto.aic.isDefined && auto.bic.isDefined)
    val out = Forecast.forecast(trend.toArray, Array.fill(trend.length)(true),
      Forecast.Options(model = "Naive", horizon = 3,
        autoDetectSeasonality = false, includeFitted = true))
    assert(out.mse.exists(_ >= 0.0))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Forecast, MultiSeasonal}

/** Fourth golden batch: model-contract assertions from
  * ts_forecast_theta.test, ts_forecast_intermittent.test and
  * ts_forecast_multi_seasonal.test, through the values-only scalar path
  * (no seasonality auto-detection, like the reference's `_ts_forecast`). */
class ReferenceGoldensSpec4 extends AnyFunSuite {

  private def fc(values: Seq[Double], h: Int, m: String): Forecast.Output =
    Forecast.forecast(values.toArray, Array.fill(values.length)(true),
      Forecast.Options(model = Forecast.canonicalModel(m), horizon = h,
        autoDetectSeasonality = false))

  private val intermittent =
    Seq(0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 3.0, 0.0, 4.0, 0.0, 0.0, 6.0)
  private val trendUp = Seq(10.0, 12.0, 14.0, 16.0, 18.0, 20.0, 22.0, 24.0, 26.0, 28.0)
  private val trendDown = Seq(50.0, 48.0, 46.0, 44.0, 42.0, 40.0, 38.0, 36.0, 34.0, 32.0)
  private val wave4 = Seq(100.0, 110.0, 120.0, 130.0, 100.0, 110.0, 120.0, 130.0,
    100.0, 110.0, 120.0, 130.0)

  test("CrostonClassic contract (ts_forecast_intermittent.test:69-97)") {
    val out = fc(intermittent, 3, "CrostonClassic")
    assert(out.modelName == "CrostonClassic")
    assert(fc(intermittent, 5, "CrostonClassic").point.length == 5)
    assert(math.abs(out.point(0) - out.point(1)) < 0.01, "flat forecast")
    assert(math.abs(out.point(1) - out.point(2)) < 0.01)
    assert(out.point(0) > 0, "positive for positive demands")
  }

  test("Theta contract (ts_forecast_theta.test:65-99)") {
    val up = fc(trendUp, 3, "Theta")
    assert(up.modelName == "Theta")
    assert(fc(trendUp, 5, "Theta").point.length == 5)
    assert(up.point(0) > 25.0, "trending series forecasts above recent level")
    assert(up.point(1) > up.point(0), "forecast keeps increasing on trend")
    assert(fc(trendDown, 3, "Theta").point(0) < 35.0)
    assert(math.abs(fc(Seq.fill(10)(25.0), 3, "Theta").point(0) - 25.0) < 1.0)
  }

  test("MFLES / MSTL / TBATS contract (ts_forecast_multi_seasonal.test:65-136)") {
    val mf = fc(wave4, 4, "MFLES")
    assert(mf.modelName == "MFLES")
    assert(fc(wave4, 6, "MFLES").point.length == 6)
    assert(mf.lower(0) <= mf.point(0) && mf.upper(0) >= mf.point(0))
    assert(fc(wave4, 4, "mfles").modelName == "MFLES", "case-insensitive alias")
    assert(fc(wave4, 4, "MSTL").modelName == "MSTL")
    assert(fc(wave4, 4, "TBATS").modelName == "TBATS")
    // with the period given, MFLES reproduces the seasonal variation
    val seasonal = MultiSeasonal.mflesForecast(wave4.toArray, 4, Seq(4))
    assert(math.abs(seasonal(0) - seasonal(1)) > 0.1,
      "seasonal variation must survive into the forecast")
    assert(seasonal.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("fitted/residual lengths match the input (ts_forecast_multi_seasonal.test:103-113)") {
    val out = Forecast.forecast(wave4.toArray, Array.fill(wave4.length)(true),
      Forecast.Options(model = "MFLES", horizon = 4, autoDetectSeasonality = false,
        includeFitted = true, includeResiduals = true))
    assert(out.fitted.exists(_.length == 12))
    assert(out.residuals.exists(_.length == 12))
  }
}

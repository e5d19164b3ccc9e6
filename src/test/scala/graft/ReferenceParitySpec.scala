package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Forecast

/** Reference-parity goldens on NOISY fixtures, ported from the reference's
  * own sqllogictest corpus and cross-engine comparison harness:
  *
  *  - test/sql/ts_forecast_basic_models.test (SMA/SeasonalNaive/SES/
  *    SESOptimized/RandomWalkDrift exact-value + contract blocks)
  *  - test/sql/ts_forecast_theta.test (four Theta variants)
  *  - test/sql/ts_forecast_intermittent.test (six intermittent models)
  *  - test/sql/ts_forecast_multi_seasonal.test (MFLES/MSTL/TBATS)
  *  - test/sql/ts_forecast_exp_smoothing.test (Holt/HW/SeasonalES/SWA)
  *  - test/sql/ts_forecast_statespace.test (ETS/ARIMA incl. min-length)
  *  - test/sql/ts_forecast_auto.test (AutoETS/AutoARIMA incl. issue #192)
  *  - test/sql/ts_forecast_laplace.test (three Laplace variants)
  *  - test/comparison/test_data.sql (the 100-point deterministic
  *    pseudo-random series + trending + seasonal fixtures the reference
  *    uses to prove Rust↔C++ parity)
  *
  * Each assertion mirrors one `query`/`----` block with the reference's own
  * fixture values and tolerances; drift in any kernel fails this spec. The
  * scalar path matches `_ts_forecast`: no seasonality auto-detection, so
  * un-parameterized seasonal models run at period 1 (pinned by the
  * basic_models SeasonalNaive-repeats-last-value block). */
class ReferenceParitySpec extends AnyFunSuite {

  private def fc(values: Seq[Double], h: Int, m: String): Forecast.Output =
    Forecast.forecast(values.toArray, Array.fill(values.length)(true),
      Forecast.Options(model = Forecast.canonicalModel(m), horizon = h,
        autoDetectSeasonality = false, includeFitted = true, includeResiduals = true))

  private def fcP(values: Seq[Double], h: Int, m: String, sp: Int,
                  extra: Map[String, String] = Map.empty): Forecast.Output =
    Forecast.forecast(values.toArray, Array.fill(values.length)(true),
      Forecast.optionsFromParams(m, h, extra + ("seasonal_period" -> sp.toString)))

  // ---------------------------------------------------------------- fixtures
  private val linear10 = (1 to 10).map(_.toDouble)
  private val trendUp = Seq(10.0, 12.0, 14.0, 16.0, 18.0, 20.0, 22.0, 24.0, 26.0, 28.0)
  private val trendDown = Seq(50.0, 48.0, 46.0, 44.0, 42.0, 40.0, 38.0, 36.0, 34.0, 32.0)
  private val wave4 = Seq(1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0)
  private val wave3 = Seq(10.0, 20.0, 30.0, 10.0, 20.0, 30.0, 10.0, 20.0, 30.0)
  private val wave4c = Seq(100.0, 120.0, 140.0, 160.0, 100.0, 120.0, 140.0, 160.0,
    100.0, 120.0, 140.0, 160.0)
  private val hw16 = Seq(10.0, 20.0, 30.0, 40.0, 10.0, 20.0, 30.0, 40.0,
    10.0, 20.0, 30.0, 40.0, 10.0, 20.0, 30.0, 40.0)
  private val intermittent12 =
    Seq(0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 3.0, 0.0, 4.0, 0.0, 0.0, 6.0)

  // ts_forecast_laplace.test:14-33 — trend + weekly sinusoid (80 pts) and
  // intermittent demand (100 pts)
  private val laplaceSeasonal80 =
    (0 until 80).map(i => 10.0 + i * 0.1 + math.sin(i * math.Pi / 7.0) * 3.0)
  private val laplaceIntermittent100 = (0 until 100).map(i =>
    if (i % 5 == 0) 3.0 else if (i % 11 == 0) 2.0 else 0.0)

  // ts_forecast_statespace.test:38-43 — noisy trend (40 pts)
  private val noisyTrend40 = (0 until 40).map(i => 50.0 + i * 1.5 + (i % 5) * 3.0)

  // test/comparison/test_data.sql — the reference's deterministic
  // pseudo-random 100-point series (its Rust↔C++ parity fixture)
  private val random100 = Seq(
    10.5, 12.3, 9.8, 14.2, 11.7, 13.1, 10.9, 15.3, 12.8, 11.4,
    13.7, 9.2, 14.8, 10.1, 12.5, 11.9, 13.4, 10.7, 14.1, 12.2,
    10.3, 13.9, 11.1, 14.5, 9.6, 12.9, 13.2, 10.4, 11.6, 14.7,
    12.1, 9.9, 13.5, 10.8, 14.3, 11.5, 12.7, 13.8, 10.2, 11.8,
    14.4, 9.7, 12.6, 13.3, 10.6, 14.9, 11.3, 12.4, 13.6, 10.0,
    14.6, 11.2, 9.5, 13.0, 12.0, 10.5, 14.0, 11.0, 13.1, 12.3,
    9.8, 14.2, 11.7, 10.9, 15.3, 12.8, 11.4, 13.7, 9.2, 14.8,
    10.1, 12.5, 11.9, 13.4, 10.7, 14.1, 12.2, 10.3, 13.9, 11.1,
    14.5, 9.6, 12.9, 13.2, 10.4, 11.6, 14.7, 12.1, 9.9, 13.5,
    10.8, 14.3, 11.5, 12.7, 13.8, 10.2, 11.8, 14.4, 9.7, 12.6)

  // test/comparison/test_data.sql trending series (50 pts, slope 1.1)
  private val trending50 = (0 until 50).map(i => 1.0 + i * 1.1)

  // test/comparison/test_data.sql seasonal series (period-8 wave, 100 pts)
  private val seasonalWave = Seq(50.0, 57.8, 59.7, 54.3, 44.0, 37.2, 35.5, 40.5)
  private val seasonal100 = (0 until 100).map(i => seasonalWave(i % 8))

  // ------------------------------------------- ts_forecast_basic_models.test

  test("SMA: flat forecast = mean of last window (basic_models:57-101)") {
    val o = fc(linear10, 3, "SMA")
    assert(o.modelName == "SMA")
    assert(o.point.length == 3)
    assert(math.abs(o.point(0) - o.point(1)) < 0.01)
    assert(math.abs(o.point(1) - o.point(2)) < 0.01)
    assert(math.abs(o.point(0) - 9.0) < 0.1) // (8+9+10)/3
    assert(math.abs(fc(Seq.fill(10)(5.0), 3, "SMA").point(0) - 5.0) < 0.01)
    assert(fc(linear10, 5, "SMA").point.length == 5)
  }

  test("SeasonalNaive scalar path repeats last value at default period (basic_models:110-178)") {
    val o = fc(wave4, 4, "SeasonalNaive")
    assert(o.modelName == "SeasonalNaive")
    (0 until 4).foreach(i => assert(math.abs(o.point(i) - 4.0) < 0.01))
    val o3 = fc(wave3, 6, "SeasonalNaive")
    assert(math.abs(o3.point(0) - 30.0) < 0.01)
    assert(math.abs(o3.point(3) - 30.0) < 0.01)
    assert(fc(wave4.take(8), 6, "SeasonalNaive").point.length == 6)
    // alias names
    assert(fc(wave4.take(8), 4, "snaive").modelName == "SeasonalNaive")
    assert(fc(wave4.take(8), 4, "seasonalnaive").modelName == "SeasonalNaive")
  }

  test("SES: flat, in-range, constant fixed point (basic_models:180-245)") {
    val o = fc(linear10, 3, "SES")
    assert(o.modelName == "SES")
    assert(math.abs(o.point(0) - o.point(1)) < 0.01)
    assert(math.abs(o.point(1) - o.point(2)) < 0.01)
    assert(o.point(0) > 1.0 && o.point(0) < 10.0)
    assert(math.abs(fc(Seq.fill(10)(5.0), 3, "SES").point(0) - 5.0) < 0.01)
  }

  test("SESOptimized: flat, constant fixed point, aliases (basic_models:249-307)") {
    val o = fc(linear10, 3, "SESOptimized")
    assert(o.modelName == "SESOptimized")
    assert(math.abs(o.point(0) - o.point(2)) < 0.01)
    assert(math.abs(fc(Seq.fill(10)(7.0), 3, "SESOptimized").point(0) - 7.0) < 0.01)
    assert(fc(linear10, 3, "sesoptimized").modelName == "SESOptimized")
    assert(fc(linear10, 3, "ses_optimized").modelName == "SESOptimized")
  }

  test("RandomWalkDrift: exact line continuation (basic_models:311-346)") {
    val up = fc(linear10, 3, "RandomWalkDrift")
    assert(math.abs(up.point(0) - 11.0) < 0.1)
    assert(math.abs(up.point(1) - 12.0) < 0.1)
    assert(math.abs(up.point(2) - 13.0) < 0.1)
    val down = fc(linear10.reverse, 3, "RandomWalkDrift")
    assert(math.abs(down.point(0) - 0.0) < 0.1)
    assert(math.abs(down.point(1) - (-1.0)) < 0.1)
    assert(math.abs(fc(Seq.fill(10)(5.0), 3, "RandomWalkDrift").point(0) - 5.0) < 0.01)
  }

  // ------------------------------------------------- ts_forecast_theta.test

  test("Theta family: trend response, constant fixed point, bounds (theta:64-143)") {
    for (m <- Seq("Theta", "OptimizedTheta", "DynamicTheta", "DynamicOptimizedTheta")) {
      val o = fc(trendUp, 3, m)
      assert(o.modelName == m, s"$m name")
      assert(o.point.length == 3)
      assert(o.point(0) > 25.0, s"$m trending point ${o.point(0)}")
      assert(o.point(1) > o.point(0), s"$m increases over horizon")
      assert(fc(trendDown, 3, m).point(0) < 35.0, s"$m down-trend")
      assert(math.abs(fc(Seq.fill(10)(25.0), 3, m).point(0) - 25.0) < 1.0, s"$m constant")
      assert(o.lower(0) <= o.point(0) && o.point(0) <= o.upper(0), s"$m bounds")
      assert(o.fitted.get.length == 10 && o.residuals.get.length == 10, s"$m fitted/residuals")
    }
    assert(fc(trendUp, 3, "theta").modelName == "Theta")
    assert(fc(trendUp, 3, "AutoTheta").modelName == "AutoTheta")
  }

  // ------------------------------------------ ts_forecast_intermittent.test

  test("intermittent models: flat positive forecasts, aliases (intermittent:65-330)") {
    for (m <- Seq("CrostonClassic", "CrostonOptimized", "CrostonSBA", "ADIDA", "IMAPA", "TSB")) {
      val o = fc(intermittent12, 3, m)
      assert(o.modelName == m, s"$m name")
      assert(fc(intermittent12, 5, m).point.length == 5)
      assert(math.abs(o.point(0) - o.point(2)) < 0.01, s"$m flat")
      assert(o.point(0) > 0, s"$m positive")
      assert(o.lower(0) <= o.point(0) && o.point(0) <= o.upper(0), s"$m bounds")
    }
    assert(fc(intermittent12, 3, "croston").modelName == "CrostonClassic")
    assert(fc(intermittent12, 3, "croston_optimized").modelName == "CrostonOptimized")
    assert(fc(intermittent12, 3, "sba").modelName == "CrostonSBA")
    assert(fc(intermittent12, 3, "adida").modelName == "ADIDA")
    assert(fc(intermittent12, 3, "imapa").modelName == "IMAPA")
    assert(fc(intermittent12, 3, "tsb").modelName == "TSB")
  }

  // ----------------------------------------- ts_forecast_multi_seasonal.test

  test("MFLES/MSTL/TBATS: names, bounds, fitted lengths, MFLES variation (multi_seasonal:66-260)") {
    for (m <- Seq("MFLES", "MSTL", "TBATS")) {
      val o = fc(wave4c, 4, m)
      assert(o.modelName == m, s"$m name")
      assert(fc(wave4c, 6, m).point.length == 6)
      assert(o.lower(0) <= o.point(0) && o.point(0) <= o.upper(0), s"$m bounds")
      assert(o.fitted.get.length == 12 && o.residuals.get.length == 12, s"$m fitted")
      assert(fc(wave4c, 4, m.toLowerCase).modelName == m, s"$m case-insensitive")
    }
    // MFLES captures seasonal variation across the horizon
    val mf = fc(wave4c, 4, "MFLES")
    assert(math.abs(mf.point(0) - mf.point(1)) > 0.1)
  }

  // ------------------------------------------ ts_forecast_exp_smoothing.test

  test("Holt: trend continuation up/down, constant level (exp_smoothing:60-140)") {
    val o = fc(trendUp, 3, "Holt")
    assert(o.modelName == "Holt")
    assert(o.point(0) > 28.0) // continues above last value
    assert(o.point(1) > o.point(0))
    assert(fc(trendDown, 3, "Holt").point(0) < 32.0)
    assert(math.abs(fc(Seq.fill(10)(20.0), 3, "Holt").point(0) - 20.0) < 1.0)
    assert(o.lower(0) <= o.point(0) && o.point(0) <= o.upper(0))
    assert(o.fitted.get.length == 10)
  }

  test("HoltWinters: seasonal variation across horizon, aliases (exp_smoothing:147-232)") {
    val o = fc(hw16, 4, "HoltWinters")
    assert(o.modelName == "HoltWinters")
    assert(fc(hw16.take(12), 6, "HoltWinters").point.length == 6)
    assert(math.abs(o.point(0) - o.point(1)) > 0.1) // captures seasonality
    assert(o.lower(0) <= o.point(0) && o.point(0) <= o.upper(0))
    assert(o.fitted.get.length == 16)
    assert(fc(hw16.take(12), 4, "holtwinters").modelName == "HoltWinters")
    assert(fc(hw16.take(12), 4, "hw").modelName == "HoltWinters")
    assert(fc(hw16.take(12), 4, "holt_winters").modelName == "HoltWinters")
  }

  test("SeasonalES: seasonal variation, bounds (exp_smoothing:236-300)") {
    val o = fc(wave4c, 4, "SeasonalES")
    assert(o.modelName == "SeasonalES")
    assert(fc(wave4c, 6, "SeasonalES").point.length == 6)
    assert(math.abs(o.point(0) - o.point(1)) > 0.1)
    assert(o.lower(0) <= o.point(0) && o.point(0) <= o.upper(0))
  }

  // --------------------------------------------- ts_forecast_statespace.test

  test("ETS: trend continuation, constant, min length 3, horizon 50 (statespace:72-417)") {
    val o = fc(trendUp, 3, "ETS")
    assert(o.modelName == "ETS")
    assert(o.point(0) > 25.0)
    assert(o.point(1) > o.point(0))
    assert(math.abs(fc(Seq.fill(10)(50.0), 3, "ETS").point(0) - 50.0) < 2.0)
    assert(fc(Seq(1.0, 2.0, 3.0), 2, "ETS").point.length == 2)
    assert(fc(trendUp, 50, "ETS").point.length == 50)
    assert(o.aic.isDefined && o.bic.isDefined)
    assert(o.mse.exists(_ >= 0))
  }

  test("ARIMA: constant, min useful length 5, horizon 50 (statespace:203-417)") {
    val o = fc(trendUp, 3, "ARIMA")
    assert(o.modelName == "ARIMA")
    assert(math.abs(fc(Seq.fill(10)(40.0), 3, "ARIMA").point(0) - 40.0) < 1.0)
    assert(fc(Seq(1.0, 2.0, 3.0, 4.0, 5.0), 2, "ARIMA").point.length == 2)
    assert(fc(trendUp, 50, "ARIMA").point.length == 50)
    assert(o.aic.isDefined && o.bic.isDefined)
    assert(o.mse.exists(_ >= 0))
  }

  // --------------------------------------------------- ts_forecast_auto.test

  test("AutoETS: trend, constant series does not panic (auto; issue #192)") {
    val o = fc(trendUp, 3, "AutoETS")
    assert(o.point.length == 3)
    assert(o.lower(0) <= o.point(0) && o.point(0) <= o.upper(0))
    assert(o.fitted.get.length == 10)
    val const30 = fc(Seq.fill(30)(42.0), 5, "AutoETS")
    assert(const30.point.length == 5)
    assert(math.abs(const30.point(0) - 42.0) < 1.0)
    assert(fc(trendUp, 3, "auto_ets").modelName.startsWith("AutoETS"))
  }

  test("AutoARIMA: bounds and aliases (auto)") {
    val o = fc(trendUp, 3, "AutoARIMA")
    assert(o.point.length == 3)
    assert(o.lower(0) <= o.point(0) && o.point(0) <= o.upper(0))
    assert(fc(trendUp, 3, "auto_arima").modelName.startsWith("AutoARIMA"))
  }

  // ------------------------------------------------ ts_forecast_laplace.test

  test("Laplace variants on the trend+sin fixture (laplace:36-130)") {
    val auto = fcP(laplaceSeasonal80, 7, "Laplace", 7)
    assert(auto.point.length == 7)
    assert(auto.modelName.startsWith("Laplace(auto"))
    assert(auto.modelName.contains("seasonal=7"))
    assert(!auto.modelName.contains("batch_init"))
    (0 until 7).foreach { i =>
      assert(java.lang.Double.isFinite(auto.point(i)))
      assert(auto.lower(i) <= auto.point(i) && auto.point(i) <= auto.upper(i))
    }
    val skaters = fcP(laplaceSeasonal80, 5, "Laplace", 7, Map("laplace_variant" -> "skaters"))
    assert(skaters.modelName.startsWith("Laplace(skaters"))
    val batch = fcP(laplaceSeasonal80, 5, "Laplace", 7,
      Map("laplace_seasonal_batch_init" -> "true"))
    assert(batch.modelName.contains("batch_init"))
    // auto_aid on the intermittent fixture: non-negative forecasts
    val aid = Forecast.forecast(laplaceIntermittent100.toArray,
      Array.fill(100)(true),
      Forecast.optionsFromParams("Laplace", 7, Map("laplace_variant" -> "auto_aid")))
    assert(aid.modelName.startsWith("Laplace(auto_aid"))
    aid.point.foreach(p => assert(java.lang.Double.isFinite(p) && p >= 0.0))
  }

  test("invalid laplace_variant rejected (laplace:141-148)") {
    assertThrows[Forecast.InvalidInput] {
      Forecast.optionsFromParams("Laplace", 5, Map("laplace_variant" -> "bogus_variant"))
    }
  }

  // --------------------------- test/comparison fixtures: full 33-model sweep

  test("all 33 models produce finite ordered forecasts on the pseudo-random parity fixture") {
    // models that reject seasonal_period (the reference's MAP-API validation,
    // ts_forecast_native.cpp:270-306) run without it
    val nonSeasonal = Set("Naive", "SES", "SESOptimized", "Holt", "RandomWalkDrift",
      "ARIMA", "CrostonClassic", "CrostonOptimized", "CrostonSBA", "TSB", "ADIDA", "IMAPA")
    for ((m, _) <- Forecast.listModels) {
      val o = if (nonSeasonal(m)) fc(random100, 7, m) else fcP(random100, 7, m, 7)
      assert(o.point.length == 7, s"$m horizon")
      (0 until 7).foreach { i =>
        assert(java.lang.Double.isFinite(o.point(i)), s"$m point($i) finite")
        assert(o.lower(i) <= o.point(i) && o.point(i) <= o.upper(i), s"$m bounds($i)")
      }
      // the series lives in [9.2, 15.3] with no trend: every sane forecast
      // stays inside a generously widened band
      assert(o.point(0) > 4.0 && o.point(0) < 21.0, s"$m in-range point ${o.point(0)}")
    }
  }

  test("trending fixture: trend-capable models continue the slope (comparison harness)") {
    val lastVal = trending50.last // 54.9, slope 1.1
    for (m <- Seq("RandomWalkDrift", "Holt", "Theta", "OptimizedTheta", "AutoETS", "ETS", "AutoARIMA")) {
      val o = fc(trending50, 5, m)
      assert(o.point(0) > lastVal - 1.0, s"$m continues above last value, got ${o.point(0)}")
      assert(o.point(4) >= o.point(0) - 1e-9, s"$m non-decreasing over horizon")
    }
  }

  test("seasonal fixture: period-8 seasonal models track the wave (comparison harness)") {
    // next 8 true values are exactly the wave continuation: positions 100..107
    val expected = (100 until 108).map(i => seasonalWave(i % 8))
    val sn = fcP(seasonal100, 8, "SeasonalNaive", 8)
    (0 until 8).foreach(i => assert(math.abs(sn.point(i) - expected(i)) < 1e-9,
      s"SeasonalNaive exact at $i"))
    for (m <- Seq("HoltWinters", "SeasonalES", "AutoETS")) {
      val o = fcP(seasonal100, 8, m, 8)
      val mae = (0 until 8).map(i => math.abs(o.point(i) - expected(i))).sum / 8
      assert(mae < 3.0, s"$m tracks the wave, MAE $mae")
      // the wave's range is ~24: forecasts must actually vary with phase
      assert(o.point.max - o.point.min > 10.0, s"$m amplitude")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Forecast, MultiSeasonal}

/** Fifth golden batch: the Laplace variant surface from
  * ts_forecast_laplace.test and the TBATS/MSTL depth contracts from
  * ts_forecast_multi_seasonal.test, through the values-only scalar path. */
class ReferenceGoldensSpec5 extends AnyFunSuite {

  private def fc(values: Seq[Double], h: Int, m: String,
                 params: Map[String, String] = Map.empty,
                 period: Int = 0): Forecast.Output = {
    val base = Forecast.optionsFromParams(m, h,
      if (period > 0) params + ("seasonal_period" -> period.toString) else params)
    Forecast.forecast(values.toArray, Array.fill(values.length)(true),
      if (period > 0) base else base.copy(autoDetectSeasonality = false))
  }

  // trend + weekly seasonality, 80 points (laplace_seasonal table)
  private val laplaceSeasonal: Seq[Double] =
    (0 until 80).map(i => 10.0 + i * 0.1 + math.sin(i * math.Pi / 7.0) * 3.0)

  // mostly zeros, occasional counts (laplace_intermittent table)
  private val laplaceIntermittent: Seq[Double] =
    (0 until 100).map(i => if (i % 5 == 0) 3.0 else if (i % 11 == 0) 2.0 else 0.0)

  test("Laplace auto: horizon, finite ordered bounds (ts_forecast_laplace.test:40-55)") {
    val out = fc(laplaceSeasonal, 7, "Laplace", period = 7)
    assert(out.point.length == 7)
    (0 until 7).foreach { h =>
      assert(!out.point(h).isNaN && !out.lower(h).isNaN && !out.upper(h).isNaN)
      assert(out.lower(h) <= out.point(h) && out.point(h) <= out.upper(h))
    }
  }

  test("Laplace model_name tags variant and seasonal state (ts_forecast_laplace.test:57-72)") {
    assert(fc(laplaceSeasonal, 5, "Laplace", period = 7)
      .modelName.startsWith("Laplace(auto"))
    assert(fc(laplaceSeasonal, 5, "Laplace", period = 7)
      .modelName.contains("seasonal=7"))
    assert(fc(laplaceSeasonal, 5, "Laplace",
      Map("laplace_seasonal_batch_init" -> "true"), period = 7)
      .modelName == "Laplace(auto,seasonal=7,batch_init)")
    assert(fc(laplaceSeasonal, 5, "Laplace").modelName == "Laplace(auto)")
  }

  test("Laplace auto_aid on intermittent demand (ts_forecast_laplace.test:76-88)") {
    val out = fc(laplaceIntermittent, 7, "Laplace", Map("laplace_variant" -> "auto_aid"))
    assert(out.modelName.startsWith("Laplace(auto_aid"))
    // demand-rate leaves: strictly positive, below the max demand size
    out.point.foreach(v => assert(v > 0.0 && v < 3.0))
    // alias parsing (forecast.rs:69-71)
    assert(fc(laplaceIntermittent, 3, "Laplace", Map("laplace_variant" -> "aid"))
      .modelName.startsWith("Laplace(auto_aid"))
  }

  test("Laplace skaters variant and invalid-variant error (forecast.rs:64-76)") {
    val out = fc(laplaceSeasonal, 7, "Laplace",
      Map("laplace_variant" -> "skaters"), period = 7)
    assert(out.modelName.startsWith("Laplace(skaters"))
    out.point.foreach(v => assert(!v.isNaN && !v.isInfinite))
    val e = intercept[Forecast.FcError](
      fc(laplaceSeasonal, 3, "Laplace", Map("laplace_variant" -> "bogus")))
    assert(e.getMessage.contains("auto, auto_aid, skaters"))
  }

  test("TBATS log transform captures multiplicative seasonality") {
    // y = exp(0.02 t + 0.3 sin(2πt/7)) is exactly linear+Fourier in log space:
    // the SSE-selected transform must reproduce the continuation closely
    val y = (0 until 56).map(t => math.exp(0.02 * t + 0.3 * math.sin(2 * math.Pi * t / 7)))
    val out = MultiSeasonal.tbatsForecast(y.toArray, 7, Seq(7))
    (0 until 7).foreach { h =>
      val truth = math.exp(0.02 * (56 + h) + 0.3 * math.sin(2 * math.Pi * (56 + h) / 7))
      assert(math.abs(out(h) / truth - 1.0) < 0.01,
        s"h=$h: ${out(h)} vs $truth")
    }
  }

  test("TBATS quarterly period is full-rank safe (ts_forecast_multi_seasonal.test:31-36)") {
    // period 4 with capped harmonics: the Nyquist sin column is identically
    // zero and must not destabilize the fit
    val y = (0 until 24).map(i => 200.0 + (i % 4) * 25.0 + i * 1.5)
    val out = MultiSeasonal.tbatsForecast(y.toArray, 4, Seq(4))
    (0 until 4).foreach { h =>
      val truth = 200.0 + ((24 + h) % 4) * 25.0 + (24 + h) * 1.5
      assert(math.abs(out(h) - truth) < 2.0, s"h=$h: ${out(h)} vs $truth")
    }
  }

  test("TBATS AR(1) residual correction decays, not explodes") {
    val rnd = new scala.util.Random(7)
    val y = (0 until 60).map(i => 50.0 + 5 * math.sin(2 * math.Pi * i / 7) + rnd.nextGaussian())
    val out = MultiSeasonal.tbatsForecast(y.toArray, 14, Seq(7))
    out.foreach(v => assert(v > 30.0 && v < 70.0, s"bounded forecast, got $v"))
  }

  test("damped Holt flattens where full Holt extrapolates") {
    val y = (0 until 30).map(i => 10.0 + 2.0 * i)
    val holt = Forecast.holt(y.toArray, 20)
    val damped = MultiSeasonal.holtDamped(y.toArray, 20, 0.9)
    assert(holt(19) > damped(19), "damping must reduce long-horizon growth")
    assert(damped(19) > y.last, "but still extrapolate upward on a clean trend")
  }

  test("MSTL holdout-selected trend forecaster stays near a noisy level") {
    val rnd = new scala.util.Random(11)
    val y = (0 until 70).map(i =>
      100.0 + 8 * math.sin(2 * math.Pi * i / 7) + rnd.nextGaussian() * 3)
    val out = MultiSeasonal.mstlForecast(y.toArray, 14, Seq(7))
    out.foreach(v => assert(v > 80.0 && v < 120.0,
      s"level series must not trend away, got $v"))
  }
}

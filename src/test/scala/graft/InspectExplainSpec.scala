package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Forecast, Introspect}

/** Port of test/sql/ts_forecast_inspect_explain.test: the Tier-6
  * explainability surface — which models are Inspectable/Explainable, the
  * wide-STRUCT cross-family NULL contract, per-horizon component lengths,
  * and rejection errors for unsupported models.
  */
class InspectExplainSpec extends AnyFunSuite {

  // monthly-seasonal panel series (explain_panel, 60 obs)
  private val panel: Seq[Double] =
    (0 until 60).map(i => 10.0 + 3.0 * math.sin(2 * math.Pi * (i % 12) / 12.0) + 0.05 * i)

  private def opts(m: String, params: Map[String, String] = Map.empty): Forecast.Options =
    Forecast.optionsFromParams(m, 12, params + ("seasonal_period" -> "12"))

  private def inspect(m: String, params: Map[String, String] = Map.empty): Introspect.InspectOut =
    Introspect.inspect(panel.toArray, Array.fill(panel.length)(true), opts(m, params))

  private def explain(m: String, h: Int, params: Map[String, String] = Map.empty): Introspect.ExplainOut =
    Introspect.explain(panel.toArray, Array.fill(panel.length)(true), h,
      Forecast.optionsFromParams(m, h, params))

  test("AutoETS inspect: spec name, params, information criteria (:25-36)") {
    val out = inspect("AutoETS")
    assert(out.model_name.startsWith("AutoETS("))
    assert(out.alpha.exists(a => a >= 0 && a <= 1))
    assert(out.aic.isDefined && out.bic.isDefined)
    assert(out.coefficients.nonEmpty)
  }

  test("AutoARIMA inspect: order tuple + AIC populated (:38-47)") {
    val out = inspect("AutoARIMA")
    assert(out.model_name.startsWith("AutoARIMA("))
    assert(out.aic.isDefined)
    assert(out.order_p.isDefined && out.order_d.isDefined && out.order_q.isDefined)
  }

  test("Laplace inspect: leaf ensemble metadata (:49-58)") {
    val out = inspect("Laplace")
    assert(out.model_name.startsWith("Laplace("))
    assert(out.leaf_names.nonEmpty)
    assert(out.coefficients.length == out.leaf_names.length)
    // likelihood weights: positive, normalized
    assert(out.coefficients.forall(_ > 0))
    assert(math.abs(out.coefficients.sum - 1.0) < 1e-9)
  }

  test("AutoTheta inspect: variant populated (:60-69)") {
    val out = inspect("AutoTheta")
    assert(out.model_name == "AutoTheta")
    assert(out.phi.contains(2.0))
  }

  test("cross-family unused fields stay empty (:71-86)") {
    val arima = inspect("AutoARIMA")
    assert(arima.alpha.isEmpty && arima.beta.isEmpty && arima.gamma.isEmpty)
    val ets = inspect("AutoETS")
    assert(ets.order_p.isEmpty && ets.order_d.isEmpty && ets.order_q.isEmpty)
  }

  test("multi-seasonal inspect exposes effective periods (forecast.rs:1843-1866)") {
    Seq("MFLES", "AutoMFLES", "MSTL", "AutoMSTL", "AutoTBATS").foreach { m =>
      val out = inspect(m)
      assert(out.model_name == m)
      assert(out.coefficients == Seq(12.0), s"$m periods → ${out.coefficients}")
    }
  }

  test("non-Inspectable models rejected (:90-99)") {
    Seq("Naive", "SeasonalNaive", "ETS", "ARIMA", "Theta", "TBATS").foreach { m =>
      val e = intercept[Forecast.InvalidInput](inspect(m))
      assert(e.getMessage.contains("does not implement Inspectable"), m)
    }
  }

  test("ETS explain: level/trend/seasonal each horizon entries (:104-117)") {
    val out = explain("ETS", 12, Map("seasonal_period" -> "12"))
    assert(out.forecast_step == (1 to 12))
    assert(out.level.length == 12 && out.trend.length == 12 && out.seasonal.length == 12)
    assert(out.model_name == "ETS")
  }

  test("Theta and MSTL explain horizons (:119-139)") {
    val t = explain("Theta", 6, Map("seasonal_period" -> "12"))
    assert(t.forecast_step == (1 to 6) && t.level.length == 6)
    val m = explain("MSTL", 4, Map("seasonal_periods" -> "12"))
    assert(m.forecast_step == (1 to 4) && m.level.length == 4)
    assert(m.model_name == "MSTL")
  }

  test("ETS explain decomposition sums to the fixed-spec forecast path") {
    val params = Map("seasonal_period" -> "12", "model" -> "AAA")
    val fc = Forecast.forecast(panel.toArray, Array.fill(panel.length)(true),
      Forecast.optionsFromParams("ETS", 5, params))
    val ex = explain("ETS", 5, params)
    (0 until 5).foreach { i =>
      assert(math.abs(ex.level(i) + ex.trend(i) + ex.seasonal(i) - fc.point(i)) < 1e-9)
    }
  }

  test("non-Explainable models rejected incl. Auto* (:143-152)") {
    Seq("AutoETS", "Naive", "AutoTheta", "OptimizedTheta", "DynamicTheta").foreach { m =>
      val e = intercept[Forecast.InvalidInput](explain(m, 4))
      assert(e.getMessage.contains("does not implement Explainable"), m)
    }
  }
}

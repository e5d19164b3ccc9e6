package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Ets, Forecast}

/** Port of test/sql/ts_forecast_ets_model.test: the ETS `model` parameter —
  * explicit specs pass through and fit, invalid notation errors, unstable
  * FPP3 combinations are rejected (as fixed specs AND from the auto pools),
  * and the parameter is ETS-only.
  */
class EtsModelSpecSpec extends AnyFunSuite {

  // trend + weekly wave, 84 points (test_ets series A)
  private val seriesA: Seq[Double] =
    (0 until 84).map(i => 100.0 + i * 0.5 + math.sin(i * 2 * 3.14159 / 7) * 10.0)

  private def fc(params: Map[String, String]): Forecast.Output =
    Forecast.forecast(seriesA.toArray, Array.fill(seriesA.length)(true),
      Forecast.optionsFromParams("ETS", 7, params + ("seasonal_period" -> "7")))

  test("explicit specs AAA and ANN fit and forecast (:50-60)") {
    Seq("AAA", "ANN").foreach { spec =>
      val out = fc(Map("model" -> spec))
      assert(out.point.length == 7 && out.point.forall(v => !v.isNaN && v > 0), spec)
    }
  }

  test("invalid notation rejected (:66-76)") {
    Seq("XYZ", "123", "AA", "AAAAA").foreach { bad =>
      val e = intercept[Forecast.InvalidInput](fc(Map("model" -> bad)))
      assert(e.getMessage.contains("Invalid ETS model specification"), bad)
    }
  }

  test("unstable multiplicative-error/additive-seasonal specs rejected (:82-92)") {
    Seq("MAA", "MAdA", "MNA", "MMA").foreach { bad =>
      val e = intercept[Forecast.InvalidInput](fc(Map("model" -> bad)))
      assert(e.getMessage.contains("unstable"), bad)
    }
    // the suggested alternatives all parse
    Seq("AAA", "ANA", "AAdA", "MNM", "MAM", "MAdM", "MMM", "MMdM")
      .foreach(s => Ets.parseSpec(s))
  }

  test("auto pools never contain an unstable combination") {
    Seq(None, Some("complete"), Some("no_multiplicative_trend"),
      Some("damped_trend_only"), Some("match_error_seasonal"), Some("reduced"))
      .foreach { pool =>
        val specs = Ets.pool(pool, seasonal = true)
        assert(specs.nonEmpty)
        assert(!specs.exists(sp => sp.error == 'M' && sp.seasonal == 'A'),
          s"pool $pool contains unstable combos")
      }
  }

  test("'model' param is ETS-only; unknown keys error (:98-108)") {
    val e = intercept[Forecast.InvalidInput](
      Forecast.optionsFromParams("Naive", 7, Map("model" -> "AAA")))
    assert(e.getMessage.contains("only valid when method='ETS'"))
    val e2 = intercept[Forecast.InvalidInput](
      Forecast.optionsFromParams("ETS", 7, Map("methd" -> "AAA")))
    assert(e2.getMessage.contains("Unknown parameter"))
    // confidence_level without a model spec is fine
    assert(fc(Map("confidence_level" -> "0.95")).point.length == 7)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels._
import graft.types.{FreqType, Frequency}

class FrequencySpec extends AnyFunSuite {
  private val Day = 86400000000L

  test("polars grammar") {
    assert(Frequency.parse("1d").micros == Day)
    assert(Frequency.parse("30m").micros == 30L * 60 * 1000000)
    assert(Frequency.parse("1h").micros == 3600L * 1000000)
    assert(Frequency.parse("2w").micros == 14 * Day)
    assert(Frequency.parse("1mo").tpe == FreqType.Monthly)
    assert(Frequency.parse("2q").tpe == FreqType.Quarterly)
    assert(Frequency.parse("1y").tpe == FreqType.Yearly)
  }

  test("interval grammar and raw ints") {
    assert(Frequency.parse("1 day").micros == Day)
    assert(Frequency.parse("7 days").micros == 7 * Day)
    assert(Frequency.parse("1 month").tpe == FreqType.Monthly)
    val raw = Frequency.parse("7")
    assert(raw.isRaw && raw.micros == 7 * Day)
    intercept[IllegalArgumentException](Frequency.parse("1 fortnight"))
  }

  test("month-end clamping: Jan 31 + 1mo = Feb 28, + 2mo = Mar 31") {
    val jan31 = java.time.LocalDateTime.of(2023, 1, 31, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val f = Frequency.parse("1mo")
    def d(m: Long) = java.time.LocalDateTime.ofEpochSecond(m / 1000000L, 0, java.time.ZoneOffset.UTC)
    assert(d(f.advance(jan31, 1)).toLocalDate.toString == "2023-02-28")
    assert(d(f.advance(jan31, 2)).toLocalDate.toString == "2023-03-31")
    // leap year
    val jan31_24 = java.time.LocalDateTime.of(2024, 1, 31, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(d(f.advance(jan31_24, 1)).toLocalDate.toString == "2024-02-29")
  }
}

class MetricsSpec extends AnyFunSuite {
  private val eps = 1e-9

  // goldens from reference test/sql/ts_metrics.test
  test("mae exact golden") {
    assert(math.abs(Metrics.mae(Array(1, 2, 3), Array(2, 3, 4)) - 1.0) < eps)
  }
  test("mse/rmse") {
    assert(math.abs(Metrics.mse(Array(1, 2, 3), Array(2, 3, 4)) - 1.0) < eps)
    assert(math.abs(Metrics.rmse(Array(1, 2, 3), Array(3, 4, 5)) - 2.0) < eps)
  }
  test("mape skips zero actuals") {
    val v = Metrics.mape(Array(0.0, 100.0), Array(10.0, 110.0))
    assert(math.abs(v - 10.0) < eps) // only the 100→110 term
  }
  test("smape symmetric") {
    val v = Metrics.smape(Array(100.0), Array(110.0))
    assert(math.abs(v - 100.0 * 2 * 10 / 210) < eps)
  }
  test("mase vs naive scale") {
    val train = Array(1.0, 2.0, 3.0, 4.0) // naive in-sample MAE = 1
    val v = Metrics.mase(Array(5.0, 6.0), Array(4.0, 5.0), train, 1)
    assert(math.abs(v - 1.0) < eps)
  }
  test("coverage") {
    assert(math.abs(Metrics.coverage(Array(1, 5, 10), Array(0, 0, 0), Array(2, 2, 20)) - 2.0 / 3) < eps)
  }
  test("quantile loss") {
    // q=0.5 is half the MAE
    assert(math.abs(Metrics.quantileLoss(Array(1, 2), Array(2, 4), 0.5) - 0.75) < eps)
  }
  test("r2 perfect fit") {
    assert(math.abs(Metrics.r2(Array(1, 2, 3), Array(1, 2, 3)) - 1.0) < eps)
  }
}

class ImputationSpec extends AnyFunSuite {
  test("interpolate interior and edges") {
    val v = Array(Double.NaN, 2.0, Double.NaN, Double.NaN, 8.0, Double.NaN)
    val valid = Array(false, true, false, false, true, false)
    val out = Imputation.fillInterpolate(v, valid)
    assert(out.toSeq == Seq(2.0, 2.0, 4.0, 6.0, 8.0, 8.0))
  }
  test("all null stays NaN") {
    val out = Imputation.fillInterpolate(Array(Double.NaN, Double.NaN), Array(false, false))
    assert(out.forall(_.isNaN))
  }
  test("locf and nocb") {
    val v = Array(Double.NaN, 1.0, Double.NaN, 3.0)
    val valid = Array(false, true, false, true)
    val (f, fv) = Imputation.fillForward(v, valid)
    assert(!fv(0) && f(1) == 1.0 && f(2) == 1.0 && f(3) == 3.0)
    val (b, bv) = Imputation.fillBackward(v, valid)
    assert(b(0) == 1.0 && b(2) == 3.0 && bv(0))
  }
}

class ForecastKernelSpec extends AnyFunSuite {
  private val eps = 1e-9
  private def allValid(v: Array[Double]) = Array.fill(v.length)(true)

  test("naive repeats last; CI uses population sigma of history") {
    val y = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val out = Forecast.forecast(y, allValid(y),
      Forecast.Options(model = "Naive", horizon = 3))
    assert(out.point.toSeq == Seq(5.0, 5.0, 5.0))
    val sigma = math.sqrt(2.0) // pop variance of 1..5 = 2
    assert(math.abs(out.lower(0) - (5.0 - 1.96 * sigma)) < eps)
    assert(math.abs(out.upper(2) - (5.0 + 1.96 * sigma * math.sqrt(3))) < eps)
    assert(out.modelName == "Naive")
  }

  test("seasonal naive with explicit period") {
    val y = Array(1.0, 2.0, 3.0, 10.0, 20.0, 30.0)
    val out = Forecast.forecast(y, allValid(y),
      Forecast.Options(model = "SeasonalNaive", horizon = 4,
        seasonalPeriod = 3, autoDetectSeasonality = false))
    assert(out.point.toSeq == Seq(10.0, 20.0, 30.0, 10.0))
  }

  test("drift") {
    val y = Array(1.0, 2.0, 3.0, 4.0)
    val out = Forecast.forecast(y, allValid(y), Forecast.Options(model = "RandomWalkDrift", horizon = 2))
    assert(out.point.toSeq == Seq(5.0, 6.0))
  }

  test("sma with window") {
    val y = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val out = Forecast.forecast(y, allValid(y),
      Forecast.Options(model = "SMA", horizon = 2, window = 3))
    assert(out.point.toSeq == Seq(5.0, 5.0))
  }

  test("ses fixed alpha 0.3") {
    val y = Array(10.0, 12.0, 14.0)
    // level: 10 -> .3*12+.7*10=10.6 -> .3*14+.7*10.6=11.62
    val out = Forecast.forecast(y, allValid(y), Forecast.Options(model = "SES", horizon = 1))
    assert(math.abs(out.point(0) - 11.62) < eps)
  }

  test("insufficient data errors") {
    intercept[Forecast.InsufficientData] {
      Forecast.forecast(Array(1.0, 2.0), Array(true, true), Forecast.Options(model = "Naive"))
    }
  }

  test("explicit seasonal period on non-seasonal model errors") {
    intercept[Forecast.InvalidInput] {
      Forecast.forecast(Array(1.0, 2.0, 3.0, 4.0), Array(true, true, true, true),
        Forecast.Options(model = "Naive", seasonalPeriod = 7, autoDetectSeasonality = false))
    }
  }

  test("nulls interpolated before fitting") {
    val y = Array(1.0, Double.NaN, 3.0, 4.0)
    val valid = Array(true, false, true, true)
    val out = Forecast.forecast(y, valid, Forecast.Options(model = "Naive", horizon = 1))
    assert(out.point(0) == 4.0)
  }

  test("optimized ses beats fixed on trending data (lower in-sample SSE)") {
    val y = Array.tabulate(30)(i => 10.0 + i) // strong trend → alpha near 1 optimal
    val opt = Forecast.sesOptimized(y, 1)(0)
    val fixed = Forecast.sesForecast(y, 1, 0.3)(0)
    assert(opt > fixed) // optimized tracks the trend more closely
  }

  test("holt extrapolates linear trend") {
    val y = Array.tabulate(30)(i => 5.0 + 2.0 * i)
    val out = Forecast.holt(y, 3)
    assert(math.abs(out(0) - (5.0 + 2.0 * 30)) < 0.5)
    assert(math.abs(out(2) - (5.0 + 2.0 * 32)) < 0.8)
  }

  test("holt-winters captures additive seasonality") {
    val season = Array(10.0, -5.0, 0.0, -5.0)
    val y = Array.tabulate(40)(i => 100.0 + season(i % 4))
    val out = Forecast.holtWinters(y, 4, 4)
    (0 until 4).foreach { h =>
      assert(math.abs(out(h) - (100.0 + season((40 + h) % 4))) < 1.5, s"h=$h got ${out(h)}")
    }
  }

  test("croston on intermittent demand") {
    val y = Array(0.0, 3.0, 0.0, 0.0, 3.0, 0.0, 3.0, 0.0, 0.0)
    val out = Forecast.croston(y, 2, optimize = false, sba = false)
    assert(out(0) > 0.0 && out(0) < 3.0)
    val sba = Forecast.croston(y, 1, optimize = false, sba = true)
    assert(math.abs(sba(0) - out(0) * 0.95) < eps)
  }

  test("tsb zero demand gives zero") {
    assert(Forecast.tsb(Array(0.0, 0.0, 0.0), 2, 0.2, 0.2).toSeq == Seq(0.0, 0.0))
  }

  test("model aliases canonicalize") {
    assert(Forecast.canonicalModel("snaive") == "SeasonalNaive")
    assert(Forecast.canonicalModel("AUTO_ETS") == "AutoETS")
    assert(Forecast.canonicalModel("drift") == "RandomWalkDrift")
    intercept[Forecast.InvalidModel](Forecast.canonicalModel("nope"))
  }

  test("ETS AAA on seasonal+trend data") {
    val season = Array(5.0, -2.0, -3.0, 0.0)
    val y = Array.tabulate(48)(i => 50.0 + 0.5 * i + season(i % 4))
    val (point, name, aic, _) = Ets.forecastEts(y, 4, 4, Some("AAA"))
    assert(name == "ETS")
    assert(aic.isDefined)
    (0 until 4).foreach { h =>
      val expected = 50.0 + 0.5 * (48 + h) + season((48 + h) % 4)
      assert(math.abs(point(h) - expected) < 2.5, s"h=$h got ${point(h)} want $expected")
    }
  }

  test("AutoETS picks a seasonal model on strongly seasonal data") {
    val season = Array(20.0, -10.0, -5.0, -5.0)
    val y = Array.tabulate(40)(i => 100.0 + season(i % 4))
    val (point, name, _, _) = Ets.autoEts(y, 4, 4, None)
    assert(name.startsWith("AutoETS("))
    (0 until 4).foreach { h =>
      assert(math.abs(point(h) - (100.0 + season((40 + h) % 4))) < 4.0, s"h=$h got ${point(h)}")
    }
  }

  test("theta on linear trend tracks the trend") {
    val y = Array.tabulate(50)(i => 3.0 + 1.5 * i)
    val out = Forecast.theta(y, 3, 1, dynamic = false, optimizeTheta = false)
    assert(math.abs(out(0) - (3.0 + 1.5 * 50)) < 2.0, s"got ${out(0)}")
  }

  test("seasonality detection finds planted period") {
    val y = Array.tabulate(60)(i => math.sin(2 * math.Pi * i / 12.0) * 10 + 50)
    val ps = Seasonality.detectSeasonality(y, None)
    assert(ps.nonEmpty && ps.head == 12, s"got ${ps.toSeq}")
  }
}

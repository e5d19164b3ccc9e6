package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels._

class FftSpec extends AnyFunSuite {
  test("fft of a pure sinusoid concentrates power at its frequency") {
    val n = 64
    val y = Array.tabulate(n)(i => math.sin(2 * math.Pi * i / 8.0))
    val (freqs, power) = Fft.periodogram(y)
    val peak = freqs(power.indexOf(power.max))
    assert(math.abs(1.0 / peak - 8.0) < 0.5, s"peak period ${1.0 / peak}")
  }
}

class PeriodsSpec extends AnyFunSuite {
  private val y12 = Array.tabulate(96)(i => 50 + 10 * math.sin(2 * math.Pi * i / 12.0))

  test("fft estimator finds the planted period") {
    val p = Periods.estimatePeriodFft(y12)
    assert(math.abs(p.period - 12.0) < 1.5, s"got ${p.period}")
    assert(p.confidence > Periods.MinConfidenceFft)
  }

  test("acf estimator finds the planted period") {
    val p = Periods.estimatePeriodAcf(y12)
    assert(math.abs(p.period - 12.0) < 1.0, s"got ${p.period}")
  }

  test("autoperiod validates FFT candidate on ACF") {
    val p = Periods.autoperiod(y12)
    assert(math.abs(p.period - 12.0) < 1.5, s"got ${p.period}")
  }

  test("aic comparison picks the seasonal-means period") {
    val p = Periods.aicPeriod(y12, 30)
    assert(math.abs(p.period - 12.0) < 0.5, s"got ${p.period}")
  }

  test("stl grid search finds the period") {
    val p = Periods.stlPeriod(y12, 30)
    assert(math.abs(p.period - 12.0) < 1.0, s"got ${p.period}")
  }

  test("multi detects two planted periods") {
    val y = Array.tabulate(240)(i =>
      10 * math.sin(2 * math.Pi * i / 12.0) + 5 * math.sin(2 * math.Pi * i / 5.0))
    val ps = Periods.detectMultiplePeriods(y, 5, 60)
    val found = ps.map(_.period)
    assert(found.exists(p => math.abs(p - 12) < 1.5), s"12 not in $found")
    assert(found.exists(p => math.abs(p - 5) < 1.0), s"5 not in $found")
  }

  test("dispatch filters below-threshold noise") {
    val rnd = new scala.util.Random(1)
    val noise = Array.fill(64)(rnd.nextGaussian())
    val r = Periods.detectPeriods(noise, "acf", minConfidence = Some(0.95))
    assert(r.periods.isEmpty && r.primaryPeriod == 0.0)
  }

  test("lomb-scargle on regular sinusoid") {
    val p = Periods.lombScargle(y12, None, 30)
    assert(math.abs(p.period - 12.0) < 1.5, s"got ${p.period}")
  }
}

class DecompositionSpec extends AnyFunSuite {
  test("classical additive recovers seasonal amplitude") {
    val season = Array(6.0, -2.0, -4.0, 0.0)
    val y = Array.tabulate(48)(i => 100 + 0.5 * i + season(i % 4))
    val c = Decomposition.classical(y, 4, multiplicative = false)
    (0 until 4).foreach { k =>
      assert(math.abs(c.indices(k) - season(k)) < 0.5, s"k=$k got ${c.indices(k)}")
    }
  }

  test("stl separates trend and seasonality") {
    val season = Array(10.0, -5.0, -5.0, 0.0)
    val y = Array.tabulate(60)(i => 20 + 0.3 * i + season(i % 4))
    val r = Decomposition.stl(y, 4)
    // remainder should be small relative to the signal
    val remVar = r.remainder.map(v => v * v).sum / r.remainder.length
    assert(remVar < 2.0, s"remainder variance $remVar")
  }

  test("seasonal strength high for seasonal, low for noise") {
    val season = Array(10.0, -10.0)
    val ySeasonal = Array.tabulate(40)(i => 5.0 + season(i % 2))
    assert(Decomposition.seasonalStrengthAt(ySeasonal, 2) > 0.9)
    val rnd = new scala.util.Random(3)
    val yNoise = Array.fill(40)(rnd.nextGaussian())
    assert(Decomposition.seasonalStrengthAt(yNoise, 7) < 0.6)
  }
}

class DetrendSpec extends AnyFunSuite {
  test("linear detrend flattens a line") {
    val y = Array.tabulate(30)(i => 2.0 + 3.0 * i)
    val r = Detrend.linear(y)
    assert(r.detrended.forall(v => math.abs(v) < 1e-6))
    assert(math.abs(r.coefficients(1) - 3.0) < 1e-8)
  }

  test("diff detrend") {
    val y = Array(1.0, 3.0, 6.0, 10.0)
    val r = Detrend.diff(y, 1)
    assert(r.detrended(1) == 2.0 && r.detrended(3) == 4.0 && r.detrended(0).isNaN)
  }

  test("auto picks something sensible on a cubic") {
    val y = Array.tabulate(40)(i => 0.01 * i * i * i - 0.2 * i * i + i)
    val r = Detrend.auto(y)
    assert(r.method.startsWith("auto:"))
    assert(r.rss < Detrend.linear(y).rss)
  }
}

class ArimaSpec extends AnyFunSuite {
  test("AR(1) is recovered approximately") {
    val rnd = new scala.util.Random(11)
    val n = 300
    val y = new Array[Double](n)
    y(0) = 0.0
    (1 until n).foreach(i => y(i) = 5.0 + 0.7 * y(i - 1) + rnd.nextGaussian())
    val f = Arima.fit(y, 1, 0, 0).get
    assert(math.abs(f.phi(0) - 0.7) < 0.15, s"phi=${f.phi(0)}")
  }

  test("autoarima forecasts a trending series upward") {
    val rnd = new scala.util.Random(5)
    val y = Array.tabulate(80)(i => 10.0 + 0.8 * i + rnd.nextGaussian() * 0.5)
    val (fc, name, _, _) = Arima.autoArima(y, 5)
    assert(name.startsWith("AutoARIMA("))
    assert(fc(4) > y.last, s"fc=${fc.toSeq}")
    assert(math.abs(fc(0) - (10.0 + 0.8 * 80)) < 6.0, s"fc0=${fc(0)}")
  }

  test("seasonal differencing kicks in for strongly seasonal data") {
    val season = Array(30.0, -10.0, -15.0, -5.0)
    val y = Array.tabulate(60)(i => 100.0 + season(i % 4))
    val (fc, name, _, _) = Arima.autoArima(y, 4, period = 4)
    assert(name.contains("[4]"), name)
    (0 until 4).foreach { h =>
      assert(math.abs(fc(h) - (100.0 + season((60 + h) % 4))) < 8.0, s"h=$h got ${fc(h)}")
    }
  }
}

class FeaturesSpec extends AnyFunSuite {
  test("catalog has 117 features and extract covers all of them") {
    assert(Features.allNames.length == 117)
    val y = Array.tabulate(50)(i => math.sin(i * 0.5) * 10 + i * 0.1)
    val f = Features.extract(y)
    assert(f.size == 117)
    assert(Features.allNames.forall(f.contains))
  }

  test("basic feature values") {
    val y = Array(1.0, 2.0, 2.0, 3.0)
    val f = Features.extract(y)
    assert(f("length") == 4.0 && f("sum") == 8.0 && f("mean") == 2.0)
    assert(f("minimum") == 1.0 && f("maximum") == 3.0)
    assert(f("has_duplicate") == 1.0 && f("has_duplicate_max") == 0.0)
    assert(f("count_unique") == 3.0)
    assert(f("absolute_sum_of_changes") == 2.0)
    assert(f("mean_change") == (3.0 - 1.0) / 3)
  }

  test("entropy features sane on periodic vs random") {
    val periodic = Array.tabulate(100)(i => (i % 4).toDouble)
    val rnd = new scala.util.Random(7)
    val random = Array.fill(100)(rnd.nextGaussian())
    val fp = Features.extract(periodic)
    val fr = Features.extract(random)
    assert(fp("permutation_entropy") < fr("permutation_entropy"))
    assert(fp("sample_entropy").isNaN || fp("sample_entropy") < fr("sample_entropy"))
  }

  test("pacf lag1 equals acf lag1") {
    val y = Array.tabulate(60)(i => math.sin(i * 0.3))
    val f = Features.extract(y)
    assert(math.abs(f("partial_autocorrelation_lag1") - f("autocorrelation_lag1")) < 1e-9)
  }
}

class MultiSeasonalSpec extends AnyFunSuite {
  private val season7 = Array(12.0, -3.0, -5.0, 2.0, -4.0, 6.0, -8.0)
  private val y = Array.tabulate(70)(i => 100.0 + 0.2 * i + season7(i % 7))

  test("mstl forecast tracks the seasonal pattern") {
    val fc = MultiSeasonal.mstlForecast(y, 7, Seq(7))
    (0 until 7).foreach { h =>
      val expected = 100.0 + 0.2 * (70 + h) + season7((70 + h) % 7)
      assert(math.abs(fc(h) - expected) < 5.0, s"h=$h got ${fc(h)} want $expected")
    }
  }

  test("mfles forecast tracks trend + season") {
    val fc = MultiSeasonal.mflesForecast(y, 7, Seq(7))
    (0 until 7).foreach { h =>
      val expected = 100.0 + 0.2 * (70 + h) + season7((70 + h) % 7)
      assert(math.abs(fc(h) - expected) < 6.0, s"h=$h got ${fc(h)} want $expected")
    }
  }

  test("tbats forecast is finite and seasonal") {
    val fc = MultiSeasonal.tbatsForecast(y, 7, Seq(7))
    assert(fc.forall(java.lang.Double.isFinite))
    (0 until 7).foreach { h =>
      val expected = 100.0 + 0.2 * (70 + h) + season7((70 + h) % 7)
      assert(math.abs(fc(h) - expected) < 8.0, s"h=$h got ${fc(h)} want $expected")
    }
  }

  test("laplace mixture is finite and rejects constants") {
    val fc = MultiSeasonal.laplaceForecast(y, 5, 7)
    assert(fc.forall(java.lang.Double.isFinite))
    intercept[Forecast.ComputationError](
      MultiSeasonal.laplaceForecast(Array.fill(20)(3.0), 3, 1))
  }
}

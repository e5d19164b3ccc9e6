package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Periods

/** Port of test/sql/ts_periods_advanced.test + ts_periods_specialized.test
  * method coverage: all 13 detection methods recover a planted period-8
  * sinusoid (the same construction the driver queries plant on TPC-H dates).
  */
class PeriodsMethodsSpec extends AnyFunSuite {

  // 64 samples of 10 + sin(2π·i/8) — 8 whole cycles
  private val sin8: Array[Double] =
    Array.tabulate(64)(i => 10.0 + math.sin((i + 1) * 2.0 * math.Pi / 8.0))

  private val allMethods = Seq("fft", "acf", "regression", "multi", "autoperiod",
    "cfd_autoperiod", "lomb_scargle", "aic", "ssa", "stl", "matrix_profile", "sazed")

  test("every detection method recovers the planted period 8") {
    allMethods.foreach { m =>
      val r = Periods.detectPeriods(sin8, m, minConfidence = Some(0.0))
      assert(math.abs(r.primaryPeriod - 8.0) < 0.55,
        s"$m → ${r.primaryPeriod} (${r.method})")
    }
  }

  test("white-noise-free constant series reports no seasonality") {
    val flat = Array.fill(48)(5.0)
    Seq("fft", "acf", "autoperiod").foreach { m =>
      val r = Periods.detectPeriods(flat, m)
      assert(r.periods.isEmpty || r.primaryPeriod == 0.0 || r.method.contains("no seasonality"),
        s"$m → ${r.primaryPeriod}")
    }
  }

  // ts_periods_specialized.test fixtures
  private val sawtooth4: Array[Double] =
    Array.tabulate(32)(i => Seq(10.0, 20.0, 30.0, 40.0)(i % 4))
  private val weekly7: Array[Double] =
    Array.tabulate(28)(i => Seq(100.0, 120.0, 140.0, 160.0, 180.0, 200.0, 150.0)(i % 7))
  private val short8: Array[Double] = Array.tabulate(8)(i => if (i % 2 == 0) 10.0 else 20.0)

  test("specialized methods detect the sawtooth period 4 (ts_periods_specialized.test:380-393)") {
    Seq("aic", "ssa", "stl", "matrix_profile", "sazed").foreach { m =>
      val r = Periods.detectPeriods(sawtooth4, m, minConfidence = Some(0.0))
      assert(math.abs(r.primaryPeriod - 4.0) < 2.0, s"$m → ${r.primaryPeriod}")
      assert(r.primaryPeriod > 0, m)
    }
  }

  test("aic detects the weekly period on 28 points (:389-393)") {
    val r = Periods.detectPeriods(weekly7, "aic", minConfidence = Some(0.0))
    assert(math.abs(r.primaryPeriod - 7.0) < 2.0, r.primaryPeriod)
  }

  test("minimum lengths match the reference (:428-455; periods.rs:669-1267)") {
    // aic works at 8 points
    assert(Periods.aicPeriod(short8).period > 0)
    // ssa/stl need 16, matrix profile 32, sazed 16 — all reject the 8-point series
    Seq[(String, Array[Double] => Periods.DetectedPeriod)](
      ("ssa", Periods.ssaPeriod(_)), ("stl", Periods.stlPeriod(_)),
      ("matrix_profile", Periods.matrixProfilePeriod(_)), ("sazed", Periods.sazedPeriod(_)))
      .foreach { case (name, f) =>
        val e = intercept[IllegalArgumentException](f(short8))
        assert(e.getMessage.contains("insufficient data"), name)
      }
    // matrix profile also rejects 16 points (needs 32)
    intercept[IllegalArgumentException](Periods.matrixProfilePeriod(sawtooth4.take(16)))
  }

  test("ssa eigenpair share is near 1 for a pure tone, low for noise") {
    val pure = Periods.ssaPeriod(sin8)
    assert(math.abs(pure.period - 8.0) < 0.5 && pure.confidence > 0.9,
      s"${pure.period} @ ${pure.confidence}")
    // deterministic pseudo-noise: no dominant eigenpair
    val noise = Array.tabulate(64)(i => math.sin(i * 2.399963) * math.cos(i * 1.111))
    val r = Periods.ssaPeriod(noise)
    assert(r.confidence < 0.7, s"noise share ${r.confidence}")
  }

  test("sazed survives amplitude-modulated and noisy waves") {
    val modulated = Array.tabulate(96)(i =>
      10.0 + (1.0 + 0.3 * math.sin(i * 0.05)) * math.sin(2 * math.Pi * i / 8.0)
        + 0.2 * math.sin(i * 2.399963))
    val r = Periods.sazedPeriod(modulated)
    assert(math.abs(r.period - 8.0) < 1.0, s"${r.period}")
    assert(r.confidence >= 0.5)
  }

  test("method aliases parse to the same estimator (ts_periods.test alias grammar)") {
    assert(Periods.parseMethod("periodogram") == "fft")
    assert(Periods.parseMethod("lomb-scargle") == "lomb_scargle")
    assert(Periods.parseMethod("matrixprofile") == "matrix_profile")
    assert(Periods.parseMethod("enhanced_dft") == "sazed")
    assert(Periods.parseMethod("cfdautoperiod") == "cfd_autoperiod")
    assert(Periods.parseMethod("singular_spectrum") == "ssa")
  }
}

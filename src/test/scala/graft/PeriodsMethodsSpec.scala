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

  test("method aliases parse to the same estimator (ts_periods.test alias grammar)") {
    assert(Periods.parseMethod("periodogram") == "fft")
    assert(Periods.parseMethod("lomb-scargle") == "lomb_scargle")
    assert(Periods.parseMethod("matrixprofile") == "matrix_profile")
    assert(Periods.parseMethod("enhanced_dft") == "sazed")
    assert(Periods.parseMethod("cfdautoperiod") == "cfd_autoperiod")
    assert(Periods.parseMethod("singular_spectrum") == "ssa")
  }
}

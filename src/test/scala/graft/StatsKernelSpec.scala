package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels._
import graft.types.Frequency

class StatsSpec extends AnyFunSuite {
  private val eps = 1e-9
  private def ok(n: Int) = Array.fill(n)(true)

  test("basic moments and counts") {
    val y = Array(1.0, 2.0, 0.0, -3.0, 2.0)
    val s = Stats.compute(y, ok(5))
    assert(s.length == 5 && s.n_zeros == 1 && s.n_positive == 3 && s.n_negative == 1)
    assert(s.n_unique_values == 4 && !s.is_constant)
    assert(math.abs(s.mean - 0.4) < eps)
    assert(math.abs(s.sum - 2.0) < eps)
    assert(math.abs(s.min - (-3.0)) < eps && math.abs(s.max - 2.0) < eps)
    // sample variance: sum((x-0.4)^2)/4
    val sv = y.map(v => (v - 0.4) * (v - 0.4)).sum / 4
    assert(math.abs(s.variance - sv) < eps)
  }

  test("percentile linear interpolation matches duckdb quantile_cont") {
    val sorted = Array(1.0, 2.0, 3.0, 4.0)
    assert(math.abs(Stats.percentile(sorted, 0.5) - 2.5) < eps)
    assert(math.abs(Stats.percentile(sorted, 0.25) - 1.75) < eps)
  }

  test("nulls and NaN counted separately") {
    val y = Array(1.0, Double.NaN, 3.0, 0.0)
    val valid = Array(true, true, true, false)
    val s = Stats.compute(y, valid)
    assert(s.n_nulls == 1 && s.n_nan == 1 && s.length == 4)
  }

  test("leading/trailing zeros and plateaus") {
    val y = Array(0.0, 0.0, 5.0, 5.0, 5.0, 2.0, 0.0)
    val s = Stats.compute(y, ok(7))
    assert(s.n_zeros_start == 2 && s.n_zeros_end == 1)
    assert(s.plateau_size == 3 && s.plateau_size_nonzero == 3)
  }

  test("gap counting with dates at fixed frequency") {
    val day = 86400000000L
    val dates = Array(0L, day, 2 * day, 5 * day, 6 * day) // gap between 2 and 5
    val y = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val s = Stats.computeWithDates(y, ok(5), dates, Frequency.parse("1d"))
    assert(s.expected_length.contains(7L))
    assert(s.n_gaps.contains(1L))
  }

  test("constant series flags") {
    val s = Stats.compute(Array(2.0, 2.0, 2.0), ok(3))
    assert(s.is_constant && s.n_unique_values == 1)
  }
}

class ConformalSpec extends AnyFunSuite {
  private val eps = 1e-9

  test("conformal quantile uses finite-sample level") {
    val r = Array(0.5, -0.3, 0.8, -0.2, 0.4)
    // n=5, level = ceil(6*0.9)/5 = 6/5 -> clamp 1.0 -> max abs = 0.8
    assert(math.abs(Conformal.conformalQuantile(r, 0.1) - 0.8) < eps)
    // alpha=0.5: level = ceil(6*0.5)/5 = 0.6 -> idx 0.6*4=2.4 over sorted [.2,.3,.4,.5,.8]
    val q = Conformal.conformalQuantile(r, 0.5)
    assert(math.abs(q - (0.4 * 0.6 + 0.5 * 0.4)) < eps)
  }

  test("symmetric intervals") {
    val (lo, hi, q) = Conformal.conformalPredict(Array(1.0, -1.0, 2.0, -2.0), Array(10.0), 0.1)
    assert(lo(0) == 10.0 - q && hi(0) == 10.0 + q)
  }

  test("asymmetric uses per-tail quantiles") {
    val r = Array(1.0, 2.0, 3.0, -0.5, -0.1)
    val (lo, hi, _) = Conformal.conformalPredictAsymmetric(r, Array(0.0), 0.2)
    assert(hi(0) > 0 && lo(0) < 0)
    assert(hi(0) > -lo(0)) // positive residuals dominate
  }

  test("bootstrap intervals widen with horizon and are deterministic") {
    val res = Array(-1.0, 1.0, -0.5, 0.5, 2.0, -2.0)
    val fc = Array(10.0, 10.0, 10.0, 10.0)
    val (lo1, hi1) = Conformal.bootstrapIntervals(res, fc, 500, 0.9, seed = 7)
    val (lo2, hi2) = Conformal.bootstrapIntervals(res, fc, 500, 0.9, seed = 7)
    assert(lo1.toSeq == lo2.toSeq && hi1.toSeq == hi2.toSeq)
    assert(hi1(3) - lo1(3) > hi1(0) - lo1(0)) // cumulative resampling widens
  }
}

class ChangepointSpec extends AnyFunSuite {
  test("PELT finds an obvious mean shift") {
    val y = Array.fill(30)(0.0) ++ Array.fill(30)(10.0)
    val cps = Changepoint.pelt(y, minSize = 2, penalty = None, Changepoint.Cost.L2)
    assert(cps.contains(30), s"got ${cps.toSeq}")
  }

  test("PELT on constant series finds nothing") {
    assert(Changepoint.pelt(Array.fill(50)(5.0)).isEmpty)
  }

  test("BOCPD probability spikes after a shift") {
    val y = Array.fill(40)(0.0) ++ Array.fill(40)(20.0)
    val r = Changepoint.bocpd(y, hazardLambda = 100.0)
    // probability right after the break should dominate the steady state
    val probAfterBreak = r.probability.slice(40, 43).max
    val steadyState = r.probability.slice(10, 39).max
    assert(probAfterBreak > steadyState, s"after=$probAfterBreak steady=$steadyState")
  }

  test("BOCPD requires 3 points") {
    intercept[Forecast.InsufficientData](Changepoint.bocpd(Array(1.0, 2.0)))
  }
}

class QualitySpec extends AnyFunSuite {
  test("clean long series scores high; constant scores zero behavioral") {
    val good = Array.tabulate(60)(i => math.sin(i * 0.7) * 3 + 10)
    val q = Quality.compute(good, Array.fill(60)(true), None)
    assert(q.overall_score > 0.7, s"got ${q.overall_score}")
    assert(!q.is_constant)
    val const = Quality.compute(Array.fill(20)(5.0), Array.fill(20)(true), None)
    assert(const.is_constant && const.behavioral_score == 0.0)
  }

  test("missing values lower the structural score") {
    val v = Array.tabulate(40)(_.toDouble)
    val half = Array.tabulate(40)(i => i % 2 == 0)
    val qFull = Quality.compute(v, Array.fill(40)(true), None)
    val qHalf = Quality.compute(v, half, None)
    assert(qHalf.structural_score < qFull.structural_score)
    assert(qHalf.n_missing == 20)
  }
}

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Conformal, Forecast, Imputation, Metrics}

/** Cross-cutting invariants checked over generated inputs (ScalaCheck):
  * properties every correct implementation must satisfy regardless of the
  * concrete series — interval nesting, quantile monotonicity, metric
  * inequalities, reconstruction identities, idempotence.
  */
class PropertySpec extends AnyFunSuite {

  private val seriesGen: Gen[Array[Double]] = for {
    n <- Gen.choose(8, 60)
    base <- Gen.choose(-50.0, 50.0)
    slope <- Gen.choose(-2.0, 2.0)
    amp <- Gen.choose(0.0, 10.0)
    phase <- Gen.choose(0, 6)
  } yield Array.tabulate(n)(i =>
    base + slope * i + amp * math.sin((i + phase) * math.Pi / 3.5) +
      math.sin(i * 2.399963) * 0.7)

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, s"$name: $r")
  }

  test("confidence intervals nest: wider level ⊇ narrower level, all models") {
    check("ci-nesting", Prop.forAll(seriesGen, Gen.oneOf("Naive", "SES", "Theta", "Holt")) {
      (ys, m) =>
        def fc(conf: Double) = Forecast.forecast(ys, Array.fill(ys.length)(true),
          Forecast.Options(model = m, horizon = 5, confidenceLevel = conf,
            autoDetectSeasonality = false))
        val narrow = fc(0.8)
        val wide = fc(0.99)
        (0 until 5).forall(h =>
          wide.lower(h) <= narrow.lower(h) + 1e-9 &&
            narrow.upper(h) <= wide.upper(h) + 1e-9)
    })
  }

  test("conformal quantile is monotone non-increasing in alpha") {
    val residGen = Gen.nonEmptyListOf(Gen.choose(-20.0, 20.0)).map(_.toArray)
    check("conformal-monotone", Prop.forAll(residGen) { rs =>
      val qs = Seq(0.05, 0.1, 0.2, 0.4).map(a => Conformal.conformalQuantile(rs, a))
      qs.sliding(2).forall(w => w(0) >= w(1) - 1e-12)
    })
  }

  test("rmse >= mae >= 0 and both are 0 only on perfect forecasts") {
    val pairGen = for {
      n <- Gen.choose(2, 40)
      a <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
      e <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
    } yield (a.toArray, a.zip(e).map { case (x, d) => x + d }.toArray)
    check("metric-inequalities", Prop.forAll(pairGen) { case (actual, pred) =>
      val mae = Metrics.mae(actual, pred)
      val rmse = Metrics.rmse(actual, pred)
      mae >= 0 && rmse >= mae - 1e-12 &&
        (Metrics.mae(actual, actual) == 0.0) && (Metrics.rmse(actual, actual) == 0.0)
    })
  }

  test("interpolation fills every interior null and never invents NaN") {
    val gen = for {
      n <- Gen.choose(4, 50)
      vals <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
      mask <- Gen.listOfN(n, Gen.prob(0.25))
    } yield (vals.toArray, mask.toArray)
    check("interpolation-total", Prop.forAll(gen) { case (vals, nullMask) =>
      // keep at least one real value so interpolation has an anchor
      val valid = nullMask.map(!_)
      val anchored = if (valid.exists(identity)) valid else valid.updated(0, true)
      val out = Imputation.fillInterpolate(vals, anchored)
      out.forall(v => !v.isNaN)
    })
  }

  test("seasonal naive with period 1 equals naive") {
    check("snaive-degenerates", Prop.forAll(seriesGen) { ys =>
      val n = Forecast.forecast(ys, Array.fill(ys.length)(true),
        Forecast.Options(model = "Naive", horizon = 4, autoDetectSeasonality = false))
      val s = Forecast.forecast(ys, Array.fill(ys.length)(true),
        Forecast.Options(model = "SeasonalNaive", horizon = 4, seasonalPeriod = 1,
          autoDetectSeasonality = false))
      n.point.toSeq == s.point.toSeq
    })
  }

  test("drift forecast is the exact line through first and last points") {
    check("drift-closed-form", Prop.forAll(seriesGen) { ys =>
      val out = Forecast.forecast(ys, Array.fill(ys.length)(true),
        Forecast.Options(model = "RandomWalkDrift", horizon = 3,
          autoDetectSeasonality = false))
      val slope = (ys.last - ys.head) / (ys.length - 1)
      (0 until 3).forall(h => math.abs(out.point(h) - (ys.last + slope * (h + 1))) < 1e-9)
    })
  }

  test("conformal intervals cover the point forecast and scale with the score") {
    val gen = for {
      fc <- Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))
      q <- Gen.choose(0.0, 50.0)
    } yield (fc.toArray, q)
    check("conformal-intervals", Prop.forAll(gen) { case (fc, q) =>
      val (lo, hi) = Conformal.conformalIntervals(fc, q)
      fc.indices.forall(i => lo(i) == fc(i) - q && hi(i) == fc(i) + q)
    })
  }
}

package graft.kernels

/** ARIMA via conditional-sum-of-squares estimation and AutoARIMA via the
  * Hyndman-Khandakar stepwise search (published algorithm; the reference
  * delegates to the anofox-forecast crate's AutoARIMA, forecast.rs:1435).
  *
  * Scope: non-seasonal ARIMA(p,d,q) with drift/intercept, plus seasonal
  * differencing when a period is supplied (the dominant seasonal effect);
  * model selection by AICc over the stepwise neighborhood.
  */
object Arima {

  final case class Fit(p: Int, d: Int, q: Int, seasonalD: Int, period: Int,
                       phi: Array[Double], theta: Array[Double], intercept: Double,
                       sigma2: Double, aicc: Double, aic: Double, bic: Double)

  private def difference(values: Array[Double], lag: Int): Array[Double] =
    Array.tabulate(values.length - lag)(i => values(i + lag) - values(i))

  /** CSS of an ARMA(p,q) with intercept on a (differenced) series. */
  private def css(y: Array[Double], p: Int, q: Int, params: Array[Double]): Double = {
    val n = y.length
    val phi = params.slice(0, p)
    val theta = params.slice(p, p + q)
    val c = params(p + q)
    val e = new Array[Double](n)
    var sse = 0.0
    var t = 0
    while (t < n) {
      var pred = c
      var i = 0
      while (i < p) { if (t - 1 - i >= 0) pred += phi(i) * y(t - 1 - i); i += 1 }
      var j = 0
      while (j < q) { if (t - 1 - j >= 0) pred += theta(j) * e(t - 1 - j); j += 1 }
      e(t) = y(t) - pred
      sse += e(t) * e(t)
      t += 1
    }
    if (sse.isNaN || sse.isInfinite) Double.PositiveInfinity else sse
  }

  /** Fit ARMA(p,q)+c on a differenced series; returns None on degenerate fits. */
  private def fitArma(y: Array[Double], p: Int, q: Int): Option[(Array[Double], Double)] = {
    val n = y.length
    if (n < p + q + 3) return None
    val k = p + q + 1
    val mean = y.sum / n
    val x0 = Array.fill(k)(0.1)
    x0(k - 1) = mean * 0.5
    val lo = Array.fill(k)(-0.99)
    val hi = Array.fill(k)(0.99)
    lo(k - 1) = -math.abs(mean) * 10 - 1e3
    hi(k - 1) = math.abs(mean) * 10 + 1e3
    val best = Optim.nelderMead(v => css(y, p, q, v), x0, lo, hi, maxIter = 400)
    val sse = css(y, p, q, best)
    if (!java.lang.Double.isFinite(sse)) None else Some((best, sse))
  }

  /** Fit ARIMA(p,d,q)[xD at period] and compute AIC/AICc. */
  def fit(values: Array[Double], p: Int, d: Int, q: Int,
          seasonalD: Int = 0, period: Int = 1): Option[Fit] = {
    var y = values.clone()
    var sd = 0
    while (sd < seasonalD && period > 1 && y.length > period + 2) {
      y = difference(y, period); sd += 1
    }
    var dd = 0
    while (dd < d && y.length > 2) { y = difference(y, 1); dd += 1 }
    if (y.length < p + q + 3) return None
    fitArma(y, p, q).map { case (params, sse) =>
      val n = y.length
      val kParams = p + q + 2 // + intercept + sigma
      val ll = n * math.log(math.max(sse, 1e-300) / n)
      val aic = ll + 2.0 * kParams
      val aicc = if (n - kParams - 1 > 0)
        aic + 2.0 * kParams * (kParams + 1.0) / (n - kParams - 1.0) else Double.PositiveInfinity
      val bic = ll + kParams * math.log(n.toDouble)
      Fit(p, dd, q, sd, period, params.slice(0, p), params.slice(p, p + q),
        params(p + q), sse / n, aicc, aic, bic)
    }
  }

  /** Forecast from a fit: ARMA recursion on the differenced scale with
    * future shocks 0, then integrate the ordinary and seasonal differences. */
  def forecast(values: Array[Double], fit: Fit, horizon: Int): Array[Double] = {
    // rebuild the differenced series + in-sample residuals
    var y = values.clone()
    var s = 0
    val seasonalBases = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    while (s < fit.seasonalD) { seasonalBases += y.clone(); y = difference(y, fit.period); s += 1 }
    var dLevel = 0
    val diffBases = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    while (dLevel < fit.d) { diffBases += y.clone(); y = difference(y, 1); dLevel += 1 }

    val n = y.length
    val e = new Array[Double](n)
    var t = 0
    while (t < n) {
      var pred = fit.intercept
      var i = 0
      while (i < fit.phi.length) { if (t - 1 - i >= 0) pred += fit.phi(i) * y(t - 1 - i); i += 1 }
      var j = 0
      while (j < fit.theta.length) { if (t - 1 - j >= 0) pred += fit.theta(j) * e(t - 1 - j); j += 1 }
      e(t) = y(t) - pred
      t += 1
    }
    // forecast on differenced scale
    val ext = y ++ new Array[Double](horizon)
    val extE = e ++ new Array[Double](horizon)
    var h = 0
    while (h < horizon) {
      val idx = n + h
      var pred = fit.intercept
      var i = 0
      while (i < fit.phi.length) { if (idx - 1 - i >= 0) pred += fit.phi(i) * ext(idx - 1 - i); i += 1 }
      var j = 0
      while (j < fit.theta.length) { if (idx - 1 - j >= 0) pred += fit.theta(j) * extE(idx - 1 - j); j += 1 }
      ext(idx) = pred
      extE(idx) = 0.0
      h += 1
    }
    var fc = ext.slice(n, n + horizon)
    // integrate ordinary differences (innermost first)
    var lvl = diffBases.length - 1
    while (lvl >= 0) {
      val base = diffBases(lvl)
      var acc = base.last
      fc = fc.map { v => acc += v; acc }
      lvl -= 1
    }
    // integrate seasonal differences
    lvl = seasonalBases.length - 1
    while (lvl >= 0) {
      val base = seasonalBases(lvl)
      val out = new Array[Double](horizon)
      var hh = 0
      while (hh < horizon) {
        val prev =
          if (hh < fit.period) base(base.length - fit.period + (hh % fit.period))
          else out(hh - fit.period)
        out(hh) = prev + fc(hh)
        hh += 1
      }
      fc = out
      lvl -= 1
    }
    fc
  }

  /** ARIMA with explicit defaults (1,1,1). Falls back to (0,d,0) then
    * (0,0,0) when the requested order can't be fit (short or degenerate
    * series) — the reference's ARIMA never fails on its minimum-length
    * contract (test/sql/ts_forecast_statespace.test pins a 5-point fit). */
  def forecastArima(values: Array[Double], horizon: Int,
                    p: Int = 1, d: Int = 1, q: Int = 1):
      (Array[Double], String, Option[Double], Option[Double]) = {
    fit(values, p, d, q)
      .orElse(fit(values, 0, d, 0))
      .orElse(fit(values, 0, 0, 0)) match {
      case Some(f) => (forecast(values, f, horizon), "ARIMA", Some(f.aic), Some(f.bic))
      case None => throw new Forecast.ComputationError(s"ARIMA($p,$d,$q) fit failed")
    }
  }

  /** Number of ordinary differences: repeat while the series looks
    * non-stationary (|ACF1| of the current series > 0.9, max 2) — a cheap
    * stand-in for the KPSS ladder in Hyndman-Khandakar. */
  private def chooseD(values: Array[Double]): Int = {
    var y = values
    var d = 0
    while (d < 2 && y.length > 6 && math.abs(Stats.autocorrelation(y, 1)) > 0.9) {
      y = difference(y, 1); d += 1
    }
    d
  }

  /** The stepwise search itself — also used by introspection so the
    * inspected model is exactly the one that forecast. */
  def autoFit(values: Array[Double], period: Int = 1): Option[Fit] = {
    val seasonalD =
      if (period > 1 && values.length >= 2 * period + 4 &&
        Decomposition.seasonalStrengthAt(values, period) > 0.64) 1 else 0
    val afterSeasonal =
      if (seasonalD == 1) difference(values, period) else values
    val d = chooseD(afterSeasonal)

    val tried = scala.collection.mutable.Map[(Int, Int), Option[Fit]]()
    def tryFit(p: Int, q: Int): Option[Fit] =
      tried.getOrElseUpdate((p, q),
        if (p < 0 || q < 0 || p > 5 || q > 5) None
        else fit(values, p, d, q, seasonalD, period))

    val startOpt = Seq((2, 2), (0, 0), (1, 0), (0, 1))
      .flatMap { case (p, q) => tryFit(p, q) }
      .minByOption(_.aicc)
    startOpt.map { start =>
      var best = start
      var improved = true
      while (improved) {
        improved = false
        val neighbors = Seq((best.p + 1, best.q), (best.p - 1, best.q),
          (best.p, best.q + 1), (best.p, best.q - 1),
          (best.p + 1, best.q + 1), (best.p - 1, best.q - 1))
        neighbors.flatMap { case (p, q) => tryFit(p, q) }
          .filter(_.aicc < best.aicc)
          .minByOption(_.aicc)
          .foreach { f => best = f; improved = true }
      }
      best
    }
  }

  /** Hyndman-Khandakar stepwise AutoARIMA. */
  def autoArima(values: Array[Double], horizon: Int, period: Int = 1):
      (Array[Double], String, Option[Double], Option[Double]) = {
    autoFit(values, period) match {
      case Some(best) =>
        val name =
          if (best.seasonalD > 0)
            s"AutoARIMA(${best.p},${best.d},${best.q})(0,${best.seasonalD},0)[${best.period}]"
          else s"AutoARIMA(${best.p},${best.d},${best.q})"
        (forecast(values, best, horizon), name, Some(best.aic), Some(best.bic))
      case None => fallbackDrift(values, horizon)
    }
  }

  private def fallbackDrift(values: Array[Double], horizon: Int):
      (Array[Double], String, Option[Double], Option[Double]) =
    (Forecast.drift(values, horizon), "AutoARIMA(0,1,0)", None, None)
}

package graft.kernels

/** ETS (Error/Trend/Seasonal) state-space exponential smoothing, per Hyndman
  * et al. (2008) "Forecasting with Exponential Smoothing". The reference
  * delegates to the anofox-forecast Rust crate (forecast.rs:1278, :1543);
  * we implement the standard algorithm: innovations state space with
  * additive/multiplicative error, none/additive/damped/multiplicative trend,
  * none/additive/multiplicative seasonality, parameters optimized by
  * Nelder-Mead on the innovations likelihood, and AutoETS picks the minimum
  * AICc over a model pool (pools per forecast.rs:1524-1531).
  */
object Ets {

  final case class Spec(error: Char, trend: Char, damped: Boolean, seasonal: Char) {
    def notation: String = s"$error$trend${if (damped) "d" else ""}$seasonal"
    def nParams(m: Int): Int = {
      var k = 1 // alpha
      if (trend != 'N') k += 1
      if (damped) k += 1
      if (seasonal != 'N') k += 1
      // initial states: level + trend + m-1 seasonal (constrained) + sigma
      k += 1
      if (trend != 'N') k += 1
      if (seasonal != 'N') k += m - 1
      k + 1
    }
  }

  final case class Fit(spec: Spec, point: Array[Double], fitted: Array[Double],
                       aic: Double, bic: Double, aicc: Double, mse: Double,
                       params: Array[Double])

  /** Parse "AAA", "MAdM", "AAdN", "ZZZ" etc. (forecast.rs is_valid_ets_notation). */
  def parseSpec(s: String): Spec = {
    val t = s.trim
    val ok = t.length match {
      case 3 => "AMZ".contains(t(0)) && "AMNZ".contains(t(1)) && "AMNZ".contains(t(2))
      case 4 => "AMZ".contains(t(0)) && "AM".contains(t(1)) && t(2) == 'd' && "AMNZ".contains(t(3))
      case _ => false
    }
    if (!ok) throw new Forecast.InvalidInput(
      s"Invalid ETS model specification '$s'. Expected [E][T][S] or [E][Td][S] with E ∈ {A,M,Z}, " +
        "T ∈ {A,M,N,Z}, S ∈ {A,M,N,Z}, e.g. AAA, MNM, AAdA.")
    val spec =
      if (t.length == 3) Spec(t(0), t(1), damped = false, t(2))
      else Spec(t(0), t(1), damped = true, t(3))
    // FPP3 taxonomy: multiplicative error with additive seasonality is an
    // unstable combination and rejected (forecast.rs:1307-1314; MAM/MAdM are
    // fine — the hazard is the additive seasonal term under relative errors)
    if (spec.error == 'M' && spec.seasonal == 'A')
      throw new Forecast.InvalidInput(
        s"ETS model '$s' is an unstable combination (multiplicative error with additive " +
          "components). Try one of: 'AAA', 'ANA', 'AAdA', 'MNM', 'MAM', 'MAdM', 'MMM', " +
          "'MMdM', or use 'AutoETS' for automatic selection.")
    spec
  }

  /** Run the ETS recursions; returns (sse-like likelihood pieces, fitted, final states).
    * Returns None when the recursion degenerates (non-finite states). */
  private def run(y: Array[Double], spec: Spec, m: Int,
                  alpha: Double, beta: Double, gamma: Double, phi: Double,
                  wantFitted: Boolean = true):
      Option[(Double, Double, Array[Double], Double, Double, Array[Double])] = {
    val n = y.length
    val hasT = spec.trend != 'N'
    val hasS = spec.seasonal != 'N'
    val multT = spec.trend == 'M'
    val multS = spec.seasonal == 'M'
    // init states
    var l = 0.0
    var b = if (multT) 1.0 else 0.0
    val s = new Array[Double](math.max(m, 1))
    if (hasS) {
      val p = m
      if (n < p) return None
      val firstMean = y.take(p).sum / p
      l = firstMean
      if (hasT) {
        if (n >= 2 * p) {
          val secondMean = y.slice(p, 2 * p).sum / p
          b = if (multT) math.pow(math.max(secondMean / math.max(firstMean, 1e-10), 1e-10), 1.0 / p)
              else (secondMean - firstMean) / p
        }
      }
      var i = 0
      while (i < p) {
        s(i) = if (multS) { if (firstMean != 0.0) y(i) / firstMean else 1.0 } else y(i) - firstMean
        i += 1
      }
    } else {
      l = y(0)
      if (hasT) b = if (multT) {
        if (n > 1 && y(0) != 0.0) math.max(y(1) / y(0), 1e-10) else 1.0
      } else if (n > 1) y(1) - y(0) else 0.0
      s(0) = if (multS) 1.0 else 0.0
    }

    // the optimizer calls this thousands of times per series and discards the
    // fitted path — skip the n-length allocation there (numerics identical)
    val fitted = if (wantFitted) new Array[Double](n) else null
    var sse = 0.0
    var sumLogMu = 0.0
    var i = 0
    while (i < n) {
      val trendVal = if (!hasT) l else if (multT) l * math.pow(b, phi) else l + phi * b
      val si = if (hasS) s(i % m) else (if (multS) 1.0 else 0.0)
      val mu = if (hasS) { if (multS) trendVal * si else trendVal + si } else trendVal
      if (!java.lang.Double.isFinite(mu)) return None
      if (wantFitted) fitted(i) = mu
      val e = if (spec.error == 'M') {
        if (math.abs(mu) < 1e-10) return None
        (y(i) - mu) / mu
      } else y(i) - mu
      sse += e * e
      if (spec.error == 'M') sumLogMu += math.log(math.abs(mu))
      // state updates (Holt-Winters style recursions)
      val deSeason = if (hasS) { if (multS) { if (si != 0.0) y(i) / si else y(i) } else y(i) - si } else y(i)
      val lNew = alpha * deSeason + (1 - alpha) * trendVal
      if (!java.lang.Double.isFinite(lNew)) return None
      if (hasT) {
        b = if (multT) {
          val ratio = if (l != 0.0) lNew / l else 1.0
          beta * ratio + (1 - beta) * math.pow(b, phi)
        } else beta * (lNew - l) + (1 - beta) * phi * b
        if (!java.lang.Double.isFinite(b)) return None
      }
      if (hasS) {
        val sNew = if (multS) {
          if (math.abs(trendVal) > 1e-10) gamma * (y(i) / trendVal) + (1 - gamma) * si else si
        } else gamma * (y(i) - trendVal) + (1 - gamma) * si
        if (!java.lang.Double.isFinite(sNew)) return None
        s(i % m) = sNew
      }
      l = lNew
      i += 1
    }
    Some((sse, sumLogMu, fitted, l, b, s))
  }

  /** -2 log-likelihood up to constants (Hyndman 2008 §5.1):
    * additive error: n·ln(SSE/n); multiplicative: n·ln(SSE_rel/n) + 2Σln|μ|. */
  private def likelihood(y: Array[Double], spec: Spec, m: Int, p: Array[Double]): Double = {
    val phi = if (spec.damped) p(3) else 1.0
    run(y, spec, m, p(0), p(1), p(2), phi, wantFitted = false) match {
      case Some((sse, sumLogMu, _, _, _, _)) =>
        val n = y.length
        if (sse <= 0.0) return -1e300
        n * math.log(sse / n) + (if (spec.error == 'M') 2.0 * sumLogMu else 0.0)
      case None => Double.PositiveInfinity
    }
  }

  /** Fit one concrete spec; returns None if infeasible on this data. */
  def fit(y: Array[Double], spec: Spec, m: Int, horizon: Int,
          optimIter: Int = 300): Option[Fit] = {
    val n = y.length
    if (spec.seasonal != 'N' && (m < 2 || n < 2 * m)) return None
    if ((spec.error == 'M' || spec.trend == 'M' || spec.seasonal == 'M') && y.exists(_ <= 0.0)) return None

    val x0 = Array(0.3, 0.1, 0.05, 0.98)
    val lo = Array(1e-4, 1e-4, 1e-4, 0.8)
    val hi = Array(0.9999, 0.9999, 0.9999, 0.98)
    val dims = 1 + (if (spec.trend != 'N') 1 else 0) + (if (spec.seasonal != 'N') 1 else 0) +
      (if (spec.damped) 1 else 0)
    // map reduced vector → full (alpha, beta, gamma, phi)
    def expand(v: Array[Double]): Array[Double] = {
      val full = Array(v(0), 0.0, 0.0, 1.0)
      var k = 1
      if (spec.trend != 'N') { full(1) = v(k); k += 1 }
      if (spec.seasonal != 'N') { full(2) = v(k); k += 1 }
      if (spec.damped) { full(3) = v(k); k += 1 }
      full
    }
    val x0r = new Array[Double](dims)
    val lor = new Array[Double](dims)
    val hir = new Array[Double](dims)
    var k = 0
    def put(idx: Int): Unit = { x0r(k) = x0(idx); lor(k) = lo(idx); hir(k) = hi(idx); k += 1 }
    put(0)
    if (spec.trend != 'N') put(1)
    if (spec.seasonal != 'N') put(2)
    if (spec.damped) put(3)

    val best = Optim.nelderMead(v => likelihood(y, spec, m, expand(v)), x0r, lor, hir, maxIter = optimIter)
    val full = expand(best)
    val phi = if (spec.damped) full(3) else 1.0
    run(y, spec, m, full(0), full(1), full(2), phi).map { case (sse, sumLogMu, fitted, l, b, s) =>
      val ll = n * math.log(sse / n) + (if (spec.error == 'M') 2.0 * sumLogMu else 0.0)
      val kParams = spec.nParams(if (spec.seasonal != 'N') m else 0)
      val aic = ll + 2.0 * kParams
      val aicc = if (n - kParams - 1 > 0) aic + 2.0 * kParams * (kParams + 1.0) / (n - kParams - 1.0) else Double.PositiveInfinity
      val bic = ll + kParams * math.log(n.toDouble)
      // h-step forecast from final states
      val hasT = spec.trend != 'N'
      val hasS = spec.seasonal != 'N'
      val multT = spec.trend == 'M'
      val multS = spec.seasonal == 'M'
      val point = Array.tabulate(horizon) { hh =>
        val steps = hh + 1
        val phiSum = if (!hasT) 0.0 else if (phi == 1.0) steps.toDouble
          else (1 to steps).map(j => math.pow(phi, j)).sum
        val trendVal = if (!hasT) l else if (multT) l * math.pow(b, phiSum) else l + phiSum * b
        if (hasS) {
          val si = s((n + hh) % m)
          if (multS) trendVal * si else trendVal + si
        } else trendVal
      }
      Fit(spec, point, fitted, aic, bic, aicc, sse / n, full)
    }
  }

  /** Explicit-spec ETS (forecast.rs:1278). "Z" components trigger a mini
    * auto-search over the free components. */
  def forecastEts(y: Array[Double], horizon: Int, period: Int, specStr: Option[String]):
      (Array[Double], String, Option[Double], Option[Double]) = {
    val raw = specStr.getOrElse("ZZZ")
    val parsed = parseSpec(raw)
    if (parsed.error == 'Z' || parsed.trend == 'Z' || parsed.seasonal == 'Z') {
      val errs = if (parsed.error == 'Z') Seq('A', 'M') else Seq(parsed.error)
      val trends = if (parsed.trend == 'Z') Seq(('N', false), ('A', false), ('A', true))
        else Seq((parsed.trend, parsed.damped))
      val seas = if (parsed.seasonal == 'Z') Seq('N', 'A', 'M') else Seq(parsed.seasonal)
      val fits = for {
        e <- errs; (t, d) <- trends; sc <- seas
        f <- fit(y, Spec(e, t, d, sc), period, horizon)
      } yield f
      if (fits.isEmpty) throw new Forecast.ComputationError("ETS: no feasible model for this series")
      val best = fits.minBy(_.aicc)
      // fixed-spec models report the plain name (ts_native_model_names.test);
      // the selected spec is surfaced via Introspect
      (best.point, "ETS", Some(best.aic), Some(best.bic))
    } else {
      fit(y, parsed, period, horizon) match {
        case Some(f) => (f.point, "ETS", Some(f.aic), Some(f.bic))
        case None => throw new Forecast.ComputationError(
          s"ETS($raw) is infeasible for this series (non-positive data with multiplicative " +
            "components, or series shorter than two seasons)")
      }
    }
  }

  /** Model pools (forecast.rs parse_model_pool:1524-1531). */
  def pool(name: Option[String], seasonal: Boolean): Seq[Spec] = {
    val errs = Seq('A', 'M')
    val trendsAll = Seq(('N', false), ('A', false), ('A', true), ('M', false), ('M', true))
    val trendsNoMult = Seq(('N', false), ('A', false), ('A', true))
    val trendsDampedOnly = Seq(('N', false), ('A', true), ('M', true))
    val seas = if (seasonal) Seq('N', 'A', 'M') else Seq('N')
    val poolName = name.map(_.toLowerCase.replaceAll("[-_]", "")).getOrElse("nomultiplicativetrend")
    val combos: Seq[Spec] = poolName match {
      case "complete" =>
        for { e <- errs; (t, d) <- trendsAll; s <- seas } yield Spec(e, t, d, s)
      case "nomultiplicativetrend" =>
        for { e <- errs; (t, d) <- trendsNoMult; s <- seas } yield Spec(e, t, d, s)
      case "dampedtrendonly" =>
        for { e <- errs; (t, d) <- trendsDampedOnly; s <- seas } yield Spec(e, t, d, s)
      case "matcherrorseasonal" =>
        for {
          e <- errs; (t, d) <- trendsNoMult; s <- seas
          if s == 'N' || (e == 'A' && s == 'A') || (e == 'M' && s == 'M')
        } yield Spec(e, t, d, s)
      case "reduced" =>
        val base = Seq(Spec('A', 'N', damped = false, 'N'), Spec('A', 'A', damped = false, 'N'),
          Spec('A', 'A', damped = true, 'N'), Spec('M', 'N', damped = false, 'N'))
        if (seasonal) base ++ Seq(Spec('A', 'A', damped = false, 'A'),
          Spec('M', 'A', damped = false, 'M'), Spec('M', 'N', damped = false, 'M'))
        else base
      case other => throw new Forecast.InvalidInput(
        s"Unknown model_pool '$other'. Valid options: complete, no_multiplicative_trend, " +
          "damped_trend_only, match_error_seasonal, reduced")
    }
    // drop the FPP3-unstable multiplicative-error/additive-seasonal combos
    // from every pool (forecast.rs:1307: they are rejected as fixed specs,
    // so the auto search must not select them either)
    combos.filterNot(sp => sp.error == 'M' && sp.seasonal == 'A')
  }

  /** Best AutoETS fit (for introspection). */
  def autoFit(y: Array[Double], period: Int, modelPool: Option[String],
              horizon: Int = 1): Option[Fit] = {
    val seasonal = period > 1 && y.length >= 2 * period
    pool(modelPool, seasonal).flatMap(s => fit(y, s, period, horizon)).minByOption(_.aicc)
  }

  /** AutoETS: minimize AICc over the pool (forecast.rs:1543-1641). */
  def autoEts(y: Array[Double], horizon: Int, period: Int, modelPool: Option[String]):
      (Array[Double], String, Option[Double], Option[Double]) = {
    val seasonal = period > 1 && y.length >= 2 * period
    // two-stage: cheap optimizer budget to rank the pool, full budget to
    // refit the winner — same selection quality at a fraction of the cost
    val scan = pool(modelPool, seasonal).flatMap(s => fit(y, s, period, horizon, optimIter = 100))
    val fits = scan.sortBy(_.aicc).take(3).flatMap(f => fit(y, f.spec, period, horizon))
    if (fits.isEmpty) {
      // degenerate series (constant etc.) → SES-style fallback, mirroring the
      // reference's catch_unwind fallback path (forecast.rs:1630-1641)
      val lvl = Forecast.sesLevel(y, 0.3)
      return (Array.fill(horizon)(lvl), "AutoETS", None, None)
    }
    val best = fits.minBy(_.aicc)
    (best.point, s"AutoETS(${best.spec.notation})", Some(best.aic), Some(best.bic))
  }
}

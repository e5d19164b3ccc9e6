package graft.kernels

/** Multi-seasonal and distributional forecast kernels: MSTL-forecast
  * (decompose → forecast trend+remainder → re-add cyclic seasonals),
  * MFLES (gradient-boosted decomposition per Nixtla's published method,
  * simplified), TBATS (Box-Cox + trigonometric seasonality via Fourier
  * regression + trend, simplified from De Livera et al. 2011), and the
  * Laplace likelihood-weighted mixture over simple leaves (reference
  * forecast.rs:1647-1724 behavioral contract).
  */
object MultiSeasonal {

  /** MSTL forecast: seasonal components repeat cyclically; deseasonalized
    * series forecast with optimized SES + drift blend. */
  def mstlForecast(values: Array[Double], horizon: Int, periods: Seq[Int]): Array[Double] = {
    val n = values.length
    val usable = periods.filter(p => p >= 2 && n >= 2 * p)
    if (usable.isEmpty) return Forecast.sesOptimized(values, horizon)
    val m = Decomposition.mstl(values, usable)
    val deseason = Array.tabulate(n)(i => values(i) - m.seasonals.map(_._2(i)).sum)
    val base = trendForecast(deseason, horizon)
    Array.tabulate(horizon) { h =>
      base(h) + m.seasonals.map { case (p, s) => s(n - p + ((h) % p)) }.sum
    }
  }

  /** Damped-trend Holt (Gardner–McKenzie): fixed (α=0.3, β=0.1), damping φ
    * applied to the trend in both the recursion and the forecast, so the
    * extrapolated growth flattens toward l + b·φ/(1−φ). */
  def holtDamped(y: Array[Double], horizon: Int, phi: Double): Array[Double] = {
    val n = y.length
    if (n < 2) return Array.fill(horizon)(y.headOption.getOrElse(0.0))
    var l = y(0)
    var b = y(1) - y(0)
    var t = 1
    while (t < n) {
      val lNew = 0.3 * y(t) + 0.7 * (l + phi * b)
      b = 0.1 * (lNew - l) + 0.9 * phi * b
      l = lNew
      t += 1
    }
    val out = new Array[Double](horizon)
    var cum = 0.0
    var h = 0
    while (h < horizon) { cum += math.pow(phi, h + 1); out(h) = l + cum * b; h += 1 }
    out
  }

  /** Trend forecaster for deseasonalized series, selected on a holdout tail:
    * full Holt over-extrapolates noisy remainders (it cost MSTL ~0.3 MASE on
    * the bench workload), so SES-optimized / damped-Holt / Holt compete on
    * the last max(3, n/5) in-sample points and the winner refits on the full
    * series. Stable minBy ⇒ exact ties (constant remainders, the planted
    * oracles) resolve to SES, whose fixed point is the constant. */
  private def trendForecast(y: Array[Double], horizon: Int): Array[Double] = {
    val n = y.length
    if (n < 5) return Forecast.sesForecast(y, horizon, 0.3)
    val hv = math.max(3, n / 5)
    if (n - hv < 4) return Forecast.holt(y, horizon)
    val candidates: Seq[(Array[Double], Int) => Array[Double]] = Seq(
      (a, h) => Forecast.sesOptimized(a, h),
      (a, h) => holtDamped(a, h, 0.9),
      (a, h) => Forecast.holt(a, h))
    val train = java.util.Arrays.copyOfRange(y, 0, n - hv)
    val tail = java.util.Arrays.copyOfRange(y, n - hv, n)
    val best = candidates.minBy { f =>
      val fc = f(train, hv)
      var s = 0.0
      var i = 0
      while (i < hv) { s += math.abs(tail(i) - fc(i)); i += 1 }
      s
    }
    best(y, horizon)
  }

  /** MFLES: boosted decomposition — rounds of (linear trend, seasonal means)
    * fits on the residual with a learning rate, then additive extrapolation. */
  def mflesForecast(values: Array[Double], horizon: Int, periods: Seq[Int],
                    rounds: Int = 3, learningRate: Double = 0.5): Array[Double] = {
    val n = values.length
    val ps = periods.filter(p => p >= 2 && n >= 2 * p)
    val residual = values.clone()
    var interceptAcc = 0.0
    var slopeAcc = 0.0
    val seasonalAcc = ps.map(p => p -> new Array[Double](p)).toMap

    // round 0: median baseline
    val median = { val s = values.sorted; Stats.percentile(s, 0.5) }
    interceptAcc += median
    var i = 0
    while (i < n) { residual(i) -= median; i += 1 }

    var r = 0
    while (r < rounds) {
      // linear trend on residual
      val x = Array.tabulate(n, 2)((t, j) => if (j == 0) 1.0 else t.toDouble)
      val beta = Linalg.olsSolve(x, residual)
      interceptAcc += learningRate * beta(0)
      slopeAcc += learningRate * beta(1)
      i = 0
      while (i < n) { residual(i) -= learningRate * (beta(0) + beta(1) * i); i += 1 }
      // seasonal means on residual, per period
      ps.foreach { p =>
        val sums = new Array[Double](p)
        val counts = new Array[Int](p)
        i = 0
        while (i < n) { sums(i % p) += residual(i); counts(i % p) += 1; i += 1 }
        val means = Array.tabulate(p)(k => if (counts(k) > 0) sums(k) / counts(k) else 0.0)
        val mean = means.sum / p
        i = 0
        while (i < n) {
          val adj = learningRate * (means(i % p) - mean)
          residual(i) -= adj
          i += 1
        }
        val acc = seasonalAcc(p)
        var k = 0
        while (k < p) { acc(k) += learningRate * (means(k) - mean); k += 1 }
      }
      r += 1
    }
    Array.tabulate(horizon) { h =>
      val t = n + h
      interceptAcc + slopeAcc * t + ps.map(p => seasonalAcc(p)(t % p)).sum
    }
  }

  /** TBATS (De Livera et al. 2011), regression surrogate with the model's
    * three pillars made measurable instead of hard-coded:
    *
    *  - Box-Cox: λ ∈ {1, ½, 0} (identity / sqrt / log, the latter two only
    *    on strictly positive series), chosen by in-sample SSE on the ORIGINAL
    *    scale; stable minBy ⇒ exact ties pick the identity.
    *  - trigonometric seasonality: per period, min(3, p/2) harmonics (a
    *    Nyquist sin column is identically zero; the solver's pivot guard
    *    zeroes its coefficient) + linear trend, fit by OLS.
    *  - ARMA error correction: AR(1) on the transformed-scale residuals,
    *    geometrically decayed into the forecast (skipped when the fit is
    *    already exact — degenerate variance would make the slope estimate
    *    numerical noise).
    */
  def tbatsForecast(values: Array[Double], horizon: Int, periods: Seq[Int],
                    trendDamping: Double = 1.0): Array[Double] = {
    val n = values.length
    val ps = periods.filter(p => p >= 2 && n >= 2 * p)
    val positive = values.forall(_ > 0.0)
    // (transform, inverse) pairs; inverse of sqrt clamps at zero
    val transforms: Seq[(Double => Double, Double => Double)] =
      if (positive) Seq(
        ((v: Double) => v, (v: Double) => v),
        ((v: Double) => math.sqrt(v), (v: Double) => { val c = math.max(v, 0.0); c * c }),
        ((v: Double) => math.log(v), (v: Double) => math.exp(v)))
      else Seq(((v: Double) => v, (v: Double) => v))

    def fitOne(fwd: Double => Double, inv: Double => Double)
        : (Array[Double], Double) = {
      val y = values.map(fwd)
      val hPerP = ps.map(p => math.max(1, math.min(3, p / 2)))
      val k = 2 + hPerP.sum * 2
      val x = Array.ofDim[Double](n, k)
      var t = 0
      while (t < n) {
        x(t)(0) = 1.0
        x(t)(1) = t.toDouble
        var c = 2
        ps.zip(hPerP).foreach { case (p, hp) =>
          var h = 1
          while (h <= hp) {
            x(t)(c) = math.sin(2 * math.Pi * h * t / p)
            x(t)(c + 1) = math.cos(2 * math.Pi * h * t / p)
            c += 2
            h += 1
          }
        }
        t += 1
      }
      val beta = Linalg.olsSolve(x, y)
      def predictAt(tt: Double): Double = {
        var pred = beta(0) + beta(1) * tt
        var c = 2
        ps.zip(hPerP).foreach { case (p, hp) =>
          var h = 1
          while (h <= hp) {
            pred += beta(c) * math.sin(2 * math.Pi * h * tt / p) +
              beta(c + 1) * math.cos(2 * math.Pi * h * tt / p)
            c += 2
            h += 1
          }
        }
        pred
      }
      // residuals on the transformed scale; SSE scored on the original scale
      val resid = Array.tabulate(n)(t => y(t) - predictAt(t))
      var sse = 0.0
      var i = 0
      while (i < n) {
        val d = values(i) - inv(predictAt(i))
        sse += d * d
        i += 1
      }
      // AR(1) error correction, zero-mean residuals (OLS with intercept)
      var num = 0.0
      var den = 0.0
      i = 1
      while (i < n) { num += resid(i) * resid(i - 1); den += resid(i - 1) * resid(i - 1); i += 1 }
      val phi =
        if (den / n < 1e-16) 0.0
        else math.max(-0.98, math.min(0.98, num / den))
      val lastR = resid(n - 1)
      // damped trend: growth beyond the last fitted point decays by
      // trendDamping per step (1.0 = undamped classic extrapolation)
      val tLast = (n - 1).toDouble
      val out = Array.tabulate(horizon) { hh =>
        val tt = n + hh
        val undamped = predictAt(tt)
        val dampedTrend =
          if (trendDamping >= 1.0) undamped
          else {
            var cum = 0.0
            var j = 1
            while (j <= hh + 1) { cum += math.pow(trendDamping, j); j += 1 }
            // seasonal part continues exactly; only the linear growth damps
            undamped - beta(1) * (tt - tLast) + beta(1) * cum
          }
        inv(dampedTrend + math.pow(phi, hh + 1) * lastR)
      }
      (out, sse)
    }

    transforms.map { case (f, i) => fitOne(f, i) }.minBy(_._2)._1
  }

  /** Shared holdout scorer for the Auto* config searches: MAE of a
    * candidate's forecast over the last max(3, n/5) points, candidates fit
    * on the preceding prefix (same protocol as [[trendForecast]]). Returns
    * the full-series forecast of the winning configuration. */
  private def holdoutBest(values: Array[Double], horizon: Int,
                          candidates: Seq[(Array[Double], Int) => Array[Double]])
      : Array[Double] = {
    val n = values.length
    val hv = math.max(3, n / 5)
    if (n - hv < 4) return candidates.head(values, horizon)
    val train = java.util.Arrays.copyOfRange(values, 0, n - hv)
    val tail = java.util.Arrays.copyOfRange(values, n - hv, n)
    val best = candidates.minBy { f =>
      try {
        val fc = f(train, hv)
        var s = 0.0
        var i = 0
        while (i < hv) { s += math.abs(tail(i) - fc(i)); i += 1 }
        if (s.isNaN) Double.MaxValue else s
      } catch { case _: Throwable => Double.MaxValue }
    }
    best(values, horizon)
  }

  /** AutoMFLES: holdout search over (boosting rounds, learning rate) — the
    * config-selection role of the reference crate's AutoMFLES
    * (forecast.rs:2153-2207 delegates to the crate's selector). */
  def autoMflesForecast(values: Array[Double], horizon: Int, periods: Seq[Int]): Array[Double] =
    holdoutBest(values, horizon,
      Seq((3, 0.5), (1, 0.3), (5, 0.5), (3, 0.8), (5, 0.8)).map {
        case (r, lr) => (a: Array[Double], h: Int) => mflesForecast(a, h, periods, r, lr)
      })

  /** AutoTBATS: holdout search over trend damping (the transform family is
    * already selected inside [[tbatsForecast]] by original-scale SSE). */
  def autoTbatsForecast(values: Array[Double], horizon: Int, periods: Seq[Int]): Array[Double] =
    holdoutBest(values, horizon,
      Seq(1.0, 0.95, 0.9, 0.8).map {
        d => (a: Array[Double], h: Int) => tbatsForecast(a, h, periods, d)
      })

  /** AutoMSTL: a 2-D grid search over (deseasonalized trend model ×
    * seasonal add-back) scored on a holdout tail of the FULL re-seasonalized
    * series — unlike the plain MSTL, which fixes both choices. Trend pool:
    * {the plain-MSTL selector (incumbent), Holt damped 0.9/0.8, drift,
    * Theta, DynamicTheta}; seasonal add-back: last cycle vs the mean of the
    * last two cycles (the seasonal-smoothing candidate).
    *
    * Selection-variance guard: the incumbent is EXACTLY the plain-MSTL
    * configuration, and a challenger must beat it (and the running best) by
    * >2% holdout MAE to be adopted. On short noisy series a free-for-all
    * argmin over 12 configs measurably degrades the holdout (selection
    * noise); the threshold keeps AutoMSTL ≡ MSTL unless a config is clearly
    * better. On exact constructions every candidate reproduces the planted
    * values (to ~1e-9 loess edge residuals), so oracle rows stay exact
    * whichever config wins. Corpus evidence (sf0.1, 7-day holdout MASE):
    * MSTL 1.1059, AutoMSTL 1.1046. */
  def autoMstlForecast(values: Array[Double], horizon: Int, periods: Seq[Int]): Array[Double] = {
    val n = values.length
    val usable = periods.filter(p => p >= 2 && n >= 2 * p)
    if (usable.isEmpty) return Forecast.sesOptimized(values, horizon)
    val m = Decomposition.mstl(values, usable)
    val deseason = Array.tabulate(n)(i => values(i) - m.seasonals.map(_._2(i)).sum)
    val trendCands: Seq[(Array[Double], Int) => Array[Double]] = Seq(
      (a, h) => trendForecast(a, h), // the plain-MSTL selector = incumbent
      (a, h) => holtDamped(a, h, 0.8),
      (a, h) => Forecast.drift(a, h),
      (a, h) => Forecast.theta(a, h, 1, dynamic = false, optimizeTheta = true),
      (a, h) => Forecast.theta(a, h, 1, dynamic = true, optimizeTheta = true))
    // seasonal value for offset i past position `end`
    def seasAt(s: Array[Double], p: Int, end: Int, i: Int, smooth: Boolean): Double = {
      val one = s(end - p + (i % p))
      if (!smooth || end < 2 * p) one
      else (one + s(end - 2 * p + (i % p))) / 2.0
    }
    val hv = math.max(3, n / 5)
    val (bestTrend, bestSmooth) =
      if (n - hv < 4) (0, false)
      else {
        // two rolling origins when the series affords them (selection on a
        // single origin mis-transfers on curved trends); one otherwise
        val origins =
          if (n - 2 * hv >= math.max(4, usable.max)) Seq(n - 2 * hv, n - hv)
          else Seq(n - hv)
        def holdoutMae(ti: Int, smooth: Boolean): Double =
          try {
            var s = 0.0
            for (trainEnd <- origins) {
              val fc = trendCands(ti)(
                java.util.Arrays.copyOfRange(deseason, 0, trainEnd), hv)
              var i = 0
              while (i < hv) {
                val pred = fc(i) +
                  m.seasonals.map { case (p, sa) => seasAt(sa, p, trainEnd, i, smooth) }.sum
                s += math.abs(values(trainEnd + i) - pred)
                i += 1
              }
            }
            if (s.isNaN) Double.MaxValue else s
          } catch { case _: Throwable => Double.MaxValue }
        var best = (0, false)
        var bestScore = holdoutMae(0, smooth = false)
        for (ti <- trendCands.indices; smooth <- Seq(false, true)
             if (ti, smooth) != ((0, false))) {
          val score = holdoutMae(ti, smooth)
          if (score < 0.98 * bestScore) { bestScore = score; best = (ti, smooth) }
        }
        best
      }
    val base = trendCands(bestTrend)(deseason, horizon)
    Array.tabulate(horizon) { h =>
      base(h) + m.seasonals.map { case (p, s) => seasAt(s, p, n, h, bestSmooth) }.sum
    }
  }

  /** Streaming-flavoured seasonal state: per-cycle deviations from the cycle
    * mean, exponentially decayed toward the newest cycle (0.8 per cycle back)
    * — the recency bias of an incrementally-learned seasonal component,
    * versus the whole-batch centered-MA indices used under batch init. */
  private def decayedSeasonalIndices(values: Array[Double], period: Int)
      : (Array[Double], Boolean) = {
    val n = values.length
    val p = period
    val mult = values.forall(_ > 0.0)
    val cycles = n / p
    val sums = new Array[Double](p)
    val wsum = new Array[Double](p)
    var c = 0
    while (c < cycles) {
      val w = math.pow(0.8, cycles - 1 - c)
      var m = 0.0
      var k = 0
      while (k < p) { m += values(c * p + k); k += 1 }
      m /= p
      k = 0
      while (k < p) {
        val d = if (mult) { if (m != 0.0) values(c * p + k) / m else 1.0 }
                else values(c * p + k) - m
        sums(k) += w * d
        wsum(k) += w
        k += 1
      }
      c += 1
    }
    val idx = Array.tabulate(p)(k =>
      if (wsum(k) > 0) sums(k) / wsum(k) else (if (mult) 1.0 else 0.0))
    val mean = idx.sum / p
    val out =
      if (mult) { if (mean != 0.0) idx.map(_ / mean) else idx }
      else idx.map(_ - mean)
    (out, mult)
  }

  /** Laplace: likelihood-weighted mixture over per-variant leaf sets
    * (weights ∝ exp(−MAE/scale) of one-step errors — Laplace likelihood),
    * optional seasonal adjustment. Variants follow the reference's
    * LaplaceVariant surface (forecast.rs:51-86, :1640-1724):
    *  - `auto`: EMA / drift / AR(1) / damped-Holt leaves;
    *  - `auto_aid`: AID-style family detection — on intermittent series
    *    (≥30% zeros) the leaves become Croston-rate / TSB-rate / EMA;
    *  - `skaters`: the auto ensemble widened with seasonal-memory and
    *    rolling-median one-step forecasters.
    * `batchInit` selects whole-batch seasonal indices over the default
    * streaming (cycle-decayed) state. */
  def laplaceForecast(values: Array[Double], horizon: Int, period: Int,
                      variant: String = "auto", batchInit: Boolean = false): Array[Double] =
    laplaceFit(values, horizon, period, variant, batchInit).forecast

  /** Fit result incl. ensemble metadata for `ts_forecast_inspect`
    * (forecast.rs:1860-1875: Laplace explanation exposes the leaf set). */
  final case class LaplaceFit(forecast: Array[Double], leafNames: Seq[String],
                              leafWeights: Seq[Double])

  def laplaceFit(values: Array[Double], horizon: Int, period: Int,
                 variant: String = "auto", batchInit: Boolean = false): LaplaceFit = {
    val n = values.length
    if (values.toSet.size <= 1)
      throw new Forecast.ComputationError("Laplace: constant series")
    val seasonal = period > 1 && n >= 2 * period
    val (sIdx, mult) =
      if (!seasonal) (Array.empty[Double], true)
      else if (batchInit) Forecast.seasonalIndices(values, period)
      else decayedSeasonalIndices(values, period)
    val y =
      if (!seasonal) values
      else if (mult) Array.tabulate(n)(i => if (sIdx(i % period) != 0) values(i) / sIdx(i % period) else values(i))
      else Array.tabulate(n)(i => values(i) - sIdx(i % period))

    final case class Leaf(name: String, oneStep: Int => Double, fc: Int => Double)
    // EMA leaf
    val alpha = 0.3
    val emaLevels = new Array[Double](n)
    emaLevels(0) = y(0)
    var i = 1
    while (i < n) { emaLevels(i) = alpha * y(i) + (1 - alpha) * emaLevels(i - 1); i += 1 }
    // AR(1) leaf: y_t ≈ c + φ y_{t-1}
    val (arC, arPhi) = {
      val x = Array.tabulate(n - 1, 2)((t, j) => if (j == 0) 1.0 else y(t))
      val b = Linalg.olsSolve(x, y.drop(1))
      (b(0), b(1))
    }
    // damped Holt leaf: fixed (0.3, 0.1) recursion with its OWN one-step
    // predictions, so its likelihood weight reflects its own accuracy
    val dampedFc = Forecast.holt(y, horizon)
    val holtOneStep: Array[Double] = {
      val out = new Array[Double](n)
      var l = y(0)
      var b = if (n > 1) y(1) - y(0) else 0.0
      out(0) = y(0)
      var t = 1
      while (t < n) {
        out(t) = l + b
        val lNew = 0.3 * y(t) + 0.7 * (l + b)
        b = 0.1 * (lNew - l) + 0.9 * b
        l = lNew
        t += 1
      }
      out
    }
    val drift = if (n > 1) (y(n - 1) - y(0)) / (n - 1) else 0.0

    val autoLeaves = Seq(
      Leaf("ema", t => if (t == 0) y(0) else emaLevels(t - 1), h => emaLevels(n - 1)),
      Leaf("drift", t => if (t == 0) y(0) else y(t - 1) + drift, h => y(n - 1) + drift * (h + 1)),
      Leaf("ar1", t => if (t == 0) y(0) else arC + arPhi * y(t - 1),
        h => { var v = y(n - 1); var k = 0; while (k <= h) { v = arC + arPhi * v; k += 1 }; v }),
      Leaf("holt", t => holtOneStep(t), h => dampedFc(h)))

    // auto_aid: AID-style family detection — intermittent series swap the
    // trend/level leaves for demand-rate leaves (Croston, TSB)
    val nZeros = values.count(_ == 0.0)
    val intermittent = nZeros.toDouble / n >= 0.3 && n - nZeros >= 2
    def crostonLeaf(): Leaf = {
      val one = new Array[Double](n)
      var zhat = 0.0; var phat = 0.0; var seen = false; var sinceLast = 0
      var t = 0
      while (t < n) {
        one(t) = if (seen && phat > 0) zhat / phat else 0.0
        sinceLast += 1
        if (y(t) != 0.0) {
          if (!seen) { zhat = y(t); phat = sinceLast.toDouble; seen = true }
          else { zhat = 0.1 * y(t) + 0.9 * zhat; phat = 0.1 * sinceLast + 0.9 * phat }
          sinceLast = 0
        }
        t += 1
      }
      val rate = if (seen && phat > 0) zhat / phat else 0.0
      Leaf("croston", t => one(t), _ => rate)
    }
    def tsbLeaf(): Leaf = {
      val one = new Array[Double](n)
      var prob = if (y(0) != 0.0) 1.0 else 0.0
      var size = y(0)
      var t = 0
      while (t < n) {
        one(t) = if (t == 0) y(0) else prob * size
        prob = 0.2 * (if (y(t) != 0.0) 1.0 else 0.0) + 0.8 * prob
        if (y(t) != 0.0) size = 0.2 * y(t) + 0.8 * size
        t += 1
      }
      Leaf("tsb", t => one(t), _ => prob * size)
    }
    // skaters: widen the ensemble with seasonal-memory and rolling-median
    // one-step forecasters
    def medianOf(a: Array[Double], from: Int, until: Int): Double = {
      val s = java.util.Arrays.copyOfRange(a, from, until).sorted
      if (s.isEmpty) 0.0
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def medianLeaf(): Leaf = {
      val w = math.min(7, n)
      val tailMed = medianOf(y, n - w, n)
      Leaf("median",
        t => if (t == 0) y(0) else medianOf(y, math.max(0, t - w), t),
        _ => tailMed)
    }
    def seasonalMemoryLeaf(): Leaf =
      Leaf("seasonal_memory",
        t => if (t >= period) y(t - period) else y(0),
        h => y(n - period + (h % period)))

    val leaves = variant match {
      case "auto_aid" if intermittent =>
        Seq(crostonLeaf(), tsbLeaf(),
          Leaf("ema", t => if (t == 0) y(0) else emaLevels(t - 1), _ => emaLevels(n - 1)))
      case "skaters" =>
        autoLeaves ++ (if (seasonal) Seq(seasonalMemoryLeaf()) else Nil) :+ medianLeaf()
      case _ => autoLeaves
    }

    val maes = leaves.map { leaf =>
      var s = 0.0
      var t = 1
      while (t < n) { s += math.abs(y(t) - leaf.oneStep(t)); t += 1 }
      s / (n - 1)
    }
    val scale = math.max(maes.min, 1e-9)
    val weights = maes.map(m => math.exp(-(m - maes.min) / scale))
    val wSum = weights.sum

    val base = Array.tabulate(horizon) { h =>
      leaves.indices.map(li => weights(li) * leaves(li).fc(h)).sum / wSum
    }
    val out =
      if (!seasonal) base
      else if (mult) Array.tabulate(horizon)(h => base(h) * sIdx((n + h) % period))
      else Array.tabulate(horizon)(h => base(h) + sIdx((n + h) % period))
    LaplaceFit(out, leaves.map(_.name), weights.map(_ / wSum))
  }
}

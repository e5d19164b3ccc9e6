package graft.kernels

/** Conformal prediction + residual bootstrap kernels.
  * Semantics from reference conformal.rs (conformal_quantile :118 with the
  * finite-sample ceil((n+1)(1−α))/n level and linear-interpolation quantile
  * :429-449; symmetric :204, asymmetric :365 with α/2 per tail) and
  * bootstrap.rs (cumulative residual resampling, seeded).
  */
object Conformal {

  /** Linear-interpolation quantile over sorted data ((n−1)-basis). */
  def quantileSorted(sorted: Array[Double], q: Double): Double = {
    if (sorted.isEmpty) return Double.NaN
    if (q <= 0.0) return sorted(0)
    if (q >= 1.0) return sorted.last
    val idx = q * (sorted.length - 1)
    val lo = math.floor(idx).toInt
    val hi = math.min(lo + 1, sorted.length - 1)
    val frac = idx - lo
    sorted(lo) * (1.0 - frac) + sorted(hi) * frac
  }

  /** Split-conformal score: the ceil((n+1)(1−α))/n quantile of |residuals|. */
  def conformalQuantile(residuals: Array[Double], alpha: Double): Double = {
    require(residuals.nonEmpty, "residuals must not be empty")
    require(alpha >= 0.0 && alpha < 1.0, "alpha must be in [0, 1)")
    val sortedAbs = residuals.map(math.abs).sorted
    val n = sortedAbs.length.toDouble
    val level = math.min(1.0, math.max(0.0, math.ceil((n + 1.0) * (1.0 - alpha)) / n))
    quantileSorted(sortedAbs, level)
  }

  /** point ± score. */
  def conformalIntervals(forecasts: Array[Double], score: Double): (Array[Double], Array[Double]) =
    (forecasts.map(_ - score), forecasts.map(_ + score))

  /** One-shot symmetric split conformal. */
  def conformalPredict(residuals: Array[Double], forecasts: Array[Double], alpha: Double):
      (Array[Double], Array[Double], Double) = {
    val q = conformalQuantile(residuals, alpha)
    val (lo, hi) = conformalIntervals(forecasts, q)
    (lo, hi, q)
  }

  /** Asymmetric: separate quantiles of positive / |negative| residuals at α/2. */
  def conformalPredictAsymmetric(residuals: Array[Double], forecasts: Array[Double], alpha: Double):
      (Array[Double], Array[Double], Double) = {
    require(residuals.nonEmpty, "residuals must not be empty")
    val alphaHalf = alpha / 2.0
    def margin(xs: Array[Double]): Double =
      if (xs.isEmpty) 0.0
      else {
        val sorted = xs.sorted
        val n = sorted.length.toDouble
        quantileSorted(sorted, math.min(1.0, math.ceil((n + 1.0) * (1.0 - alphaHalf)) / n))
      }
    val upperM = margin(residuals.filter(_ > 0.0))
    val lowerM = margin(residuals.filter(_ < 0.0).map(math.abs))
    (forecasts.map(_ - lowerM), forecasts.map(_ + upperM), (upperM + lowerM) / 2.0)
  }

  /** Per-horizon-step calibration: residuals grouped by step, one score each
    * (conformal.rs:1894). residualsByStep(i) = calibration residuals for
    * step i+1. */
  def conformalPredictPerStep(residualsByStep: Array[Array[Double]], forecasts: Array[Double],
                              alpha: Double): (Array[Double], Array[Double]) = {
    require(residualsByStep.length == forecasts.length, "one residual set per step")
    val los = new Array[Double](forecasts.length)
    val his = new Array[Double](forecasts.length)
    var i = 0
    while (i < forecasts.length) {
      val q = if (residualsByStep(i).nonEmpty) conformalQuantile(residualsByStep(i), alpha) else 0.0
      los(i) = forecasts(i) - q
      his(i) = forecasts(i) + q
      i += 1
    }
    (los, his)
  }

  /** Empirical coverage + evaluation block. */
  def conformalEvaluate(actual: Array[Double], lower: Array[Double], upper: Array[Double],
                        alpha: Double): Map[String, Double] = {
    val cov = Metrics.coverage(actual, lower, upper)
    val width = Metrics.meanIntervalWidth(lower, upper)
    // Winkler score at level alpha
    var w = 0.0
    var n = 0
    var i = 0
    while (i < actual.length) {
      val a = actual(i); val l = lower(i); val u = upper(i)
      if (!a.isNaN && !l.isNaN && !u.isNaN) {
        var s = u - l
        if (a < l) s += 2.0 / alpha * (l - a)
        if (a > u) s += 2.0 / alpha * (a - u)
        w += s
        n += 1
      }
      i += 1
    }
    // field set mirrors ConformalEvaluation (conformal.rs:655-668)
    Map("coverage" -> cov, "violation_rate" -> (1.0 - cov), "mean_width" -> width,
      "winkler_score" -> (if (n == 0) Double.NaN else w / n),
      "n_observations" -> n.toDouble)
  }

  // ---------------------------------------------------------------- learn/apply v2

  /** Calibration profile (conformal.rs Learn/Apply v2, :7-28 doc, learn
    * :735): per-alpha symmetric scores or per-tail margins, reusable across
    * forecasts. strategy ∈ split | cv | adaptive (cv = K-fold averaged
    * scores; adaptive = exponentially-weighted recent residuals). */
  final case class CalibrationProfile(method: String, strategy: String,
                                      alphas: Array[Double],
                                      lowerMargins: Array[Double],
                                      upperMargins: Array[Double],
                                      nCalibration: Int)

  def conformalLearn(residuals: Array[Double], alphas: Array[Double],
                     method: String = "symmetric", strategy: String = "split",
                     cvFolds: Int = 5, adaptiveHalfLife: Double = 20.0): CalibrationProfile = {
    require(residuals.nonEmpty, "residuals must not be empty")
    require(alphas.nonEmpty, "alphas must not be empty")
    val m = method.toLowerCase
    val s = strategy.toLowerCase
    require(Seq("symmetric", "asymmetric").contains(m), s"method ∈ symmetric|asymmetric, got $method")
    require(Seq("split", "cv", "adaptive").contains(s), s"strategy ∈ split|cv|adaptive, got $strategy")

    def weights: Array[Double] = s match {
      case "adaptive" =>
        val n = residuals.length
        Array.tabulate(n)(i => math.pow(0.5, (n - 1 - i) / adaptiveHalfLife))
      case _ => Array.fill(residuals.length)(1.0)
    }

    def weightedQuantile(xs: Array[Double], ws: Array[Double], q: Double): Double = {
      val order = xs.zip(ws).sortBy(_._1)
      val total = ws.sum
      var acc = 0.0
      var i = 0
      while (i < order.length) {
        acc += order(i)._2
        if (acc >= q * total) return order(i)._1
        i += 1
      }
      order.last._1
    }

    def marginsFor(res: Array[Double], ws: Array[Double]): (Array[Double], Array[Double]) = {
      val lows = new Array[Double](alphas.length)
      val ups = new Array[Double](alphas.length)
      var i = 0
      while (i < alphas.length) {
        val a = alphas(i)
        if (m == "symmetric") {
          val abs = res.map(math.abs)
          val n = abs.length.toDouble
          val level = math.min(1.0, math.ceil((n + 1.0) * (1.0 - a)) / n)
          val q = weightedQuantile(abs, ws, level)
          lows(i) = q; ups(i) = q
        } else {
          val aHalf = a / 2.0
          val posIdx = res.indices.filter(res(_) > 0.0)
          val negIdx = res.indices.filter(res(_) < 0.0)
          def tail(idx: Seq[Int], xs: Int => Double): Double =
            if (idx.isEmpty) 0.0
            else {
              val v = idx.map(xs).toArray
              val w = idx.map(ws).toArray
              val n = v.length.toDouble
              weightedQuantile(v, w, math.min(1.0, math.ceil((n + 1.0) * (1.0 - aHalf)) / n))
            }
          ups(i) = tail(posIdx, res(_))
          lows(i) = tail(negIdx, j => math.abs(res(j)))
        }
        i += 1
      }
      (lows, ups)
    }

    val (lows, ups) = s match {
      case "cv" =>
        // K-fold: average the per-fold margins
        val k = math.min(cvFolds, residuals.length)
        val folds = residuals.indices.groupBy(_ % k).values.toSeq
        val parts = folds.map { hold =>
          val res = hold.map(residuals).toArray
          marginsFor(res, Array.fill(res.length)(1.0))
        }
        (alphas.indices.map(i => parts.map(_._1(i)).sum / parts.length).toArray,
          alphas.indices.map(i => parts.map(_._2(i)).sum / parts.length).toArray)
      case _ => marginsFor(residuals, weights)
    }
    CalibrationProfile(m, s, alphas, lows, ups, residuals.length)
  }

  /** Apply a learned profile: per-alpha interval stacks (alphas.length ×
    * horizon lower/upper arrays). */
  def conformalApply(forecasts: Array[Double], profile: CalibrationProfile):
      (Array[Array[Double]], Array[Array[Double]]) = {
    val lower = profile.alphas.indices.map(i =>
      forecasts.map(_ - profile.lowerMargins(i))).toArray
    val upper = profile.alphas.indices.map(i =>
      forecasts.map(_ + profile.upperMargins(i))).toArray
    (lower, upper)
  }

  // ---------------------------------------------------------------- bootstrap

  /** Counter-based hash RNG: the residual index drawn for `(path, step)` is a
    * pure function of `(seed, path, step)` — no sequential state — so an
    * external engine can replay the exact draw. All intermediate values stay
    * below 2^47, so the same arithmetic is expressible in any engine with
    * 64-bit signed integers (the DuckDB oracle replays it in plain SQL):
    * counter = seed + path·2654435761 + step·40503 (each term mod P), then
    * three xorshift-multiply rounds x ← ((x ⊕ x≫16)·48271) mod P with the
    * Mersenne prime P = 2^31−1. Stable across JVM versions. */
  def bootstrapIndex(seed: Long, path: Int, step: Int, n: Int): Int = {
    val P = 2147483647L
    var x = (((seed % P) + P) % P +
      (path.toLong * 2654435761L) % P + (step.toLong * 40503L) % P) % P
    var r = 0
    while (r < 3) {
      x = x ^ (x >>> 16)
      x = (x * 48271L) % P
      r += 1
    }
    (x % n).toInt
  }

  /** Residual-bootstrap prediction intervals with cumulative resampling so
    * uncertainty grows with horizon (bootstrap.rs:31-60). Seeded. */
  def bootstrapIntervals(residuals: Array[Double], forecasts: Array[Double], nPaths: Int,
                         coverage: Double, seed: Long = 42L): (Array[Double], Array[Double]) = {
    require(residuals.nonEmpty, "residuals must not be empty")
    require(coverage > 0.0 && coverage < 1.0, "coverage must be in (0, 1)")
    val h = forecasts.length
    // paths(p)(t) = forecast(t) + cumulative sum of sampled residuals
    val deviations = Array.ofDim[Double](h, nPaths)
    var p = 0
    while (p < nPaths) {
      var cum = 0.0
      var t = 0
      while (t < h) {
        cum += residuals(bootstrapIndex(seed, p, t, residuals.length))
        deviations(t)(p) = cum
        t += 1
      }
      p += 1
    }
    val alpha = 1.0 - coverage
    val lower = new Array[Double](h)
    val upper = new Array[Double](h)
    var t = 0
    while (t < h) {
      val sorted = deviations(t).sorted
      lower(t) = forecasts(t) + quantileSorted(sorted, alpha / 2.0)
      upper(t) = forecasts(t) + quantileSorted(sorted, 1.0 - alpha / 2.0)
      t += 1
    }
    (lower, upper)
  }

  /** Bootstrap quantile paths: values(q)(t) (bootstrap.rs:20-29). */
  def bootstrapQuantiles(residuals: Array[Double], forecasts: Array[Double], nPaths: Int,
                         quantiles: Array[Double], seed: Long = 42L): Array[Array[Double]] = {
    require(residuals.nonEmpty, "residuals must not be empty")
    val h = forecasts.length
    val deviations = Array.ofDim[Double](h, nPaths)
    var p = 0
    while (p < nPaths) {
      var cum = 0.0
      var t = 0
      while (t < h) {
        cum += residuals(bootstrapIndex(seed, p, t, residuals.length))
        deviations(t)(p) = cum
        t += 1
      }
      p += 1
    }
    quantiles.map { q =>
      Array.tabulate(h) { t => forecasts(t) + quantileSorted(deviations(t).sorted, q) }
    }
  }
}

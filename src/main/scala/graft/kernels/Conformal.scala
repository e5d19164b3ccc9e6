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
    Map("coverage" -> cov, "mean_width" -> width,
      "winkler_score" -> (if (n == 0) Double.NaN else w / n),
      "target_coverage" -> (1.0 - alpha))
  }

  // ---------------------------------------------------------------- bootstrap

  /** Deterministic xorshift64* PRNG — stable across JVM versions. */
  private final class Rng(seed: Long) {
    private var s: Long = if (seed == 0) 0x9E3779B97F4A7C15L else seed
    def nextLong(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
    def nextInt(bound: Int): Int = {
      val r = nextLong() >>> 1
      (r % bound).toInt
    }
  }

  /** Residual-bootstrap prediction intervals with cumulative resampling so
    * uncertainty grows with horizon (bootstrap.rs:31-60). Seeded. */
  def bootstrapIntervals(residuals: Array[Double], forecasts: Array[Double], nPaths: Int,
                         coverage: Double, seed: Long = 42L): (Array[Double], Array[Double]) = {
    require(residuals.nonEmpty, "residuals must not be empty")
    require(coverage > 0.0 && coverage < 1.0, "coverage must be in (0, 1)")
    val h = forecasts.length
    val rng = new Rng(seed)
    // paths(p)(t) = forecast(t) + cumulative sum of sampled residuals / sqrt shape
    val deviations = Array.ofDim[Double](h, nPaths)
    var p = 0
    while (p < nPaths) {
      var cum = 0.0
      var t = 0
      while (t < h) {
        cum += residuals(rng.nextInt(residuals.length))
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
    val rng = new Rng(seed)
    val deviations = Array.ofDim[Double](h, nPaths)
    var p = 0
    while (p < nPaths) {
      var cum = 0.0
      var t = 0
      while (t < h) {
        cum += residuals(rng.nextInt(residuals.length))
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

package graft.kernels

/** Detrending kernels (reference ts_detrend.cpp:118-135; detrending.rs:18-50
  * method enum, fns :142-259): linear / polynomial / diff / diff2 / loess /
  * auto (AIC-selected). Result mirrors the reference struct:
  * {trend[], detrended[], method, coefficients[], rss, n_params}. */
object Detrend {

  final case class Result(trend: Array[Double], detrended: Array[Double], method: String,
                          coefficients: Array[Double], rss: Double, nParams: Int)

  def parseMethod(s: String): String = s.toLowerCase match {
    case "linear" => "linear"
    case "polynomial" | "poly" => "polynomial"
    case "diff" | "diff1" | "difference" => "diff"
    case "diff2" => "diff2"
    case "loess" | "lowess" => "loess"
    case _ => "auto"
  }

  private def rssOf(detrended: Array[Double]): Double =
    detrended.filterNot(_.isNaN).map(v => v * v).sum

  def linear(values: Array[Double]): Result = polynomial(values, 1).copy(method = "linear")

  def polynomial(values: Array[Double], degree: Int): Result = {
    val n = values.length
    require(n >= degree + 2, s"need ${degree + 2} points for degree-$degree fit")
    val x = Array.tabulate(n, degree + 1)((i, j) => math.pow(i.toDouble, j.toDouble))
    val beta = Linalg.olsSolve(x, values)
    val trend = Array.tabulate(n) { i =>
      var s = 0.0
      var j = 0
      while (j <= degree) { s += beta(j) * math.pow(i.toDouble, j.toDouble); j += 1 }
      s
    }
    val detrended = Array.tabulate(n)(i => values(i) - trend(i))
    Result(trend, detrended, "polynomial", beta, rssOf(detrended), degree + 1)
  }

  /** k-th order differencing; the first k detrended entries are NaN, trend
    * is the lagged value (so values = trend + detrended where defined). */
  def diff(values: Array[Double], order: Int): Result = {
    val n = values.length
    require(n > order, s"need more than $order points")
    var cur = values.clone()
    var k = 0
    while (k < order) {
      val next = new Array[Double](cur.length)
      java.util.Arrays.fill(next, Double.NaN)
      var i = 1
      while (i < cur.length) { next(i) = cur(i) - cur(i - 1); i += 1 }
      cur = next
      k += 1
    }
    val trend = Array.tabulate(n)(i => if (cur(i).isNaN) Double.NaN else values(i) - cur(i))
    Result(trend, cur, if (order == 1) "diff" else s"diff$order", Array.empty, rssOf(cur), order)
  }

  def loess(values: Array[Double], bandwidth: Double = 0.3): Result = {
    require(values.length >= 4, "need 4 points for loess")
    val trend = Decomposition.loess(values, bandwidth)
    val detrended = Array.tabulate(values.length)(i => values(i) - trend(i))
    Result(trend, detrended, "loess", Array(bandwidth), rssOf(detrended),
      math.max(2, math.ceil(1.0 / bandwidth).toInt))
  }

  /** AIC model selection over {linear, quadratic, cubic, loess} (detrending.rs:242). */
  def auto(values: Array[Double]): Result = {
    val n = values.length
    val candidates = Seq(
      () => linear(values),
      () => polynomial(values, 2).copy(method = "quadratic"),
      () => polynomial(values, 3).copy(method = "cubic"),
      () => loess(values))
    val fits = candidates.flatMap(f => scala.util.Try(f()).toOption)
    val best = fits.minBy(r => n * math.log(math.max(r.rss, 1e-300) / n) + 2.0 * r.nParams)
    best.copy(method = s"auto:${best.method}")
  }

  def detrend(values: Array[Double], method: String, degree: Int = 2,
              bandwidth: Double = 0.3): Result = parseMethod(method) match {
    case "linear" => linear(values)
    case "polynomial" => polynomial(values, degree)
    case "diff" => diff(values, 1)
    case "diff2" => diff(values, 2)
    case "loess" => loess(values, bandwidth)
    case _ => auto(values)
  }
}

/** Prominence-based peak finding (scipy-like; reference peaks.rs:134-250
  * delegates to fdars — the behavioral contract is local maxima filtered by
  * prominence and minimum distance) + timing regularity vs an expected
  * period. */
object Peaks {

  final case class Peak(index: Int, value: Double, prominence: Double)
  final case class TimingResult(meanInterval: Double, intervalStd: Double,
                                timingVariability: Double, isRegular: Boolean, nPeaks: Int)

  /** Full detection result (peaks.rs PeakDetectionResult:40-70). */
  final case class PeakDetection(peaks: Seq[Peak], nPeaks: Int,
                                 interPeakDistances: Seq[Double], meanPeriod: Double)

  /** Local maxima with prominence ≥ minProminence, greedily thinned to
    * honor minDistance (keep higher peaks first). `smoothFirst` applies a
    * centered moving average of width ≈ n/nbasis before detection — a
    * behavioral stand-in for the reference's B-spline smoothing
    * (peaks.rs:134-162). */
  def detectPeaks(values: Array[Double], minDistance: Option[Double] = None,
                  minProminence: Option[Double] = None,
                  smoothFirst: Boolean = false,
                  smoothNbasis: Option[Int] = None): Seq[Peak] = {
    val pre = values
    val n = pre.length
    require(n >= 3, s"insufficient data: need 3, got $n")
    val data =
      if (!smoothFirst) pre
      else {
        val w = math.max(3, n / math.max(smoothNbasis.getOrElse(math.max(4, n / 4)), 1)) | 1
        Array.tabulate(n) { i =>
          val lo = math.max(0, i - w / 2)
          val hi = math.min(n - 1, i + w / 2)
          var s = 0.0
          var j = lo
          while (j <= hi) { s += pre(j); j += 1 }
          s / (hi - lo + 1)
        }
      }
    detectPeaksImpl(data, minDistance, minProminence)
  }

  /** detect_peaks with the timing summary (inter-peak distances + mean
    * period — peaks.rs:60-69). */
  def detectPeaksFull(values: Array[Double], minDistance: Option[Double] = None,
                      minProminence: Option[Double] = None,
                      smoothFirst: Boolean = false,
                      smoothNbasis: Option[Int] = None): PeakDetection = {
    val ps = detectPeaks(values, minDistance, minProminence, smoothFirst, smoothNbasis)
    val dists =
      if (ps.length < 2) Seq.empty[Double]
      else ps.sliding(2).map(w => (w(1).index - w(0).index).toDouble).toSeq
    PeakDetection(ps, ps.length, dists,
      if (dists.isEmpty) Double.NaN else dists.sum / dists.length)
  }

  private def detectPeaksImpl(values: Array[Double], minDistance: Option[Double],
                              minProminence: Option[Double]): Seq[Peak] = {
    val n = values.length
    val raw = (1 until n - 1).filter(i =>
      values(i) > values(i - 1) && values(i) >= values(i + 1))
    val peaks = raw.map { i =>
      // prominence: height above the higher of the two lowest saddles
      // walking out to the nearest higher terrain (or series end)
      var leftMin = values(i)
      var j = i - 1
      while (j >= 0 && values(j) <= values(i)) { leftMin = math.min(leftMin, values(j)); j -= 1 }
      var rightMin = values(i)
      j = i + 1
      while (j < n && values(j) <= values(i)) { rightMin = math.min(rightMin, values(j)); j += 1 }
      Peak(i, values(i), values(i) - math.max(leftMin, rightMin))
    }
    val thresholded = peaks.filter(p => p.prominence >= minProminence.getOrElse(0.0))
    minDistance match {
      case Some(d) if d > 1 =>
        val kept = scala.collection.mutable.ArrayBuffer[Peak]()
        thresholded.sortBy(-_.prominence).foreach { p =>
          if (kept.forall(q => math.abs(q.index - p.index) >= d)) kept += p
        }
        kept.sortBy(_.index).toSeq
      case _ => thresholded
    }
  }

  /** Peak-interval regularity vs an expected period (peaks.rs analyze_peak_timing). */
  def analyzePeakTiming(values: Array[Double], period: Double): TimingResult = {
    require(period > 0, "period must be positive")
    val peaks = detectPeaks(values)
    if (peaks.length < 2) return TimingResult(Double.NaN, Double.NaN, Double.NaN,
      isRegular = false, peaks.length)
    val intervals = peaks.sliding(2).map(w => (w(1).index - w(0).index).toDouble).toArray
    val mean = intervals.sum / intervals.length
    val std = math.sqrt(intervals.map(v => (v - mean) * (v - mean)).sum / intervals.length)
    val variability = if (period > 0) std / period else Double.NaN
    TimingResult(mean, std, variability, variability < 0.2, peaks.length)
  }
}

package graft.kernels

/** Decomposition kernels: classical (additive/multiplicative), loess-based
  * STL (Cleveland et al. 1990, simplified inner loop), and MSTL (iterated
  * STL over multiple periods — Bandara et al. 2021). Reference surface:
  * ts_decomposition.cpp:195, decomposition.rs:8-41 / mstl_decompose :151,
  * detrending.rs classical decomposition :283-372.
  */
object Decomposition {

  final case class Classical(trend: Array[Double], seasonal: Array[Double],
                             remainder: Array[Double], indices: Array[Double])

  /** Centered moving-average trend (half-weights at the ends for even p). */
  def centeredMA(values: Array[Double], p: Int): Array[Double] = {
    val n = values.length
    val half = p / 2
    val trend = Array.fill(n)(Double.NaN)
    var i = half
    while (i < n - half) {
      var s = 0.0
      if (p % 2 == 0) {
        s += values(i - half) * 0.5 + values(i + half) * 0.5
        var j = i - half + 1
        while (j <= i + half - 1) { s += values(j); j += 1 }
      } else {
        var j = i - half
        while (j <= i + half) { s += values(j); j += 1 }
      }
      trend(i) = s / p
      i += 1
    }
    trend
  }

  /** Classical decomposition (detrending.rs:283 additive, :329 multiplicative). */
  def classical(values: Array[Double], period: Int, multiplicative: Boolean): Classical = {
    val n = values.length
    val p = math.max(period, 2)
    val trend = centeredMA(values, p)
    val sums = new Array[Double](p)
    val counts = new Array[Int](p)
    var i = 0
    while (i < n) {
      if (!trend(i).isNaN && (!multiplicative || trend(i) != 0.0)) {
        val d = if (multiplicative) values(i) / trend(i) else values(i) - trend(i)
        sums(i % p) += d
        counts(i % p) += 1
      }
      i += 1
    }
    val idx = Array.tabulate(p)(k =>
      if (counts(k) > 0) sums(k) / counts(k) else (if (multiplicative) 1.0 else 0.0))
    val mean = idx.sum / p
    val norm =
      if (multiplicative) { if (mean != 0.0) idx.map(_ / mean) else idx }
      else idx.map(_ - mean)
    val seasonal = Array.tabulate(n)(i => norm(i % p))
    val remainder = Array.tabulate(n) { i =>
      if (trend(i).isNaN) Double.NaN
      else if (multiplicative) {
        if (trend(i) * seasonal(i) != 0.0) values(i) / (trend(i) * seasonal(i)) else Double.NaN
      } else values(i) - trend(i) - seasonal(i)
    }
    Classical(trend, seasonal, remainder, norm)
  }

  /** Tricube-weighted local linear regression (loess) at every point. */
  def loess(values: Array[Double], span: Double): Array[Double] = {
    val n = values.length
    val window = math.max(3, math.min(n, math.ceil(span * n).toInt))
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var lo = math.max(0, i - window / 2)
      var hi = math.min(n - 1, lo + window - 1)
      lo = math.max(0, hi - window + 1)
      val maxDist = math.max(math.abs(i - lo), math.abs(hi - i)).toDouble.max(1.0)
      var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0; var swxy = 0.0
      var j = lo
      while (j <= hi) {
        val d = math.abs(j - i) / maxDist
        val w0 = 1.0 - d * d * d
        val w = w0 * w0 * w0
        sw += w; swx += w * j; swy += w * values(j)
        swxx += w * j * j; swxy += w * j * values(j)
        j += 1
      }
      val denom = sw * swxx - swx * swx
      out(i) =
        if (math.abs(denom) > 1e-12) {
          val b = (sw * swxy - swx * swy) / denom
          val a = (swy - b * swx) / sw
          a + b * i
        } else swy / math.max(sw, 1e-12)
      i += 1
    }
    out
  }

  final case class Stl(trend: Array[Double], seasonal: Array[Double], remainder: Array[Double])

  /** STL: iterated (cycle-subseries loess smoothing → deseasonalize →
    * loess trend). 2 outer iterations, loess spans per Cleveland defaults. */
  def stl(values: Array[Double], period: Int, iterations: Int = 2): Stl = {
    val n = values.length
    val p = math.max(period, 2)
    val seasonal = new Array[Double](n)
    var trend = new Array[Double](n)
    var it = 0
    while (it < iterations) {
      // 1. detrend
      val detrended = Array.tabulate(n)(i => values(i) - trend(i))
      // 2. cycle-subseries smoothing
      var pos = 0
      while (pos < p) {
        val idxs = (pos until n by p).toArray
        if (idxs.nonEmpty) {
          val sub = idxs.map(detrended)
          val smoothed = if (sub.length >= 4) loess(sub, 0.75) else {
            val m = sub.sum / sub.length
            Array.fill(sub.length)(m)
          }
          var k = 0
          while (k < idxs.length) { seasonal(idxs(k)) = smoothed(k); k += 1 }
        }
        pos += 1
      }
      // center seasonal by removing its low-pass component
      val lowPass = centeredMAFilled(seasonal, p)
      var i = 0
      while (i < n) { seasonal(i) -= lowPass(i); i += 1 }
      // 3. trend = loess of deseasonalized
      val deseason = Array.tabulate(n)(i => values(i) - seasonal(i))
      trend = loess(deseason, math.min(1.0, (1.5 * p / n) * 4 + 0.3))
      it += 1
    }
    val remainder = Array.tabulate(n)(i => values(i) - trend(i) - seasonal(i))
    Stl(trend, seasonal, remainder)
  }

  /** Centered MA with NaN ends filled by the nearest valid value. */
  private def centeredMAFilled(values: Array[Double], p: Int): Array[Double] = {
    val ma = centeredMA(values, p)
    val n = ma.length
    var firstValid = -1
    var lastValid = -1
    var i = 0
    while (i < n) { if (!ma(i).isNaN) { if (firstValid < 0) firstValid = i; lastValid = i }; i += 1 }
    if (firstValid < 0) return new Array[Double](n)
    i = 0
    while (i < firstValid) { ma(i) = ma(firstValid); i += 1 }
    i = lastValid + 1
    while (i < n) { ma(i) = ma(lastValid); i += 1 }
    ma
  }

  final case class Mstl(trend: Array[Double], seasonals: Seq[(Int, Array[Double])],
                        remainder: Array[Double])

  /** MSTL: iterate STL for each period ascending, subtracting each seasonal
    * (decomposition.rs mstl_decompose:151). */
  def mstl(values: Array[Double], periods: Seq[Int], iterations: Int = 2): Mstl = {
    val n = values.length
    val ps = periods.filter(p => p >= 2 && n >= 2 * p).sorted
    if (ps.isEmpty) {
      val trend = Decomposition.loess(values, 0.5)
      return Mstl(trend, Nil, Array.tabulate(n)(i => values(i) - trend(i)))
    }
    val seasonals = scala.collection.mutable.LinkedHashMap[Int, Array[Double]](
      ps.map(_ -> new Array[Double](n)): _*)
    var it = 0
    while (it < iterations) {
      ps.foreach { p =>
        val deOthers = Array.tabulate(n) { i =>
          values(i) - seasonals.filter(_._1 != p).values.map(_(i)).sum
        }
        val r = stl(deOthers, p, 1)
        seasonals(p) = r.seasonal
      }
      it += 1
    }
    val totalSeasonal = Array.tabulate(n)(i => seasonals.values.map(_(i)).sum)
    val deseason = Array.tabulate(n)(i => values(i) - totalSeasonal(i))
    val trend = loess(deseason, 0.5)
    val remainder = Array.tabulate(n)(i => deseason(i) - trend(i))
    Mstl(trend, seasonals.toSeq, remainder)
  }

  /** Seasonal strength at period p: max(0, 1 − Var(remainder)/Var(seasonal+remainder)). */
  def seasonalStrengthAt(values: Array[Double], p: Int): Double = {
    if (values.length < 2 * p) return 0.0
    val c = classical(values, p, multiplicative = false)
    val pairs = values.indices.filter(i => !c.remainder(i).isNaN)
    if (pairs.isEmpty) return 0.0
    val rem = pairs.map(c.remainder).toArray
    val sr = pairs.map(i => c.seasonal(i) + c.remainder(i)).toArray
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(v => (v - m) * (v - m)).sum / xs.length
    }
    val vs = variance(sr)
    if (vs <= 0) 0.0 else math.max(0.0, math.min(1.0, 1.0 - variance(rem) / vs))
  }
}

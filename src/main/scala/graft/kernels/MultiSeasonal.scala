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

  /** Trend forecaster for deseasonalized series: damped linear (Holt with
    * SSE-optimized params). */
  private def trendForecast(y: Array[Double], horizon: Int): Array[Double] =
    if (y.length < 5) Forecast.sesForecast(y, horizon, 0.3) else Forecast.holt(y, horizon)

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

  /** TBATS, simplified: Box-Cox (log when strictly positive and it shrinks
    * the residual CV), Fourier seasonality (3 harmonics per period) + linear
    * trend by OLS, inverse-transformed extrapolation. */
  def tbatsForecast(values: Array[Double], horizon: Int, periods: Seq[Int]): Array[Double] = {
    val n = values.length
    val ps = periods.filter(p => p >= 2 && n >= 2 * p)
    val useLog = values.forall(_ > 0.0) && {
      val cv = cvOf(values)
      cv > 0.2 // heteroscedastic enough that a log usually stabilizes
    }
    val y = if (useLog) values.map(math.log) else values
    val harmonics = 3
    val k = 2 + ps.length * 2 * harmonics
    val x = Array.ofDim[Double](n, k)
    var t = 0
    while (t < n) {
      x(t)(0) = 1.0
      x(t)(1) = t.toDouble
      var c = 2
      ps.foreach { p =>
        var h = 1
        while (h <= harmonics) {
          x(t)(c) = math.sin(2 * math.Pi * h * t / p)
          x(t)(c + 1) = math.cos(2 * math.Pi * h * t / p)
          c += 2
          h += 1
        }
      }
      t += 1
    }
    val beta = Linalg.olsSolve(x, y)
    val out = Array.tabulate(horizon) { hh =>
      val tt = n + hh
      var pred = beta(0) + beta(1) * tt
      var c = 2
      ps.foreach { p =>
        var h = 1
        while (h <= harmonics) {
          pred += beta(c) * math.sin(2 * math.Pi * h * tt / p) +
            beta(c + 1) * math.cos(2 * math.Pi * h * tt / p)
          c += 2
          h += 1
        }
      }
      pred
    }
    if (useLog) out.map(math.exp) else out
  }

  private def cvOf(values: Array[Double]): Double = {
    val m = values.sum / values.length
    if (m == 0) return 0.0
    math.sqrt(values.map(v => (v - m) * (v - m)).sum / values.length) / math.abs(m)
  }

  /** Laplace: likelihood-weighted mixture over EMA / drift / AR(1) /
    * damped-Holt leaves (weights ∝ exp(−MAE/scale) of one-step errors —
    * Laplace likelihood), optional seasonal adjustment. */
  def laplaceForecast(values: Array[Double], horizon: Int, period: Int): Array[Double] = {
    val n = values.length
    if (values.toSet.size <= 1)
      throw new Forecast.ComputationError("Laplace: constant series")
    val seasonal = period > 1 && n >= 2 * period
    val (sIdx, mult) =
      if (seasonal) Forecast.seasonalIndices(values, period) else (Array.empty[Double], true)
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

    val leaves = Seq(
      Leaf("ema", t => if (t == 0) y(0) else emaLevels(t - 1), h => emaLevels(n - 1)),
      Leaf("drift", t => if (t == 0) y(0) else y(t - 1) + drift, h => y(n - 1) + drift * (h + 1)),
      Leaf("ar1", t => if (t == 0) y(0) else arC + arPhi * y(t - 1),
        h => { var v = y(n - 1); var k = 0; while (k <= h) { v = arC + arPhi * v; k += 1 }; v }),
      Leaf("holt", t => holtOneStep(t), h => dampedFc(h)))

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
    if (!seasonal) base
    else if (mult) Array.tabulate(horizon)(h => base(h) * sIdx((n + h) % period))
    else Array.tabulate(horizon)(h => base(h) + sIdx((n + h) % period))
  }
}

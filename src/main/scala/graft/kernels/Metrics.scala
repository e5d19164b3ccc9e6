package graft.kernels

/** Forecast evaluation metrics.
  * Semantics match reference crates/anofox-fcst-core/src/metrics.rs
  * (mae :46, mse :70, rmse :94, mape :113, smape :142, mase :165, r2 :190,
  * bias :225, rmae :235, quantile_loss :275, mqloss :312, coverage :343).
  * All ignore pairs where either side is NaN, mirroring the reference's
  * null handling at the FFI boundary.
  */
object Metrics {

  @inline private def pairs(actual: Array[Double], pred: Array[Double]): Iterator[(Double, Double)] = {
    require(actual.length == pred.length,
      s"length mismatch: actual=${actual.length} predicted=${pred.length}")
    actual.iterator.zip(pred.iterator).filter { case (a, p) => !a.isNaN && !p.isNaN }
  }

  def mae(actual: Array[Double], pred: Array[Double]): Double = {
    var s = 0.0; var n = 0
    pairs(actual, pred).foreach { case (a, p) => s += math.abs(a - p); n += 1 }
    if (n == 0) Double.NaN else s / n
  }

  def mse(actual: Array[Double], pred: Array[Double]): Double = {
    var s = 0.0; var n = 0
    pairs(actual, pred).foreach { case (a, p) => val d = a - p; s += d * d; n += 1 }
    if (n == 0) Double.NaN else s / n
  }

  def rmse(actual: Array[Double], pred: Array[Double]): Double = math.sqrt(mse(actual, pred))

  /** Skips terms where actual == 0 (metrics.rs:113-140). Percentage. */
  def mape(actual: Array[Double], pred: Array[Double]): Double = {
    var s = 0.0; var n = 0
    pairs(actual, pred).foreach { case (a, p) =>
      if (a != 0.0) { s += math.abs((a - p) / a); n += 1 }
    }
    if (n == 0) Double.NaN else 100.0 * s / n
  }

  /** Symmetric MAPE; terms with |a|+|p| == 0 are skipped. Percentage. */
  def smape(actual: Array[Double], pred: Array[Double]): Double = {
    var s = 0.0; var n = 0
    pairs(actual, pred).foreach { case (a, p) =>
      val denom = math.abs(a) + math.abs(p)
      if (denom != 0.0) { s += 2.0 * math.abs(a - p) / denom; n += 1 }
    }
    if (n == 0) Double.NaN else 100.0 * s / n
  }

  /** MASE scaled by the seasonal-naive in-sample MAE of the training series
    * (metrics.rs:165-188). */
  def mase(actual: Array[Double], pred: Array[Double], train: Array[Double],
           seasonLength: Int = 1): Double = {
    if (train.length <= seasonLength) return Double.NaN
    var s = 0.0; var n = 0
    var i = seasonLength
    while (i < train.length) {
      val a = train(i); val b = train(i - seasonLength)
      if (!a.isNaN && !b.isNaN) { s += math.abs(a - b); n += 1 }
      i += 1
    }
    val scale = if (n == 0) Double.NaN else s / n
    if (scale == 0.0 || scale.isNaN) return Double.NaN
    mae(actual, pred) / scale
  }

  def r2(actual: Array[Double], pred: Array[Double]): Double = {
    var sumA = 0.0; var n = 0
    pairs(actual, pred).foreach { case (a, _) => sumA += a; n += 1 }
    if (n == 0) return Double.NaN
    val mean = sumA / n
    var ssRes = 0.0; var ssTot = 0.0
    pairs(actual, pred).foreach { case (a, p) =>
      ssRes += (a - p) * (a - p); ssTot += (a - mean) * (a - mean)
    }
    if (ssTot == 0.0) Double.NaN else 1.0 - ssRes / ssTot
  }

  /** Mean signed error (forecast - actual). */
  def bias(actual: Array[Double], pred: Array[Double]): Double = {
    var s = 0.0; var n = 0
    pairs(actual, pred).foreach { case (a, p) => s += (p - a); n += 1 }
    if (n == 0) Double.NaN else s / n
  }

  /** Relative MAE: MAE(pred1) / MAE(pred2) (metrics.rs:235-273). */
  def rmae(actual: Array[Double], pred1: Array[Double], pred2: Array[Double]): Double = {
    val m2 = mae(actual, pred2)
    if (m2 == 0.0 || m2.isNaN) Double.NaN else mae(actual, pred1) / m2
  }

  /** Pinball loss at quantile q (metrics.rs:275-310). */
  def quantileLoss(actual: Array[Double], pred: Array[Double], q: Double): Double = {
    var s = 0.0; var n = 0
    pairs(actual, pred).foreach { case (a, p) =>
      val d = a - p
      s += (if (d >= 0) q * d else (q - 1.0) * d)
      n += 1
    }
    if (n == 0) Double.NaN else s / n
  }

  /** Multi-quantile loss: mean of per-quantile pinball losses
    * (metrics.rs:312-341). preds(i) is the prediction path for quantiles(i). */
  def mqLoss(actual: Array[Double], preds: Array[Array[Double]], quantiles: Array[Double]): Double = {
    require(preds.length == quantiles.length, "one prediction array per quantile")
    if (quantiles.isEmpty) return Double.NaN
    val ls = quantiles.indices.map(i => quantileLoss(actual, preds(i), quantiles(i)))
    val ok = ls.filterNot(_.isNaN)
    if (ok.isEmpty) Double.NaN else ok.sum / ok.length
  }

  /** Fraction of actuals inside [lower, upper] (metrics.rs:343-...). */
  def coverage(actual: Array[Double], lower: Array[Double], upper: Array[Double]): Double = {
    require(actual.length == lower.length && actual.length == upper.length, "length mismatch")
    var in = 0; var n = 0
    var i = 0
    while (i < actual.length) {
      val a = actual(i)
      if (!a.isNaN && !lower(i).isNaN && !upper(i).isNaN) {
        if (a >= lower(i) && a <= upper(i)) in += 1
        n += 1
      }
      i += 1
    }
    if (n == 0) Double.NaN else in.toDouble / n
  }

  /** Mean prediction-interval width (conformal.cpp:1246). */
  def meanIntervalWidth(lower: Array[Double], upper: Array[Double]): Double = {
    require(lower.length == upper.length, "length mismatch")
    var s = 0.0; var n = 0
    var i = 0
    while (i < lower.length) {
      if (!lower(i).isNaN && !upper(i).isNaN) { s += upper(i) - lower(i); n += 1 }
      i += 1
    }
    if (n == 0) Double.NaN else s / n
  }
}

package graft.kernels

import java.time.{Instant, LocalDateTime, ZoneOffset}

import graft.types.{FreqType, Frequency}

/** The 34-36 field per-series statistics block.
  * Field-for-field semantics from reference stats.rs:24-97 (struct),
  * compute_ts_stats :106-280, helpers :478-793: linear-interp percentiles,
  * Fisher G1/G2 bias-corrected moments, Hill tail index (k=√n, α=1/H),
  * bimodality (G1²+1)/(G2+3), 10% trimmed mean, histogram entropy (10 bins),
  * stability = 1/(CV of rolling means + 0.01), R²-based trend strength,
  * max |ACF| at lags {2,4,7,12} seasonality strength.
  */
object Stats {

  final case class TsStats(
      length: Long, n_nulls: Long, n_nan: Long, n_zeros: Long, n_positive: Long,
      n_negative: Long, n_unique_values: Long, is_constant: Boolean,
      n_zeros_start: Long, n_zeros_end: Long, plateau_size: Long, plateau_size_nonzero: Long,
      mean: Double, median: Double, std_dev: Double, variance: Double,
      min: Double, max: Double, range: Double, sum: Double,
      skewness: Double, kurtosis: Double, tail_index: Double, bimodality_coef: Double,
      trimmed_mean: Double, coef_variation: Double, q1: Double, q3: Double, iqr: Double,
      autocorr_lag1: Double, trend_strength: Double, seasonality_strength: Double,
      entropy: Double, stability: Double,
      expected_length: Option[Long], n_gaps: Option[Long])

  private val Eps = 2.220446049250313e-16 // f64::EPSILON

  /** Base stats; `valid(i)=false` ⇒ NULL; NaN values counted separately. */
  def compute(series: Array[Double], valid: Array[Boolean]): TsStats = {
    val length = series.length
    var nNulls = 0L
    var nNan = 0L
    val vb = Array.newBuilder[Double]
    var i = 0
    while (i < length) {
      if (!valid(i)) nNulls += 1
      else if (series(i).isNaN) nNan += 1
      else vb += series(i)
      i += 1
    }
    val values = vb.result()
    val nValid = values.length
    if (nValid == 0)
      return TsStats(length, nNulls, nNan, 0, 0, 0, 0, is_constant = false, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None)

    val nZeros = values.count(_ == 0.0)
    val nPositive = values.count(_ > 0.0)
    val nNegative = values.count(_ < 0.0)
    val nUnique = values.map(java.lang.Double.doubleToLongBits).toSet.size
    val isConstant = nUnique == 1

    // leading/trailing zeros over the ORIGINAL series (null breaks the run)
    var zStart = 0L
    i = 0
    while (i < length && valid(i) && !series(i).isNaN && series(i) == 0.0) { zStart += 1; i += 1 }
    var zEnd = 0L
    i = length - 1
    while (i >= 0 && valid(i) && !series(i).isNaN && series(i) == 0.0) { zEnd += 1; i -= 1 }

    val plateau = plateauSize(values)
    val plateauNz = plateauSizeNonzero(values)

    var sum = 0.0
    values.foreach(sum += _)
    val mean = sum / nValid
    val min = values.min
    val max = values.max
    val range = max - min
    val variance =
      if (nValid > 1) values.map(v => (v - mean) * (v - mean)).sum / (nValid - 1) else 0.0
    val stdDev = math.sqrt(variance)
    val coefVar = if (math.abs(mean) > Eps) stdDev / math.abs(mean) else Double.NaN

    val sorted = values.sorted
    val median = percentile(sorted, 0.5)
    val q1 = percentile(sorted, 0.25)
    val q3 = percentile(sorted, 0.75)

    val skewness =
      if (nValid > 2 && stdDev > Eps) {
        val n = nValid.toDouble
        val m3 = values.map(v => math.pow(v - mean, 3)).sum / n
        (m3 / math.pow(stdDev, 3)) * math.sqrt(n * (n - 1.0)) / (n - 2.0)
      } else Double.NaN
    val kurtosis =
      if (nValid > 3 && stdDev > Eps) {
        val n = nValid.toDouble
        val m4 = values.map(v => math.pow(v - mean, 4)).sum / n
        val g2 = m4 / math.pow(stdDev, 4) - 3.0
        (n - 1.0) / ((n - 2.0) * (n - 3.0)) * ((n + 1.0) * g2 + 6.0)
      } else Double.NaN

    val tailIndex = hillEstimator(values)
    val bimodality =
      if (nValid > 3 && java.lang.Double.isFinite(kurtosis) && java.lang.Double.isFinite(skewness))
        (skewness * skewness + 1.0) / (kurtosis + 3.0)
      else Double.NaN
    val trimmedMean = computeTrimmedMean(sorted, 0.1)
    val acf1 = autocorrelation(values, 1)
    val (trendStrength, seasonalityStrength) = strengthMetrics(values)
    val entropy = approximateEntropy(values)
    val stability = computeStability(values)

    TsStats(length, nNulls, nNan, nZeros, nPositive, nNegative, nUnique, isConstant,
      zStart, zEnd, plateau, plateauNz, mean, median, stdDev, variance, min, max, range,
      sum, skewness, kurtosis, tailIndex, bimodality, trimmedMean, coefVar, q1, q3, q3 - q1,
      acf1, trendStrength, seasonalityStrength, entropy, stability, None, None)
  }

  /** Stats + expected_length / n_gaps from dates (stats.rs:312-380). */
  def computeWithDates(series: Array[Double], valid: Array[Boolean], dates: Array[Long],
                       freq: Frequency): TsStats = {
    val base = compute(series, valid)
    if (dates.isEmpty) return base
    val sorted = dates.sorted
    if (sorted.length < 2)
      return base.copy(expected_length = Some(sorted.length.toLong), n_gaps = Some(0L))
    val first = sorted.head
    val last = sorted.last
    freq.tpe match {
      case FreqType.Monthly =>
        base.copy(expected_length = Some(monthIndex(last) - monthIndex(first) + 1L),
          n_gaps = Some(sorted.sliding(2).count(w => monthIndex(w(1)) - monthIndex(w(0)) > 1)))
      case FreqType.Quarterly =>
        base.copy(expected_length = Some(quarterIndex(last) - quarterIndex(first) + 1L),
          n_gaps = Some(sorted.sliding(2).count(w => quarterIndex(w(1)) - quarterIndex(w(0)) > 1)))
      case FreqType.Yearly =>
        base.copy(expected_length = Some((year(last) - year(first) + 1).toLong),
          n_gaps = Some(sorted.sliding(2).count(w => year(w(1)) - year(w(0)) > 1)))
      case FreqType.Fixed =>
        if (freq.micros > 0) {
          val threshold = (freq.micros * 1.5).toLong
          base.copy(expected_length = Some((last - first) / freq.micros + 1L),
            n_gaps = Some(sorted.sliding(2).count(w => w(1) - w(0) > threshold)))
        } else base
    }
  }

  private def dt(micros: Long): LocalDateTime =
    LocalDateTime.ofInstant(Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L), ZoneOffset.UTC)
  private def monthIndex(m: Long): Long = { val d = dt(m); d.getYear * 12L + d.getMonthValue }
  private def quarterIndex(m: Long): Long = { val d = dt(m); d.getYear * 4L + (d.getMonthValue - 1) / 3 }
  private def year(m: Long): Int = dt(m).getYear

  /** Linear-interpolation percentile over a sorted array (stats.rs:478). */
  def percentile(sorted: Array[Double], p: Double): Double = {
    if (sorted.isEmpty) return Double.NaN
    if (sorted.length == 1) return sorted(0)
    val idx = p * (sorted.length - 1.0)
    val lower = math.floor(idx).toInt
    val upper = math.ceil(idx).toInt
    val frac = idx - lower
    if (upper >= sorted.length) sorted.last
    else sorted(lower) * (1.0 - frac) + sorted(upper) * frac
  }

  def autocorrelation(values: Array[Double], lag: Int): Double = {
    if (values.length <= lag) return Double.NaN
    val n = values.length
    var mean = 0.0
    values.foreach(mean += _)
    mean /= n
    var num = 0.0
    var denom = 0.0
    var i = 0
    while (i < n) {
      denom += (values(i) - mean) * (values(i) - mean)
      if (i >= lag) num += (values(i) - mean) * (values(i - lag) - mean)
      i += 1
    }
    if (math.abs(denom) < Eps) 0.0 else num / denom
  }

  private def strengthMetrics(values: Array[Double]): (Double, Double) = {
    if (values.length < 4) return (0.0, 0.0)
    val n = values.length.toDouble
    val xMean = (n - 1.0) / 2.0
    var yMean = 0.0
    values.foreach(yMean += _)
    yMean /= n
    var ssXY = 0.0; var ssXX = 0.0; var ssYY = 0.0
    var i = 0
    while (i < values.length) {
      val x = i.toDouble
      ssXY += (x - xMean) * (values(i) - yMean)
      ssXX += (x - xMean) * (x - xMean)
      ssYY += (values(i) - yMean) * (values(i) - yMean)
      i += 1
    }
    val trend = if (math.abs(ssXX) > Eps && math.abs(ssYY) > Eps)
      math.min(1.0, math.max(0.0, math.sqrt(ssXY * ssXY / (ssXX * ssYY)))) else 0.0
    // stats.rs: ACF at lag>len returns NaN via autocorrelation? there it returns NaN→filtered
    val lagsAbs = Seq(2, 4, 7, 12).map(l => math.abs(autocorrelation(values, l)))
      .filter(java.lang.Double.isFinite)
    val seasonal = if (lagsAbs.isEmpty) 0.0 else math.min(1.0, math.max(0.0, lagsAbs.max))
    (trend, seasonal)
  }

  private def approximateEntropy(values: Array[Double]): Double = {
    if (values.length < 10) return Double.NaN
    val min = values.min
    val max = values.max
    val range = max - min
    if (math.abs(range) < Eps) return 0.0
    val nBins = 10
    val bins = new Array[Int](nBins)
    values.foreach { v =>
      val bin = math.min(nBins - 1, math.round(((v - min) / range) * (nBins - 1)).toInt)
      bins(bin) += 1
    }
    val n = values.length.toDouble
    var e = 0.0
    bins.foreach { c => if (c > 0) { val p = c / n; e -= p * math.log(p) } }
    e
  }

  private def computeStability(values: Array[Double]): Double = {
    if (values.length < 10) return Double.NaN
    val window = math.max(values.length / 5, 3)
    val means = (0 to values.length - window).map { i =>
      var s = 0.0
      var j = i
      while (j < i + window) { s += values(j); j += 1 }
      s / window
    }
    if (means.isEmpty) return Double.NaN
    val rmMean = means.sum / means.length
    val rmStd = math.sqrt(means.map(v => (v - rmMean) * (v - rmMean)).sum / means.length)
    if (math.abs(rmMean) > Eps) 1.0 / (rmStd / math.abs(rmMean) + 0.01) else Double.NaN
  }

  private def hillEstimator(values: Array[Double]): Double = {
    if (values.length < 10) return Double.NaN
    val absV = values.map(math.abs).filter(_ > Eps)
    if (absV.length < 10) return Double.NaN
    val desc = absV.sorted(Ordering.Double.TotalOrdering.reverse)
    val k = math.min(desc.length - 1, math.max(2, math.floor(math.sqrt(desc.length.toDouble)).toInt))
    val threshold = desc(k)
    if (threshold <= Eps) return Double.NaN
    var sumLog = 0.0
    var i = 0
    while (i < k) { sumLog += math.log(desc(i) / threshold); i += 1 }
    val h = sumLog / k
    if (h <= Eps) Double.NaN else 1.0 / h
  }

  private def computeTrimmedMean(sorted: Array[Double], trim: Double): Double = {
    val n = sorted.length
    if (n == 0) return Double.NaN
    val trimCount = math.floor(n * trim).toInt
    if (2 * trimCount >= n) return sorted.sum / n
    val slice = sorted.slice(trimCount, n - trimCount)
    slice.sum / slice.length
  }

  private def plateauSize(values: Array[Double]): Long = {
    if (values.isEmpty) return 0
    var maxRun = 1L
    var cur = 1L
    var i = 1
    while (i < values.length) {
      if (java.lang.Double.doubleToLongBits(values(i)) ==
        java.lang.Double.doubleToLongBits(values(i - 1))) {
        cur += 1
        if (cur > maxRun) maxRun = cur
      } else cur = 1
      i += 1
    }
    maxRun
  }

  private def plateauSizeNonzero(values: Array[Double]): Long = {
    if (values.isEmpty) return 0
    var maxRun = 0L
    var cur = 0L
    var prev: Option[Long] = None
    values.foreach { v =>
      if (v == 0.0) {
        if (cur > maxRun) maxRun = cur
        cur = 0
        prev = None
      } else {
        val bits = java.lang.Double.doubleToLongBits(v)
        if (prev.contains(bits)) cur += 1
        else cur = 1
        prev = Some(bits)
        if (cur > maxRun) maxRun = cur
      }
    }
    maxRun
  }
}

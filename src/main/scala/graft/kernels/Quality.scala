package graft.kernels

/** Per-series data-quality scores.
  * Semantics from reference quality.rs: compute_data_quality :66-116,
  * dimension scores :196-271 (structural = completeness·0.7 + length/30·0.3;
  * temporal = 1 − 5·gap_ratio; magnitude penalizes IQR outliers and >4σ
  * extremes; behavioral penalizes constant series and |ACF1| > 0.95),
  * gap counting via mode of date diffs with 1.5× tolerance :159-193.
  */
object Quality {

  final case class DataQuality(
      structural_score: Double, temporal_score: Double, magnitude_score: Double,
      behavioral_score: Double, overall_score: Double,
      n_gaps: Long, n_missing: Long, is_constant: Boolean)

  private val Eps = 2.220446049250313e-16

  def compute(values: Array[Double], valid: Array[Boolean], dates: Option[Array[Long]]): DataQuality = {
    val n = values.length
    if (n == 0) return DataQuality(0, 0, 0, 0, 0, 0, 0, is_constant = false)
    val nMissing = valid.count(!_)
    val nonNull = values.indices.filter(valid(_)).map(values(_)).toArray
    val nGaps = dates.map(countGaps).getOrElse(0)
    val isConstant =
      if (nonNull.length < 2) true
      else nonNull.forall(v => math.abs(v - nonNull(0)) < Eps)

    val structural = structuralScore(nonNull, nMissing)
    val temporal = temporalScore(nGaps, n)
    val magnitude = magnitudeScore(nonNull)
    val behavioral = behavioralScore(nonNull)
    val overall = (structural + temporal + magnitude + behavioral) / 4.0
    DataQuality(structural, temporal, magnitude, behavioral, overall,
      nGaps.toLong, nMissing.toLong, isConstant)
  }

  private def countGaps(dates: Array[Long]): Int = {
    if (dates.length < 2) return 0
    val sorted = dates.sorted
    val diffs = sorted.sliding(2).map(w => w(1) - w(0)).toArray
    val mode = diffs.groupBy(identity).maxByOption(_._2.length).map(_._1).getOrElse(1L)
    val threshold = (mode * 1.5).toLong
    diffs.count(_ > threshold)
  }

  private def structuralScore(values: Array[Double], nMissing: Int): Double = {
    if (values.isEmpty && nMissing > 0) return 0.0
    val total = values.length + nMissing
    val completeness = values.length.toDouble / total
    val lengthFactor = math.min(values.length / 30.0, 1.0)
    math.min(1.0, math.max(0.0, completeness * 0.7 + lengthFactor * 0.3))
  }

  private def temporalScore(nGaps: Int, n: Int): Double = {
    if (n == 0) return 0.0
    math.min(1.0, math.max(0.0, 1.0 - (nGaps.toDouble / n) * 5.0))
  }

  private def magnitudeScore(values: Array[Double]): Double = {
    if (values.isEmpty) return 0.0
    val n = values.length.toDouble
    val sorted = values.sorted
    // NOTE reference indexes quartiles as sorted[(n*0.25) as usize] (quality.rs:229)
    val q1 = sorted(math.min(sorted.length - 1, (n * 0.25).toInt))
    val q3 = sorted(math.min(sorted.length - 1, (n * 0.75).toInt))
    val iqr = q3 - q1
    val lower = q1 - 1.5 * iqr
    val upper = q3 + 1.5 * iqr
    val outlierRatio = values.count(v => v < lower || v > upper) / n
    val mean = values.sum / n
    val std = math.sqrt(values.map(v => (v - mean) * (v - mean)).sum / n)
    val extremeRatio = values.count(v => math.abs(v - mean) > 4.0 * std) / n
    math.min(1.0, math.max(0.0, 1.0 - outlierRatio * 2.0 - extremeRatio * 3.0))
  }

  private def behavioralScore(values: Array[Double]): Double = {
    if (values.length < 3) return 0.5
    val mean = values.sum / values.length
    val variance = values.map(v => (v - mean) * (v - mean)).sum / values.length
    if (math.abs(variance) < Eps) return 0.0
    val acf1 = Stats.autocorrelation(values, 1)
    val penalty = if (math.abs(acf1) > 0.95) 0.2 else 0.0
    math.min(1.0, math.max(0.0, 1.0 - penalty))
  }
}

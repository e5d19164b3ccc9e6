package graft.kernels

/** Extended seasonality analysis — classification, windowed strength,
  * seasonality-change detection, Hilbert instantaneous period, amplitude
  * modulation. Behavioral contracts from reference seasonality.rs:380-790
  * (the numeric core lives in the public fdars crate; re-derived here from
  * the published definitions): strength threshold 0.3, timing threshold 0.1,
  * window 2·period. */
object SeasonalityExt {

  final case class Classification(
      timing_classification: String, modulation_type: String, has_stable_timing: Boolean,
      timing_variability: Double, seasonal_strength: Double, is_seasonal: Boolean,
      cycle_strengths: Array[Double], weak_seasons: Array[Int])

  final case class Analysis(periods: Array[Int], strengths: Array[Double],
                            primary_period: Int, trend_strength: Double,
                            seasonal_strength: Double, is_seasonal: Boolean)

  /** ts_analyze_seasonality (seasonality.rs:380-440): detected periods with
    * clamped-ACF strengths. */
  def analyze(values: Array[Double], maxPeriod: Option[Int] = None): Analysis = {
    val periods = Seasonality.detectSeasonality(values, maxPeriod)
    val n = values.length
    val mean = values.sum / n
    val variance = values.map(v => (v - mean) * (v - mean)).sum
    val trendStrength = {
      // R² of linear fit (stats.rs compute_strength_metrics trend part)
      val xm = (n - 1) / 2.0
      var sxy = 0.0; var sxx = 0.0
      var i = 0
      while (i < n) { sxy += (i - xm) * (values(i) - mean); sxx += (i - xm) * (i - xm); i += 1 }
      if (sxx > 0 && variance > 0) math.min(1.0, math.sqrt(sxy * sxy / (sxx * variance))) else 0.0
    }
    if (periods.isEmpty)
      return Analysis(Array.empty, Array.empty, 0, trendStrength, 0.0, is_seasonal = false)
    val strengths = periods.map { p =>
      if (p >= n) 0.0
      else {
        var s = 0.0
        var i = 0
        while (i < n - p) { s += (values(i) - mean) * (values(i + p) - mean); i += 1 }
        if (variance > 2.22e-16) math.min(1.0, math.max(0.0, s / variance)) else 0.0
      }
    }
    Analysis(periods, strengths, periods.head, trendStrength, strengths.max,
      is_seasonal = strengths.max >= 0.3)
  }

  /** Per-window seasonal strength over sliding windows of `windowSize`
    * (default 2·period), stepping one period at a time. */
  def windowedStrength(values: Array[Double], period: Int,
                       windowSize: Option[Int] = None): Array[Double] = {
    require(values.length >= 4, "need 4 points")
    require(period > 0, "period must be positive")
    val win = windowSize.getOrElse(2 * period)
    if (values.length < win) return Array(Decomposition.seasonalStrengthAt(values, period))
    (0 to values.length - win by period).map { start =>
      Decomposition.seasonalStrengthAt(values.slice(start, start + win), period)
    }.toArray
  }

  /** classify_seasonality (seasonality.rs:648): timing stability from the
    * per-cycle peak-phase variability, modulation from the per-cycle
    * amplitude trend, weak seasons from per-window strength. */
  def classify(values: Array[Double], period: Int,
               strengthThreshold: Double = 0.3,
               timingThreshold: Double = 0.1): Classification = {
    val n = values.length
    require(n >= 2 * period, s"insufficient data: need ${2 * period}, got $n")
    require(period > 0, "period must be positive")

    val strength = Decomposition.seasonalStrengthAt(values, period)
    val isSeasonal = strength >= strengthThreshold
    val cycleStrengths = windowedStrength(values, period)
    val weakSeasons = cycleStrengths.zipWithIndex
      .filter(_._1 < strengthThreshold).map(_._2)

    // per-cycle peak phase + amplitude
    val nCycles = n / period
    val phases = new Array[Double](nCycles)
    val amplitudes = new Array[Double](nCycles)
    var c = 0
    while (c < nCycles) {
      val cycle = values.slice(c * period, (c + 1) * period)
      var maxI = 0
      var j = 1
      while (j < cycle.length) { if (cycle(j) > cycle(maxI)) maxI = j; j += 1 }
      phases(c) = maxI.toDouble / period
      amplitudes(c) = cycle.max - cycle.min
      c += 1
    }
    // circular std of phases
    val timingVariability =
      if (nCycles < 2) 0.0
      else {
        val sx = phases.map(p => math.cos(2 * math.Pi * p)).sum / nCycles
        val sy = phases.map(p => math.sin(2 * math.Pi * p)).sum / nCycles
        val r = math.sqrt(sx * sx + sy * sy)
        math.sqrt(math.max(0.0, -2.0 * math.log(math.max(r, 1e-12)))) / (2 * math.Pi)
      }
    val hasStableTiming = timingVariability < timingThreshold

    // SeasonalType vocabulary (seasonality.rs:99-108)
    val timingClass =
      if (!isSeasonal) "non_seasonal"
      else if (hasStableTiming && weakSeasons.isEmpty) "stable_seasonal"
      else if (weakSeasons.length > nCycles / 2) "intermittent_seasonal"
      else "variable_timing"

    // amplitude modulation: slope of per-cycle amplitudes vs mean amplitude
    // (AmplitudeModulationType vocabulary, seasonality.rs:266-275)
    val modulation =
      if (!isSeasonal) "non_seasonal"
      else if (nCycles < 3) "stable"
      else {
        val meanA = amplitudes.sum / nCycles
        val xm = (nCycles - 1) / 2.0
        var sxy = 0.0; var sxx = 0.0
        c = 0
        while (c < nCycles) { sxy += (c - xm) * (amplitudes(c) - meanA); sxx += (c - xm) * (c - xm); c += 1 }
        val slope = if (sxx > 0) sxy / sxx else 0.0
        val rel = if (meanA > 1e-12) slope * nCycles / meanA else 0.0
        if (rel > 0.3) "emerging" else if (rel < -0.3) "fading" else "stable"
      }

    Classification(timingClass, modulation, hasStableTiming, timingVariability,
      strength, isSeasonal, cycleStrengths, weakSeasons)
  }

  final case class SeasonalityChange(index: Int, changeType: String, strengthBefore: Double,
                                     strengthAfter: Double)

  /** detect_seasonality_changes (seasonality.rs:699): threshold crossings of
    * the windowed strength curve, with a minimum run length. */
  def detectChanges(values: Array[Double], period: Int, threshold: Double = 0.3,
                    windowSize: Option[Int] = None,
                    minDurationPeriods: Int = 1): (Seq[SeasonalityChange], Array[Double]) = {
    require(values.length >= 2 * period, s"insufficient data: need ${2 * period}")
    val curve = windowedStrength(values, period, windowSize)
    val changes = scala.collection.mutable.ArrayBuffer[SeasonalityChange]()
    var i = 1
    while (i < curve.length) {
      val before = curve(i - 1)
      val after = curve(i)
      if (before < threshold && after >= threshold) {
        // require the new state to persist minDuration windows
        val persists = (i until math.min(curve.length, i + minDurationPeriods))
          .forall(curve(_) >= threshold)
        // ChangePointType vocabulary (seasonality.rs:160-169)
        if (persists) changes += SeasonalityChange(i * period, "onset", before, after)
      } else if (before >= threshold && after < threshold) {
        val persists = (i until math.min(curve.length, i + minDurationPeriods))
          .forall(curve(_) < threshold)
        if (persists) changes += SeasonalityChange(i * period, "cessation", before, after)
      }
      i += 1
    }
    (changes.toSeq, curve)
  }

  final case class Instantaneous(period: Array[Double], frequency: Array[Double],
                                 amplitude: Array[Double])

  /** Hilbert-transform instantaneous period: analytic signal via FFT,
    * unwrapped-phase derivative → frequency(t), envelope → amplitude(t). */
  def instantaneousPeriod(values: Array[Double]): Instantaneous = {
    val n = values.length
    require(n >= 4, s"insufficient data: need 4, got $n")
    val mean = values.sum / n
    var padded = 1
    while (padded < n) padded <<= 1
    val re = new Array[Double](padded)
    val im = new Array[Double](padded)
    var i = 0
    while (i < n) { re(i) = values(i) - mean; i += 1 }
    Fft.fft(re, im)
    // analytic signal: zero negative freqs, double positives
    i = 1
    while (i < padded / 2) { re(i) *= 2; im(i) *= 2; i += 1 }
    i = padded / 2 + 1
    while (i < padded) { re(i) = 0; im(i) = 0; i += 1 }
    // inverse FFT via conjugation trick
    val imNeg = im.map(-_)
    Fft.fft(re, imNeg)
    val aRe = re.map(_ / padded)
    val aIm = imNeg.map(v => -v / padded)
    val phase = Array.tabulate(n)(i => math.atan2(aIm(i), aRe(i)))
    val amplitude = Array.tabulate(n)(i => math.sqrt(aRe(i) * aRe(i) + aIm(i) * aIm(i)))
    // unwrap + differentiate
    val freq = new Array[Double](n)
    val period = new Array[Double](n)
    var prev = phase(0)
    var acc = 0.0
    i = 1
    while (i < n) {
      var d = phase(i) - prev
      while (d > math.Pi) d -= 2 * math.Pi
      while (d < -math.Pi) d += 2 * math.Pi
      prev = phase(i)
      acc = d
      val f = math.abs(acc) / (2 * math.Pi)
      freq(i) = f
      period(i) = if (f > 1e-9) 1.0 / f else Double.NaN
      i += 1
    }
    freq(0) = freq(1)
    period(0) = period(1)
    Instantaneous(period, freq, amplitude)
  }

  final case class AmplitudeModulation(is_seasonal: Boolean, seasonal_strength: Double,
                                       has_modulation: Boolean, modulation_type: String,
                                       modulation_score: Double, amplitude_trend: Double,
                                       wavelet_amplitude: Array[Double],
                                       time_points: Array[Double], scale: Double)

  /** detect_amplitude_modulation (seasonality.rs:772-830): amplitude-envelope
    * trend relative to the mean amplitude. The reference samples the
    * envelope with a Morlet CWT at the seasonal scale; this re-derivation
    * samples it per cycle (range of each period-length block) — same
    * modulation semantics, coarser envelope grid (documented deviation, the
    * SeasonalityExt-family contract). `wavelet_amplitude`/`time_points`
    * carry that per-cycle envelope (time = cycle start index, matching the
    * change-point time convention); `scale` is the analysis period.
    * Threshold defaults follow the core: modulation 0.2, seasonality 0.3
    * (seasonality.rs:798-800). */
  def amplitudeModulation(values: Array[Double], period: Int,
                          modulationThreshold: Double = 0.2,
                          seasonalityThreshold: Double = 0.3): AmplitudeModulation = {
    val n = values.length
    require(n >= 2 * period, s"insufficient data: need ${2 * period}")
    val strength = Decomposition.seasonalStrengthAt(values, period)
    val nCycles = n / period
    val amps = Array.tabulate(nCycles) { c =>
      val cyc = values.slice(c * period, (c + 1) * period)
      cyc.max - cyc.min
    }
    val meanA = amps.sum / nCycles
    val xm = (nCycles - 1) / 2.0
    var sxy = 0.0; var sxx = 0.0
    var c = 0
    while (c < nCycles) { sxy += (c - xm) * (amps(c) - meanA); sxx += (c - xm) * (c - xm); c += 1 }
    val slope = if (sxx > 0) sxy / sxx else 0.0
    val rel = if (meanA > 1e-12) slope * nCycles / meanA else 0.0
    val mType =
      if (strength < seasonalityThreshold) "non_seasonal"
      else if (rel > modulationThreshold) "emerging"
      else if (rel < -modulationThreshold) "fading" else "stable"
    AmplitudeModulation(strength >= seasonalityThreshold, strength,
      math.abs(rel) > modulationThreshold, mType,
      math.min(1.0, math.abs(rel)), slope,
      amps, Array.tabulate(nCycles)(c => (c * period).toDouble), period.toDouble)
  }
}

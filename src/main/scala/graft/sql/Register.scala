package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

import graft.agg.Aggregators
import graft.functions.TsFunctions
import graft.kernels._

/** One-call SQL registration (`LoadInternal` analogue,
  * src/anofox_forecast_extension.cpp:16-206): every scalar function and
  * aggregate under its reference name plus the `anofox_fcst_` alias
  * (ts_macros.cpp:2186-2196), and the top table macros as real table-valued
  * functions in the session registry (the reference's
  * `SELECT * FROM ts_forecast_by('sales', id, ds, y, 'AutoETS', 12, '1d')`
  * UX — see [[GraftExtensions]] for the spark.sql.extensions route and the
  * macro catalog). */
object Register {

  private def arr(xs: Seq[java.lang.Double]): Array[Double] =
    xs.map(x => if (x == null) Double.NaN else x.doubleValue()).toArray

  def registerAll(spark: SparkSession): Unit = {
    TsFunctions.registerAll(spark)
    Aggregators.registerAll(spark)

    // table macros: FROM ts_forecast_by('tbl', id, ds, y, 'AutoETS', 12, '1d')
    // (incl. the reference's anofox_fcst_ aliases, ts_macros.cpp:2186-2196)
    TableMacros.allNames.foreach { name =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, exprs => TableMacros.expand(spark, TableMacros.canonical(name), exprs),
        "built-in")
    }

    def reg(name: String, f: org.apache.spark.sql.expressions.UserDefinedFunction): Unit = {
      spark.udf.register(name, f)
      spark.udf.register("anofox_fcst_" + name.stripPrefix("ts_"), f)
    }

    // seasonality / periods
    reg("ts_detect_seasonality", udf((vs: Seq[java.lang.Double]) =>
      Seasonality.detectSeasonality(arr(vs).filterNot(_.isNaN), None).toSeq))
    reg("ts_estimate_period_fft", udf((vs: Seq[java.lang.Double]) =>
      Periods.estimatePeriodFft(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_estimate_period_acf", udf((vs: Seq[java.lang.Double]) =>
      Periods.estimatePeriodAcf(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_autoperiod", udf((vs: Seq[java.lang.Double]) =>
      Periods.autoperiod(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_cfd_autoperiod", udf((vs: Seq[java.lang.Double]) =>
      Periods.cfdAutoperiod(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_lomb_scargle", udf((vs: Seq[java.lang.Double]) =>
      Periods.lombScargle(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_aic_period", udf((vs: Seq[java.lang.Double]) =>
      Periods.aicPeriod(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_ssa_period", udf((vs: Seq[java.lang.Double]) =>
      Periods.ssaPeriod(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_stl_period", udf((vs: Seq[java.lang.Double]) =>
      Periods.stlPeriod(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_matrix_profile_period", udf((vs: Seq[java.lang.Double]) =>
      Periods.matrixProfilePeriod(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_sazed_period", udf((vs: Seq[java.lang.Double]) =>
      Periods.sazedPeriod(arr(vs).filterNot(_.isNaN)).period))
    reg("ts_detect_periods", udf((vs: Seq[java.lang.Double], method: String) =>
      Periods.detectPeriods(arr(vs).filterNot(_.isNaN), method).primaryPeriod))
    // iterative residual-subtraction multi-period scalar (periods.rs:369)
    reg("ts_detect_multiple_periods", udf((vs: Seq[java.lang.Double]) =>
      Periods.detectMultiplePeriods(arr(vs).filterNot(_.isNaN))
        .map(p => (p.period, p.confidence, p.iteration))))
    reg("ts_seasonal_strength", udf((vs: Seq[java.lang.Double], period: Int) =>
      Decomposition.seasonalStrengthAt(arr(vs).filterNot(_.isNaN), period)))

    // conformal / bootstrap
    reg("ts_conformal_quantile", udf((rs: Seq[java.lang.Double], alpha: Double) =>
      Conformal.conformalQuantile(arr(rs).filterNot(_.isNaN), alpha)))
    reg("ts_conformal_intervals", udf((fc: Seq[java.lang.Double], q: Double) => {
      val (lo, hi) = Conformal.conformalIntervals(arr(fc), q)
      (lo.toSeq, hi.toSeq)
    }))
    reg("ts_conformal_predict", udf(
      (rs: Seq[java.lang.Double], fc: Seq[java.lang.Double], alpha: Double) => {
        val (lo, hi, q) = Conformal.conformalPredict(arr(rs).filterNot(_.isNaN), arr(fc), alpha)
        (lo.toSeq, hi.toSeq, q)
      }))
    reg("ts_conformal_predict_asymmetric", udf(
      (rs: Seq[java.lang.Double], fc: Seq[java.lang.Double], alpha: Double) => {
        val (lo, hi, q) = Conformal.conformalPredictAsymmetric(
          arr(rs).filterNot(_.isNaN), arr(fc), alpha)
        (lo.toSeq, hi.toSeq, q)
      }))
    reg("ts_bootstrap_intervals", udf(
      (rs: Seq[java.lang.Double], fc: Seq[java.lang.Double], nPaths: Int, coverage: Double, seed: Long) => {
        val (lo, hi) = Conformal.bootstrapIntervals(arr(rs).filterNot(_.isNaN), arr(fc),
          nPaths, coverage, seed)
        (lo.toSeq, hi.toSeq)
      }))
    reg("ts_mean_interval_width", TsFunctions.tsMeanIntervalWidth)
    reg("ts_conformal_predict_per_step", udf(
      (rsBySteps: Seq[Seq[java.lang.Double]], fc: Seq[java.lang.Double], alpha: Double) => {
        val (lo, hi) = Conformal.conformalPredictPerStep(
          rsBySteps.map(rs => arr(rs).filterNot(_.isNaN)).toArray, arr(fc), alpha)
        (lo.toSeq, hi.toSeq)
      }))
    reg("ts_conformal_coverage", udf(
      (actual: Seq[java.lang.Double], lo: Seq[java.lang.Double], hi: Seq[java.lang.Double]) =>
        Metrics.coverage(arr(actual), arr(lo), arr(hi))))
    reg("ts_conformal_evaluate", udf(
      (actual: Seq[java.lang.Double], lo: Seq[java.lang.Double], hi: Seq[java.lang.Double],
       alpha: Double) => {
        val m = Conformal.conformalEvaluate(arr(actual), arr(lo), arr(hi), alpha)
        (m("coverage"), m("violation_rate"), m("mean_width"), m("winkler_score"),
          m("n_observations").toLong)
      }))
    reg("ts_conformal_learn", udf(
      (rs: Seq[java.lang.Double], alphas: Seq[java.lang.Double], method: String,
       strategy: String) => {
        val p = Conformal.conformalLearn(arr(rs).filterNot(_.isNaN), arr(alphas),
          method, strategy)
        (p.method, p.strategy, p.alphas.toSeq, p.lowerMargins.toSeq,
          p.upperMargins.toSeq, p.nCalibration)
      }))
    reg("ts_conformal_apply", udf(
      (fc: Seq[java.lang.Double], alphas: Seq[java.lang.Double],
       lowerMargins: Seq[java.lang.Double], upperMargins: Seq[java.lang.Double]) => {
        val profile = Conformal.CalibrationProfile("symmetric", "split",
          arr(alphas), arr(lowerMargins), arr(upperMargins), arr(alphas).length)
        val (lo, hi) = Conformal.conformalApply(arr(fc), profile)
        (lo.map(_.toSeq).toSeq, hi.map(_.toSeq).toSeq)
      }))
    reg("ts_bootstrap_quantiles", udf(
      (rs: Seq[java.lang.Double], fc: Seq[java.lang.Double], nPaths: Int,
       quantiles: Seq[java.lang.Double], seed: Long) =>
        Conformal.bootstrapQuantiles(arr(rs).filterNot(_.isNaN), arr(fc), nPaths,
          arr(quantiles), seed).map(_.toSeq).toSeq))

    // multi-quantile pinball loss (metrics.cpp:924)
    reg("ts_mqloss", udf(
      (a: Seq[java.lang.Double], preds: Seq[Seq[java.lang.Double]],
       qs: Seq[java.lang.Double]) =>
        Metrics.mqLoss(arr(a), preds.map(p => arr(p)).toArray, arr(qs))))

    // detrend / decomposition / changepoints on arrays
    reg("ts_detrend", udf((vs: Seq[java.lang.Double], method: String) => {
      val r = Detrend.detrend(arr(vs), method)
      (r.trend.toSeq, r.detrended.toSeq, r.method)
    }))
    reg("ts_detect_changepoints", udf((vs: Seq[java.lang.Double]) =>
      Changepoint.pelt(arr(vs).filterNot(_.isNaN)).toSeq))
    reg("ts_detect_changepoints_bocpd", udf((vs: Seq[java.lang.Double], hazard: Double) => {
      val r = Changepoint.bocpd(arr(vs).filterNot(_.isNaN), hazard)
      (r.isChangepoint.toSeq, r.probability.toSeq)
    }))

    // forecasting on arrays (the _ts_forecast scalar shape). The reference's
    // values-only scalar does NOT auto-detect seasonality — period stays 1
    // unless the caller passes one (ts_forecast.cpp:131-137; pinned by
    // test/sql/ts_forecast_basic_models.test where SeasonalNaive on a
    // period-4 wave without params repeats the LAST value).
    reg("ts_forecast_values", udf((vs: Seq[java.lang.Double], method: String, horizon: Int) => {
      val values = arr(vs)
      val valid = vs.map(_ != null).toArray
      val out = Forecast.forecast(values, valid, Forecast.Options(
        model = Forecast.canonicalModel(method), horizon = horizon,
        autoDetectSeasonality = false))
      (out.point.toSeq, out.lower.toSeq, out.upper.toSeq, out.modelName)
    }))

    // model catalog (forecast.rs:2647 list_models)
    reg("ts_list_models", udf(() => Forecast.listModels.map(_._1)))

    // native codegen cosine similarity over two ARRAY<DOUBLE> columns —
    // registered straight into the function registry (a Catalyst Expression,
    // not a UDF, so it stays inside whole-stage codegen)
    Seq("ts_cosine_similarity", "anofox_fcst_cosine_similarity").foreach { name =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
        exprs => {
          if (exprs.length != 2) throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> name, "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
          graft.functions.CosineSimilarity(exprs(0), exprs(1))
        }, "built-in")
    }

    // classical seasonal decomposition scalar (ts_detrend.cpp:145-157:
    // STRUCT(trend[], seasonal[], remainder[], period, method))
    reg("ts_decompose_seasonal", udf((vs: Seq[java.lang.Double], period: Int, method: String) => {
      val values = arr(vs).filterNot(_.isNaN)
      val mult = method != null && method == "multiplicative"
      val r = graft.kernels.Decomposition.classical(values, period, mult)
      // period stays integral, matching decomposeSeasonalBy and the
      // reference struct (ts_detrend.cpp STRUCT(..., period, method))
      (r.trend.toSeq, r.seasonal.toSeq, r.remainder.toSeq, period,
        if (mult) "multiplicative" else "additive")
    }))

    // memory estimation parity helper (metrics.cpp:1081)
    reg("ts_estimate_backtest_memory", udf(
      (nSeries: Long, seriesLength: Long, folds: Int, horizon: Int) =>
        graft.ops.TsCvOp.estimateBacktestMemory(nSeries, seriesLength, folds, horizon)))

    // fit-state introspection scalars (ts_forecast_inspect_scalar.cpp):
    // inspect → STRUCT of fit parameters, explain → per-horizon component
    // STRUCT-of-LISTs. Both take the value array + method name.
    reg("ts_forecast_inspect", udf((vs: Seq[java.lang.Double], method: String) => {
      val values = arr(vs)
      val valid = vs.map(_ != null).toArray
      Introspect.inspect(values, valid, Forecast.Options(
        model = Forecast.canonicalModel(method)))
    }))
    reg("ts_forecast_explain", udf(
      (vs: Seq[java.lang.Double], method: String, horizon: Int) => {
        val values = arr(vs)
        val valid = vs.map(_ != null).toArray
        Introspect.explain(values, valid, horizon, Forecast.Options(
          model = Forecast.canonicalModel(method), horizon = horizon))
      }))

    // ---------------------------------------------------------------------
    // Extended-seasonality scalar surface (reference overload sets:
    // ts_seasonality.cpp:276-303, ts_detrend.cpp:416-439/573-602/685-695/
    // 807-830). Spark's udf registration is fixed-arity, so the reference's
    // optional trailing arguments dispatch through the function registry —
    // each name resolves any supported arity to one underlying UDF with the
    // reference's documented defaults filled in as literals. Struct field
    // names match the reference result types exactly, so ported SQL keeps
    // addressing `r.primary_period`, `r.change_points`, etc.
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.lit
    val B = org.apache.spark.sql.GraftExpressionBridge
    def regVariadic(name: String, minArgs: Int, maxArgs: Int)
                   (build: Seq[Column] => Column): Unit =
      Seq(name, "anofox_fcst_" + name.stripPrefix("ts_")).foreach { n =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(n,
          exprs => {
            if (exprs.length < minArgs || exprs.length > maxArgs)
              throw new IllegalArgumentException(
                s"$n expects $minArgs to $maxArgs arguments, got ${exprs.length}")
            // resolvedExpression, not expression: the lazy column-node
            // wrapper types as VOID when returned from a registry builder
            B.resolvedExpression(build(exprs.map(B.column)))
          }, "built-in")
      }

    // ts_analyze_seasonality (ts_seasonality.cpp:276-303): values-only, or
    // the C++-API-compatible (timestamps, values) form — timestamps are
    // ignored, exactly as the reference's overload does (:145-147)
    val analyzeSeasonalityUdf = udf((vs: Seq[java.lang.Double]) => {
      val clean = arr(vs).filterNot(_.isNaN)
      if (clean.length < 4) None
      else {
        val a = SeasonalityExt.analyze(clean)
        Some(SeasonalityResultSql(a.periods.toSeq, a.primary_period,
          a.seasonal_strength, a.trend_strength))
      }
    })
    regVariadic("ts_analyze_seasonality", 1, 2)(cols =>
      analyzeSeasonalityUdf(cols.last))

    // ts_seasonal_strength_windowed (ts_detrend.cpp:416-439): rolling
    // strength per window position; window_size defaults to 2·period
    // (seasonality.rs:599-620). Only the core's default 'variance' method is
    // implemented — 'spectral'/'wavelet' use a numeric core this library has
    // not re-derived, and silently substituting variance would misreport, so
    // they raise.
    val strengthWindowedUdf = udf(
      (vs: Seq[java.lang.Double], period: Double, window: Double, method: String) => {
        require(period > 0.0, "period must be positive")
        val m = method.toLowerCase
        require(m == "variance" || m == "var",
          s"ts_seasonal_strength_windowed: method '$method' not supported " +
            "(only 'variance', the reference default)")
        val clean = arr(vs).filterNot(_.isNaN)
        val p = math.max(1, math.round(period).toInt)
        val win = if (window > 0.0) Some(math.round(window).toInt) else None
        // short series → NULL, like every sibling scalar (a 3-point group
        // is data the surface tolerates, not a config error — the
        // reference FFI returns null on kernel failure the same way)
        if (clean.length < 4) None
        else Some(SeasonalityExt.windowedStrength(clean, p, win).toSeq)
      })
    regVariadic("ts_seasonal_strength_windowed", 2, 4)(cols =>
      strengthWindowedUdf(cols.head, cols(1),
        if (cols.length > 2) cols(2) else lit(0.0),
        if (cols.length > 3) cols(3) else lit("variance")))

    // ts_detect_seasonality_changes (ts_detrend.cpp:573-602): threshold
    // crossings of the windowed strength curve. Defaults per the core:
    // threshold 0.3, window 2·period, min_duration one period
    // (seasonality.rs:699-740); min_duration converts from the core's
    // absolute units to whole windows.
    val seasonalityChangesUdf = udf(
      (vs: Seq[java.lang.Double], period: Double, threshold: Double,
       window: Double, minDuration: Double) => {
        require(period > 0.0, "period must be positive")
        val clean = arr(vs).filterNot(_.isNaN)
        val p = math.max(1, math.round(period).toInt)
        // shorter than two full cycles (or the 4-point strength floor,
        // binding at period 1) → NULL (the kernel's insufficient-data
        // contract; siblings return NULL the same way)
        if (clean.length < math.max(4, 2 * p)) None
        else {
          val th = if (threshold > 0.0) threshold else 0.3
          val win = if (window > 0.0) Some(math.round(window).toInt) else None
          val minDur =
            if (minDuration > 0.0) math.max(1, math.round(minDuration / p).toInt) else 1
          val (changes, curve) = SeasonalityExt.detectChanges(clean, p, th, win, minDur)
          Some(ChangeDetectionSql(
            changes.map(c => ChangePointSql(c.index.toLong, c.index.toDouble,
              c.changeType, c.strengthBefore, c.strengthAfter)),
            changes.length.toLong, curve.toSeq))
        }
      })
    regVariadic("ts_detect_seasonality_changes", 2, 5)(cols =>
      seasonalityChangesUdf(cols.head, cols(1),
        if (cols.length > 2) cols(2) else lit(0.0),
        if (cols.length > 3) cols(3) else lit(0.0),
        if (cols.length > 4) cols(4) else lit(0.0)))

    // ts_instantaneous_period (ts_detrend.cpp:685-695): Hilbert analytic
    // signal → per-point period/frequency/amplitude
    val instantaneousUdf = udf((vs: Seq[java.lang.Double]) => {
      val clean = arr(vs).filterNot(_.isNaN)
      if (clean.length < 4) None
      else {
        val r = SeasonalityExt.instantaneousPeriod(clean)
        Some(InstantaneousPeriodSql(r.period.toSeq, r.frequency.toSeq,
          r.amplitude.toSeq))
      }
    })
    regVariadic("ts_instantaneous_period", 1, 1)(cols => instantaneousUdf(cols.head))

    // ts_detect_amplitude_modulation (ts_detrend.cpp:807-830): amplitude
    // envelope trend; thresholds default per the core (modulation 0.2,
    // seasonality 0.3 — seasonality.rs:798-800)
    val amplitudeModulationUdf = udf(
      (vs: Seq[java.lang.Double], period: Double, modThresh: Double,
       seasThresh: Double) => {
        require(period > 0.0, "period must be positive")
        val clean = arr(vs).filterNot(_.isNaN)
        val p = math.max(1, math.round(period).toInt)
        if (clean.length < 2 * p) None
        else {
          val r = SeasonalityExt.amplitudeModulation(clean, p,
            if (modThresh > 0.0) modThresh else 0.2,
            if (seasThresh > 0.0) seasThresh else 0.3)
          Some(AmplitudeModulationSql(r.is_seasonal, r.seasonal_strength,
            r.has_modulation, r.modulation_type, r.modulation_score,
            r.amplitude_trend, r.wavelet_amplitude.toSeq, r.time_points.toSeq,
            r.scale))
        }
      })
    regVariadic("ts_detect_amplitude_modulation", 2, 4)(cols =>
      amplitudeModulationUdf(cols.head, cols(1),
        if (cols.length > 2) cols(2) else lit(0.0),
        if (cols.length > 3) cols(3) else lit(0.0)))

    // ts_features_config_from_json / _from_csv (ts_features.cpp:320-470):
    // parse a feature-selection config into the reference's
    // STRUCT(feature_names, overrides) shape, ready to feed ts_features_by.
    // (The reference's FFI stub returns the full catalog regardless of
    // input; this follows the functions' documented contract and the
    // library's own TsFeaturesOp parsers instead, so the parsed config is
    // the one ts_features_from_json/_from_csv actually apply.)
    val configFromJsonUdf = udf((json: String) => {
      val names = graft.ops.TsFeaturesOp.parseJsonConfig(json)
      FeaturesConfigSql(names, names.map(n => FeatureOverrideSql(n, "{}")))
    })
    regVariadic("ts_features_config_from_json", 1, 1)(cols =>
      configFromJsonUdf(cols.head))
    val configFromCsvUdf = udf((csv: String) => {
      val names = graft.ops.TsFeaturesOp.parseCsvConfig(csv)
      FeaturesConfigSql(names, names.map(n => FeatureOverrideSql(n, "{}")))
    })
    regVariadic("ts_features_config_from_csv", 1, 1)(cols =>
      configFromCsvUdf(cols.head))
  }

  /** SQL result shapes mirroring the reference's struct types (field names
    * are part of the surface contract — ported scripts address them). */
  final case class SeasonalityResultSql(detected_periods: Seq[Int],
                                        primary_period: Int,
                                        seasonal_strength: Double,
                                        trend_strength: Double)
  final case class ChangePointSql(index: Long, time: Double, change_type: String,
                                  strength_before: Double, strength_after: Double)
  final case class ChangeDetectionSql(change_points: Seq[ChangePointSql],
                                      n_changes: Long, strength_curve: Seq[Double])
  final case class InstantaneousPeriodSql(periods: Seq[Double],
                                          frequencies: Seq[Double],
                                          amplitudes: Seq[Double])
  final case class AmplitudeModulationSql(is_seasonal: Boolean,
                                          seasonal_strength: Double,
                                          has_modulation: Boolean,
                                          modulation_type: String,
                                          modulation_score: Double,
                                          amplitude_trend: Double,
                                          wavelet_amplitude: Seq[Double],
                                          time_points: Seq[Double], scale: Double)
  final case class FeatureOverrideSql(feature: String, params_json: String)
  final case class FeaturesConfigSql(feature_names: Seq[String],
                                     overrides: Seq[FeatureOverrideSql])
}

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
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.kernels.Conformal

/** Conformal-prediction macro layer (reference ts_macros.cpp:1446-1601):
  * `ts_conformal_by`, `ts_conformal_calibrate`, `ts_conformal_apply_by`,
  * `ts_interval_width_by` as DataFrame transformers.
  *
  * Spark shape: the only per-group reduction is the conformity score (an
  * interpolated quantile of the calibration residuals — one UDF over a
  * per-group collected residual list, O(|group|) memory); the interval
  * arithmetic itself stays per-row relational/codegen, so applying a
  * calibration to a billion-row forecast table never materializes lists.
  * The reference returns LIST columns; here each forecast row yields one
  * output row (consistent with the engine's exploded-row convention).
  */
object TsConformalOp {

  /** Per-group (lower_margin, upper_margin, conformity_score) from
    * calibration residuals (actual − forecast). */
  private def margins(backtest: DataFrame, groupCol: String, actualCol: String,
                      forecastCol: String, alpha: Double, method: String): DataFrame = {
    val resid = (col(actualCol) - col(forecastCol)).cast(DoubleType)
    val mUdf = method match {
      case "asymmetric" => udf((rs: Seq[Double]) => {
        // probe the kernel at forecast 0 to recover the two tail margins
        val (lo, hi, score) = Conformal.conformalPredictAsymmetric(rs.toArray, Array(0.0), alpha)
        (-lo(0), hi(0), score)
      })
      case _ => udf((rs: Seq[Double]) => {
        val q = Conformal.conformalQuantile(rs.toArray, alpha)
        (q, q, q)
      })
    }
    backtest
      .filter(col(actualCol).isNotNull && col(forecastCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(collect_list(resid).as("_r"))
      .select(col(groupCol), mUdf(col("_r")).as("_m"))
      .select(col(groupCol), col("_m._1").as("_lower_margin"),
        col("_m._2").as("_upper_margin"), col("_m._3").as("_score"))
  }

  /** ts_conformal_by (ts_macros.cpp:1446): calibrate on backtest residuals,
    * interval every non-null point forecast. Output: (group, point, lower,
    * upper, coverage, conformity_score, method) — one row per forecast. */
  def conformalBy(backtest: DataFrame, groupCol: String, actualCol: String,
                  forecastCol: String, pointForecastCol: String,
                  alpha: Double = 0.1, method: String = "symmetric"): DataFrame = {
    require(Seq("symmetric", "asymmetric").contains(method),
      s"method must be symmetric|asymmetric, got '$method'")
    val m = margins(backtest, groupCol, actualCol, forecastCol, alpha, method)
    backtest
      .filter(col(pointForecastCol).isNotNull)
      .select(col(groupCol), col(pointForecastCol).cast(DoubleType).as("point"))
      .join(m, Seq(groupCol))
      .select(col(groupCol), col("point"),
        (col("point") - col("_lower_margin")).as("lower"),
        (col("point") + col("_upper_margin")).as("upper"),
        lit(1.0 - alpha).as("coverage"),
        col("_score").as("conformity_score"),
        lit(method).as("method"))
  }

  /** ts_conformal_calibrate (ts_macros.cpp:1514): one-row calibration
    * profile (conformity_score, coverage, n_residuals). */
  def conformalCalibrate(backtest: DataFrame, actualCol: String, forecastCol: String,
                         alpha: Double = 0.1): DataFrame = {
    val resid = (col(actualCol) - col(forecastCol)).cast(DoubleType)
    val qUdf = udf((rs: Seq[Double]) => Conformal.conformalQuantile(rs.toArray, alpha))
    backtest
      .filter(col(actualCol).isNotNull && col(forecastCol).isNotNull)
      .agg(collect_list(resid).as("_r"), count(lit(1)).as("n_residuals"))
      .select(qUdf(col("_r")).as("conformity_score"),
        lit(1.0 - alpha).as("coverage"), col("n_residuals"))
  }

  /** ts_conformal_apply_by (ts_macros.cpp:1545): pure per-row arithmetic —
    * point ± score. No shuffle at all. */
  def conformalApplyBy(forecasts: DataFrame, groupCol: String, forecastCol: String,
                       conformityScore: Double): DataFrame =
    forecasts
      .filter(col(forecastCol).isNotNull)
      .select(col(groupCol), col(forecastCol).cast(DoubleType).as("forecast"))
      .withColumn("lower", col("forecast") - lit(conformityScore))
      .withColumn("upper", col("forecast") + lit(conformityScore))

  /** `conformal_evaluate` as a `_by` form (conformal.rs:1159-1180): per-group
    * empirical coverage, violation rate, mean width, Winkler score at level
    * alpha, and observation count. Pure column expressions — one shuffle on
    * the group key, fully codegen'd. */
  def conformalEvaluateBy(results: DataFrame, groupCol: String, actualCol: String,
                          lowerCol: String, upperCol: String,
                          alpha: Double): DataFrame = {
    val a = col(actualCol).cast(DoubleType)
    val l = col(lowerCol).cast(DoubleType)
    val u = col(upperCol).cast(DoubleType)
    val inside = (a >= l && a <= u).cast(DoubleType)
    val winkler = (u - l) +
      when(a < l, (l - a) * lit(2.0 / alpha)).otherwise(lit(0.0)) +
      when(a > u, (a - u) * lit(2.0 / alpha)).otherwise(lit(0.0))
    results
      .filter(a.isNotNull && l.isNotNull && u.isNotNull)
      .groupBy(col(groupCol))
      .agg(avg(inside).as("coverage"),
        (lit(1.0) - avg(inside)).as("violation_rate"),
        avg(u - l).as("mean_width"),
        avg(winkler).as("winkler_score"),
        count(lit(1)).as("n_observations"))
  }

  /** ts_interval_width_by (ts_macros.cpp:1574): per-group mean interval
    * width + count. Plain aggregate. */
  def intervalWidthBy(results: DataFrame, groupCol: String, lowerCol: String,
                      upperCol: String): DataFrame =
    results
      .filter(col(lowerCol).isNotNull && col(upperCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(avg(col(upperCol).cast(DoubleType) - col(lowerCol).cast(DoubleType)).as("mean_width"),
        count(lit(1)).as("n_intervals"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.kernels.Metrics

/** Per-group metric tables (`_ts_metrics_native` / `_ts_mase_native`,
  * src/table_functions/ts_metrics_native.cpp:296-312, :742-800): group
  * columns = every input column EXCEPT the date/value columns; output = the
  * group columns plus one DOUBLE column named after the metric. Values are
  * gathered date-ordered per group and evaluated by the same kernel
  * functions the array-UDF surface uses. */
object TsMetricsOp {

  /** Gather `valueCols` per group (all other columns except `dateCol`),
    * date-ordered, and apply `f` to the value arrays. */
  private def gatherApply(df: DataFrame, dateCol: String, valueCols: Seq[String],
                          out: String, f: Seq[Column] => Column): DataFrame = {
    val nonGroup = (dateCol +: valueCols).toSet
    val groupCols = df.columns.filterNot(nonGroup.contains).toSeq
    require(groupCols.nonEmpty,
      s"no group columns left after excluding ${nonGroup.mkString(", ")}")
    val packed = struct((col(dateCol).as("_d") +:
      valueCols.zipWithIndex.map { case (c, i) =>
        coalesce(col(c).cast(DoubleType), lit(Double.NaN)).as(s"_v$i")
      }): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(packed)).as("_s"))
      .select(groupCols.map(col) :+
        f(valueCols.indices.map(i => col(s"_s._v$i"))).as(out): _*)
  }

  /** mae | mse | rmse | mape | smape | r2 | bias over (actual, forecast),
    * output column named after the metric (ts_macros.cpp:2017-2086). */
  def metricBy(df: DataFrame, dateCol: String, actualCol: String,
               forecastCol: String, metric: String): DataFrame = {
    val fn: (Array[Double], Array[Double]) => Double = metric match {
      case "mae" => Metrics.mae case "mse" => Metrics.mse
      case "rmse" => Metrics.rmse case "mape" => Metrics.mape
      case "smape" => Metrics.smape case "r2" => Metrics.r2
      case "bias" => Metrics.bias
      case other => throw new IllegalArgumentException(
        s"Unknown metric '$other' (mae|mse|rmse|mape|smape|r2|bias)")
    }
    val u = udf((a: Seq[Double], p: Seq[Double]) => fn(a.toArray, p.toArray))
    gatherApply(df, dateCol, Seq(actualCol, forecastCol), metric,
      vs => u(vs(0), vs(1)))
  }

  /** MASE against a baseline forecast column (`_ts_mase_native`): rows where
    * ANY of the three values is missing are dropped (matching the native's
    * NaN filter), then mae(actual, forecast) / mae(actual, baseline). */
  def maseBy(df: DataFrame, dateCol: String, actualCol: String,
             forecastCol: String, baselineCol: String): DataFrame = {
    val clean = df.filter(Seq(actualCol, forecastCol, baselineCol).map(c =>
      col(c).isNotNull && !isnan(col(c).cast(DoubleType))).reduce(_ && _))
    val u = udf((a: Seq[Double], f: Seq[Double], b: Seq[Double]) => {
      val denom = Metrics.mae(a.toArray, b.toArray)
      if (denom == 0.0 || denom.isNaN) Double.NaN
      else Metrics.mae(a.toArray, f.toArray) / denom
    })
    gatherApply(clean, dateCol, Seq(actualCol, forecastCol, baselineCol), "mase",
      vs => u(vs(0), vs(1), vs(2)))
  }

  /** Relative MAE of two competing forecasts (ts_macros.cpp:2097). */
  def rmaeBy(df: DataFrame, dateCol: String, actualCol: String,
             pred1Col: String, pred2Col: String): DataFrame = {
    val u = udf((a: Seq[Double], p1: Seq[Double], p2: Seq[Double]) =>
      Metrics.rmae(a.toArray, p1.toArray, p2.toArray))
    gatherApply(df, dateCol, Seq(actualCol, pred1Col, pred2Col), "rmae",
      vs => u(vs(0), vs(1), vs(2)))
  }

  /** Empirical interval coverage (ts_macros.cpp:2107). */
  def coverageBy(df: DataFrame, dateCol: String, actualCol: String,
                 lowerCol: String, upperCol: String): DataFrame = {
    val u = udf((a: Seq[Double], lo: Seq[Double], hi: Seq[Double]) =>
      Metrics.coverage(a.toArray, lo.toArray, hi.toArray))
    gatherApply(df, dateCol, Seq(actualCol, lowerCol, upperCol), "coverage",
      vs => u(vs(0), vs(1), vs(2)))
  }

  /** Pinball loss at a quantile level (ts_macros.cpp:2117). */
  def quantileLossBy(df: DataFrame, dateCol: String, actualCol: String,
                     forecastCol: String, quantile: Double): DataFrame = {
    val u = udf((a: Seq[Double], p: Seq[Double]) =>
      Metrics.quantileLoss(a.toArray, p.toArray, quantile))
    gatherApply(df, dateCol, Seq(actualCol, forecastCol), "quantile_loss",
      vs => u(vs(0), vs(1)))
  }
}

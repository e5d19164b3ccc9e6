package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.kernels.Metrics

/** Array-based scalar function surface mirroring the reference's LIST API
  * (src/scalar_functions/metrics.cpp registration sets; Rust metrics.rs).
  * Null elements are mapped to NaN at the boundary and skipped pairwise,
  * matching the reference's validity-mask handling.
  *
  * Register with [[registerAll]] for SQL use; each function is also
  * registered under the `anofox_fcst_` alias prefix
  * (src/macros/ts_macros.cpp:2186-2196).
  */
object TsFunctions {

  private def arr(xs: Seq[java.lang.Double]): Array[Double] =
    xs.map(x => if (x == null) Double.NaN else x.doubleValue()).toArray

  val tsMae: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double]) => Metrics.mae(arr(a), arr(p)))
  val tsMse: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double]) => Metrics.mse(arr(a), arr(p)))
  val tsRmse: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double]) => Metrics.rmse(arr(a), arr(p)))
  val tsMape: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double]) => Metrics.mape(arr(a), arr(p)))
  val tsSmape: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double]) => Metrics.smape(arr(a), arr(p)))
  val tsMase: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double], train: Seq[java.lang.Double], season: Int) =>
      Metrics.mase(arr(a), arr(p), arr(train), season))
  val tsR2: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double]) => Metrics.r2(arr(a), arr(p)))
  val tsBias: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double]) => Metrics.bias(arr(a), arr(p)))
  val tsRmae: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p1: Seq[java.lang.Double], p2: Seq[java.lang.Double]) =>
      Metrics.rmae(arr(a), arr(p1), arr(p2)))
  val tsQuantileLoss: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], p: Seq[java.lang.Double], q: Double) =>
      Metrics.quantileLoss(arr(a), arr(p), q))
  val tsCoverage: UserDefinedFunction =
    udf((a: Seq[java.lang.Double], lo: Seq[java.lang.Double], hi: Seq[java.lang.Double]) =>
      Metrics.coverage(arr(a), arr(lo), arr(hi)))
  val tsMeanIntervalWidth: UserDefinedFunction =
    udf((lo: Seq[java.lang.Double], hi: Seq[java.lang.Double]) =>
      Metrics.meanIntervalWidth(arr(lo), arr(hi)))

  /** Register every scalar function (plus anofox_fcst_ aliases) for SQL use. */
  def registerAll(spark: SparkSession): Unit = {
    val fns: Seq[(String, UserDefinedFunction)] = Seq(
      "ts_mae" -> tsMae, "ts_mse" -> tsMse, "ts_rmse" -> tsRmse, "ts_mape" -> tsMape,
      "ts_smape" -> tsSmape, "ts_mase" -> tsMase, "ts_r2" -> tsR2, "ts_bias" -> tsBias,
      "ts_rmae" -> tsRmae, "ts_quantile_loss" -> tsQuantileLoss, "ts_coverage" -> tsCoverage,
      "ts_mean_interval_width" -> tsMeanIntervalWidth)
    fns.foreach { case (name, f) =>
      spark.udf.register(name, f)
      spark.udf.register("anofox_fcst_" + name.stripPrefix("ts_"), f)
    }
  }
}

package graft.agg

import org.apache.spark.sql.{Encoder, Encoders, SparkSession, types}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.kernels._

/** Typed `Aggregator`s mirroring the reference's 7 custom aggregate
  * functions (src/aggregate_functions, one .cpp each; SURVEY.md §2.12): buffer =
  * growing (ts, value, validity) arrays, merge = concat, finish = sort by
  * timestamp then kernel. Registered for SQL via `functions.udaf` under the
  * reference names (plus anofox_fcst_ aliases).
  *
  * SQL usage: `SELECT g, ts_forecast_agg(ts, y) FROM t GROUP BY g`
  * (method/horizon are fixed per registered instance — the Scala API takes
  * them as constructor parameters; dynamic lower_/upper_<pct> field names are
  * normalized to yhat_lower/yhat_upper, a documented deviation,
  * SURVEY.md §2.1).
  */
object Aggregators {

  final case class TsPoint(ts: java.sql.Timestamp, y: Option[Double])
  final case class SeriesBuf(ts: Array[Long], vs: Array[Double], nu: Array[Boolean])

  private val emptyBuf = SeriesBuf(Array.empty, Array.empty, Array.empty)

  private def append(b: SeriesBuf, p: TsPoint): SeriesBuf =
    if (p.ts == null) b
    else SeriesBuf(b.ts :+ (p.ts.getTime * 1000L),
      b.vs :+ p.y.getOrElse(Double.NaN),
      b.nu :+ p.y.isEmpty)

  private def merge(a: SeriesBuf, b: SeriesBuf): SeriesBuf =
    SeriesBuf(a.ts ++ b.ts, a.vs ++ b.vs, a.nu ++ b.nu)

  /** Sort the buffer by timestamp (stable). */
  private def sorted(b: SeriesBuf): SeriesBuf = {
    val order = b.ts.zipWithIndex.sortBy(_._1).map(_._2)
    SeriesBuf(order.map(b.ts), order.map(b.vs), order.map(b.nu))
  }

  abstract class SeriesAggregator[OUT: Encoder] extends Aggregator[TsPoint, SeriesBuf, OUT] {
    def zero: SeriesBuf = emptyBuf
    def reduce(b: SeriesBuf, p: TsPoint): SeriesBuf = append(b, p)
    def merge(a: SeriesBuf, b: SeriesBuf): SeriesBuf = Aggregators.merge(a, b)
    def bufferEncoder: Encoder[SeriesBuf] = Encoders.product[SeriesBuf]
    def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
    protected def sortedBuf(b: SeriesBuf): SeriesBuf = sorted(b)
  }

  // ------------------------------------------------------------ forecast

  /** The reference's exact STRUCT (ts_forecast_agg.cpp:69-83) at the
    * DEFAULT confidence level: the reference computes lower_<pct>/
    * upper_<pct> from the bind-time level (GetForecastAggResultType,
    * :69-82) but cannot read the level out of the runtime params MAP, so
    * its bound names are always the default's lower_90/upper_90 (:92-97);
    * the VALUES honor the `confidence_level` param. The Scala constructor
    * DOES know the level — [[forecastAggDynamic]] below emits the
    * properly suffixed names for non-default levels. */
  final case class ForecastAggOut(forecast_step: Seq[Int],
                                  forecast_timestamp: Seq[java.sql.Timestamp],
                                  point_forecast: Seq[Double],
                                  lower_90: Seq[Double], upper_90: Seq[Double],
                                  model_name: String, insample_fitted: Seq[Double],
                                  date_col_name: String, error_message: Option[String])

  /** ts_forecast_agg: STRUCT of LISTs incl. in-sample fitted values and
    * future timestamps from the median observed spacing (default 1 day). */
  final class ForecastAgg(method: String, horizon: Int, params: Map[String, String])
      extends SeriesAggregator[ForecastAggOut]()(Encoders.product[ForecastAggOut]) {
    // the agg's default confidence level is 0.90 (ts_forecast_agg.cpp:23)
    private val opts = Forecast.optionsFromParams(method, horizon,
      if (params.contains("confidence_level")) params
      else params + ("confidence_level" -> "0.90"))
      .copy(includeFitted = true)
    private def err(msg: String): ForecastAggOut =
      ForecastAggOut(Nil, Nil, Nil, Nil, Nil, method, Nil, "ds", Some(msg))
    def finish(b: SeriesBuf): ForecastAggOut = {
      if (b.ts.isEmpty) return err("empty series")
      val s = sortedBuf(b)
      try {
        val out = Forecast.forecast(s.vs, s.nu.map(!_), opts)
        // median spacing of the observed timestamps (ts_forecast_agg.cpp:330)
        val step: Long =
          if (s.ts.length < 2) 86400000000L
          else {
            val diffs = s.ts.sliding(2).map(w => w(1) - w(0)).toArray.sorted
            diffs(diffs.length / 2)
          }
        val last = s.ts.last
        val stamps = (1 to horizon).map(j =>
          new java.sql.Timestamp((last + step * j) / 1000L))
        ForecastAggOut((1 to horizon), stamps, out.point.toSeq,
          out.lower.toSeq, out.upper.toSeq, out.modelName,
          out.fitted.map(_.toSeq).getOrElse(Nil), "ds", None)
      } catch {
        case e: Forecast.FcError => err(e.getMessage)
      }
    }
  }

  /** The reference's dynamic interval field names: `lower_<pct>`/
    * `upper_<pct>` computed from the confidence level exactly as
    * GetConfidenceSuffix does (ts_forecast_agg.cpp:64-67 —
    * `round(level * 100)` then string-append). */
  def forecastAggSchema(confidenceLevel: Double): types.StructType = {
    import types._
    val pct = math.round(confidenceLevel * 100).toInt
    StructType(Seq(
      StructField("forecast_step", ArrayType(IntegerType)),
      StructField("forecast_timestamp", ArrayType(TimestampType)),
      StructField("point_forecast", ArrayType(DoubleType)),
      StructField(s"lower_$pct", ArrayType(DoubleType)),
      StructField(s"upper_$pct", ArrayType(DoubleType)),
      StructField("model_name", StringType),
      StructField("insample_fitted", ArrayType(DoubleType)),
      StructField("date_col_name", StringType),
      StructField("error_message", StringType)))
  }

  /** [[ForecastAgg]] with the interval struct fields named
    * `lower_<pct>`/`upper_<pct>` from the CONSTRUCTION-TIME confidence
    * level — the reference computes these names at bind time but cannot
    * see past the default there (ts_forecast_agg.cpp:92-97); the Scala
    * constructor can, so a 0.95-level instance correctly emits
    * `lower_95`/`upper_95`. Values are bit-identical to [[ForecastAgg]]'s
    * (same kernel call, same buffer); only the output schema differs —
    * a runtime `Encoders.row` schema instead of the case-class encoder. */
  final class ForecastAggDynamic(method: String, horizon: Int,
                                 params: Map[String, String])
      extends Aggregator[TsPoint, SeriesBuf, org.apache.spark.sql.Row] {
    private val inner = new ForecastAgg(method, horizon, params)
    private val level = params.getOrElse("confidence_level", "0.90").toDouble
    def zero: SeriesBuf = emptyBuf
    def reduce(b: SeriesBuf, p: TsPoint): SeriesBuf = append(b, p)
    def merge(a: SeriesBuf, b: SeriesBuf): SeriesBuf = Aggregators.merge(a, b)
    def bufferEncoder: Encoder[SeriesBuf] = Encoders.product[SeriesBuf]
    def outputEncoder: Encoder[org.apache.spark.sql.Row] =
      Encoders.row(forecastAggSchema(level))
    def finish(b: SeriesBuf): org.apache.spark.sql.Row = {
      val o = inner.finish(b)
      org.apache.spark.sql.Row(o.forecast_step, o.forecast_timestamp,
        o.point_forecast, o.lower_90, o.upper_90, o.model_name,
        o.insample_fitted, o.date_col_name, o.error_message.orNull)
    }
  }

  // ------------------------------------------------------------ stats / quality

  final class StatsAgg extends SeriesAggregator[Stats.TsStats]()(Encoders.product[Stats.TsStats]) {
    def finish(b: SeriesBuf): Stats.TsStats = {
      val s = sortedBuf(b)
      Stats.computeWithDates(s.vs, s.nu.map(!_), s.ts, graft.types.Frequency.parse("1d"))
    }
  }

  final class DataQualityAgg
      extends SeriesAggregator[Quality.DataQuality]()(Encoders.product[Quality.DataQuality]) {
    def finish(b: SeriesBuf): Quality.DataQuality = {
      val s = sortedBuf(b)
      Quality.compute(s.vs, s.nu.map(!_), Some(s.ts))
    }
  }

  // ------------------------------------------------------------ features

  final case class FeaturesAggOut(names: Seq[String], values: Seq[Double])

  final class FeaturesAgg(features: Seq[String])
      extends SeriesAggregator[FeaturesAggOut]()(Encoders.product[FeaturesAggOut]) {
    def finish(b: SeriesBuf): FeaturesAggOut = {
      val s = sortedBuf(b)
      val clean = Imputation.fillInterpolate(s.vs, s.nu.map(!_))
      if (clean.isEmpty || clean.exists(_.isNaN)) FeaturesAggOut(features, features.map(_ => Double.NaN))
      else {
        val all = Features.extract(clean)
        FeaturesAggOut(features, features.map(all(_)))
      }
    }
  }

  // ------------------------------------------------------------ changepoints

  final case class ChangepointsAggOut(is_changepoint: Seq[Boolean],
                                      changepoint_probability: Seq[Double],
                                      changepoints: Seq[Int])

  final class ChangepointsAgg(hazardLambda: Double)
      extends SeriesAggregator[ChangepointsAggOut]()(Encoders.product[ChangepointsAggOut]) {
    def finish(b: SeriesBuf): ChangepointsAggOut = {
      val s = sortedBuf(b)
      val clean = Imputation.fillInterpolate(s.vs, s.nu.map(!_))
      if (clean.length < 3 || clean.exists(_.isNaN)) ChangepointsAggOut(Nil, Nil, Nil)
      else {
        val r = Changepoint.bocpd(clean, hazardLambda)
        ChangepointsAggOut(r.isChangepoint.toSeq, r.probability.toSeq, r.changepoints.toSeq)
      }
    }
  }

  // ------------------------------------------------------------ periods

  final case class PeriodsAggOut(primary_period: Double, periods: Seq[Double],
                                 confidences: Seq[Double], method: String)

  final class DetectPeriodsAgg(method: String)
      extends SeriesAggregator[PeriodsAggOut]()(Encoders.product[PeriodsAggOut]) {
    def finish(b: SeriesBuf): PeriodsAggOut = {
      val s = sortedBuf(b)
      val clean = Imputation.fillInterpolate(s.vs, s.nu.map(!_))
      if (clean.length < 4 || clean.exists(_.isNaN)) PeriodsAggOut(0.0, Nil, Nil, method)
      else {
        val r = Periods.detectPeriods(clean, method)
        PeriodsAggOut(r.primaryPeriod, r.periods.map(_.period), r.periods.map(_.confidence),
          r.method)
      }
    }
  }

  // ------------------------------------------------------------ classify seasonality

  final class ClassifySeasonalityAgg(period: Int)
      extends SeriesAggregator[SeasonalityExt.Classification]()(
        Encoders.product[SeasonalityExt.Classification]) {
    def finish(b: SeriesBuf): SeasonalityExt.Classification = {
      val s = sortedBuf(b)
      val clean = Imputation.fillInterpolate(s.vs, s.nu.map(!_))
      if (clean.length < 2 * period || clean.exists(_.isNaN))
        SeasonalityExt.Classification("non_seasonal", "non_seasonal", has_stable_timing = false,
          Double.NaN, Double.NaN, is_seasonal = false, Array.empty, Array.empty)
      else SeasonalityExt.classify(clean, period)
    }
  }

  /** Register every aggregate for SQL use under the reference names
    * (default-configured instances; Scala callers parameterize directly). */
  def registerAll(spark: SparkSession): Unit = {
    def reg[OUT](name: String, a: Aggregator[TsPoint, SeriesBuf, OUT]): Unit = {
      spark.udf.register(name, udaf(a, Encoders.product[TsPoint]))
      spark.udf.register("anofox_fcst_" + name.stripPrefix("ts_"),
        udaf(a, Encoders.product[TsPoint]))
    }
    reg("ts_forecast_agg", new ForecastAgg("AutoETS", 12, Map.empty))
    reg("ts_stats_agg", new StatsAgg)
    reg("ts_data_quality_agg", new DataQualityAgg)
    reg("ts_features_agg", new FeaturesAgg(Features.allNames))
    reg("ts_detect_changepoints_agg", new ChangepointsAgg(250.0))
    reg("ts_detect_periods_agg", new DetectPeriodsAgg("fft"))
    reg("ts_classify_seasonality_agg", new ClassifySeasonalityAgg(7))
  }
}

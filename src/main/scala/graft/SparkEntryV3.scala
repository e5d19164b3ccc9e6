package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{TsDecompositionOp, TsFeaturesOp, TsForecastOp, TsPrep}

/** Third batch: decomposition/detrend/periods/peaks, features, the remaining
  * model zoo (ARIMA/AutoARIMA, MSTL/MFLES/TBATS, Laplace, intermittent
  * variants), and fill-forward. */
object SparkEntryV3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  private def exactSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(round(c, 6).cast(DecimalType(28, 6))).cast(DoubleType)

  private def dailyEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type").as("g"), col("ts").cast(DateType).as("ds"))
      .agg(exactSum(col("value")).as("y"))

  private def purchaseSeries(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("g"), col("ts").cast(DateType).as("ds"))
      .agg(exactSum(col("value")).as("y"))

  private val ExactSumY = "CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)"
  private val SeriesCte =
    s"WITH s AS (SELECT event_type AS g, CAST(ts AS DATE) AS ds, $ExactSumY AS y FROM events GROUP BY 1, 2)"
  private val PurchaseCte =
    s"WITH p AS (SELECT user_id AS g, CAST(ts AS DATE) AS ds, $ExactSumY AS y FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)"

  /** Same rounding contract as SparkEntry.roundFc: yhat 6 decimals, CI 4. */
  private def roundFc(df: DataFrame): DataFrame =
    df.select(col("g"), col("forecast_step"), col("ds"),
      round(col("yhat"), 6).as("yhat"),
      round(col("yhat_lower"), 4).as("yhat_lower"),
      round(col("yhat_upper"), 4).as("yhat_upper"),
      col("model_name"))

  /** Planted pure sinusoid of period 8 (64 points per group, one per distinct
    * order date): a correct period detector must report 8 — the oracle is the
    * construction, not the implementation. 64 samples put frequency 1/8 on an
    * exact DFT bin. */
  private def plantedSeries(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("ds"))
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("g"), col("o_orderdate").cast(DateType).as("ds"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_pos", row_number().over(w))
      .filter(col("_pos") <= 64)
      .select(col("g"), col("ds"),
        (lit(10.0) + sin(col("_pos") * lit(2.0 * math.Pi / 8.0))).as("y"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ detrend (oracle: linear)
    "ts_detrend_linear_by" -> ((s, dir) =>
      TsDecompositionOp.detrendBy(dailyEvents(s, dir), "g", "ds", "y", "linear")
        .select(col("g"), col("ds"), round(col("y"), 6).as("y"),
          round(col("trend"), 6).as("trend"),
          round(col("detrended"), 6).as("detrended"), col("method"))),
    // (ts_detrend_auto_by moved to SparkEntryV10: exact-line oracle)
    // ------------------------------------------------ decomposition / periods / peaks
    // MSTL is oracle-checked through its reconstruction invariant:
    // trend + seasonal + remainder must reproduce y (decomposition.rs contract)
    "ts_mstl_decomposition_by" -> ((s, dir) =>
      TsDecompositionOp.mstlDecompositionBy(dailyEvents(s, dir), "g", "ds", "y", Seq(7))
        .select(col("g"), col("ds"), round(col("y"), 6).as("y"),
          round(col("trend") + col("seasonal") + col("remainder"), 6).as("recon"))),
    // period detectors run on the planted period-8 sinusoid: expected output
    // is known from the construction (theory), so the oracle is honest
    "ts_detect_periods_fft_by" -> ((s, dir) =>
      TsDecompositionOp.detectPeriodsBy(plantedSeries(s, dir), "g", "ds", "y", "fft",
        minConfidence = Some(0.0))
        .select(col("g"), col("primary_period"), col("method")).distinct()),
    "ts_detect_periods_acf_by" -> ((s, dir) =>
      TsDecompositionOp.detectPeriodsBy(plantedSeries(s, dir), "g", "ds", "y", "acf",
        minConfidence = Some(0.0))
        .select(col("g"), col("primary_period"), col("method")).distinct()),
    "ts_detect_periods_autoperiod_by" -> ((s, dir) =>
      TsDecompositionOp.detectPeriodsBy(plantedSeries(s, dir), "g", "ds", "y", "autoperiod",
        minConfidence = Some(0.0))
        .select(col("g"), col("primary_period"), col("method")).distinct()),
    // (ts_detect_peaks_by / ts_analyze_peak_timing_by moved to SparkEntryV9:
    // planted-construction oracles)
    // ------------------------------------------------ features
    "ts_features_by" -> ((s, dir) =>
      TsFeaturesOp.featuresBy(dailyEvents(s, dir), "g", "ds", "y",
        Seq("length", "sum", "mean", "minimum", "maximum", "range", "median",
          "quantile_0.25", "quantile_0.75", "count_above_mean", "count_below_mean",
          "first_value", "last_value", "mean_change", "mean_abs_change",
          "absolute_sum_of_changes", "count_unique"))
        .select(col("g"), col("length"), round(col("sum"), 4).as("sum"),
          round(col("mean"), 6).as("mean"), round(col("minimum"), 6).as("minimum"),
          round(col("maximum"), 6).as("maximum"), round(col("range"), 6).as("range"),
          round(col("median"), 6).as("median"),
          round(col("`quantile_0.25`"), 6).as("q25"),
          round(col("`quantile_0.75`"), 6).as("q75"),
          col("count_above_mean"), col("count_below_mean"),
          round(col("first_value"), 6).as("first_value"),
          round(col("last_value"), 6).as("last_value"),
          round(col("mean_change"), 6).as("mean_change"),
          round(col("mean_abs_change"), 6).as("mean_abs_change"),
          round(col("absolute_sum_of_changes"), 4).as("absolute_sum_of_changes"),
          col("count_unique"))),
    "ts_features_full_by" -> ((s, dir) =>
      TsFeaturesOp.featuresBy(dailyEvents(s, dir), "g", "ds", "y")),
    // ------------------------------------------------ fill forward (oracle)
    "ts_fill_forward_by" -> ((s, dir) =>
      TsPrep.fillForwardBy(purchaseSeries(s, dir), "g", "ds", "y", "2024-02-10", "1d")
        .select(col("g"), col("ds"), round(col("y"), 6).as("y"))),
    // (remaining model zoo — ARIMA/AutoARIMA/MSTL/MFLES/TBATS/Laplace/theta
    // variants/CrostonOptimized/ADIDA/IMAPA/SeasonalESOptimized — moved to
    // SparkEntryV11: planted-construction oracles)
    // fixed-parameter SBA (alpha = 0.1 + bias correction) → oracle-checked
    "fc_croston_sba" -> ((s, dir) => roundFc(TsForecastOp.forecastBy(
      dailyEvents(s, dir), "g", "ds", "y", "CrostonSBA", 7, "1d"))),
    // single-series API — arrays posexploded to scalar rows (the driver's
    // sort-then-hash cannot order LIST columns)
    "ts_forecast_single" -> ((s, dir) =>
      // null-y days are dropped on BOTH sides: the kernel would interpolate
      // them while the oracle's stddev_pop/arg_max would skip them, so the
      // histories must agree before either engine sees a null
      TsForecastOp.forecastSingle(
        dailyEvents(s, dir).filter(col("g") === "click" && col("y").isNotNull),
        "ds", "y", "Naive", 5)
        .select(col("model_name"),
          posexplode(arrays_zip(col("point_forecasts"), col("lower_bounds"),
            col("upper_bounds"))).as(Seq("_pos", "_z")))
        .select((col("_pos") + 1).cast(LongType).as("h"),
          round(col("_z.point_forecasts"), 6).as("yhat"),
          round(col("_z.lower_bounds"), 4).as("yhat_lower"),
          round(col("_z.upper_bounds"), 4).as("yhat_upper"),
          col("model_name"))),
  )

  def oracleSql: Map[String, String] = Map(
    // MSTL reconstruction invariant: the decomposition must sum back to y
    "ts_mstl_decomposition_by" -> (SeriesCte +
      """
        |SELECT g, ds, round(y, 6) AS y, round(y, 6) AS recon FROM s""".stripMargin),
    // planted period-8 sinusoid (64 samples/group): any correct detector
    // reports period 8; one distinct row per group
    "ts_detect_periods_fft_by" ->
      """SELECT DISTINCT o_orderpriority AS g, CAST(8.0 AS DOUBLE) AS primary_period,
        | 'fft' AS method FROM orders""".stripMargin,
    "ts_detect_periods_acf_by" ->
      """SELECT DISTINCT o_orderpriority AS g, CAST(8.0 AS DOUBLE) AS primary_period,
        | 'acf' AS method FROM orders""".stripMargin,
    "ts_detect_periods_autoperiod_by" ->
      """SELECT DISTINCT o_orderpriority AS g, CAST(8.0 AS DOUBLE) AS primary_period,
        | 'autoperiod' AS method FROM orders""".stripMargin,
    // CrostonSBA = CrostonClassic(alpha=0.1) with the 1 - alpha/2 correction
    "fc_croston_sba" -> (SeriesCte +
      """, b AS (SELECT g, ds, y, row_number() OVER (PARTITION BY g ORDER BY ds) - 1 AS pos
        |        FROM s),
        |nz AS (SELECT g, y, pos, lag(pos) OVER (PARTITION BY g ORDER BY pos) AS prevpos
        |       FROM b WHERE y <> 0),
        |agg AS (SELECT g,
        |  list_reduce(list(y ORDER BY pos),
        |    (acc, x) -> CAST(0.1 AS DOUBLE) * x + (1 - CAST(0.1 AS DOUBLE)) * acc) AS zhat,
        |  list_reduce(list(CAST(CASE WHEN prevpos IS NULL THEN pos + 1 ELSE pos - prevpos END AS DOUBLE) ORDER BY pos),
        |    (acc, x) -> CAST(0.1 AS DOUBLE) * x + (1 - CAST(0.1 AS DOUBLE)) * acc) AS phat
        |  FROM nz GROUP BY g),
        |a AS (SELECT s.g, max(s.ds) AS last_ds, stddev_pop(s.y) AS sigma,
        |             max((CASE WHEN agg.phat = 0 THEN 0.0 ELSE agg.zhat / agg.phat END)
        |                 * (1 - CAST(0.1 AS DOUBLE) / 2)) AS fc
        |      FROM s LEFT JOIN agg ON s.g = agg.g GROUP BY s.g)
        |SELECT g, CAST(step AS INT) AS forecast_step, last_ds + CAST(step AS INT) AS ds,
        | round(coalesce(fc, 0.0), 6) AS yhat,
        | round(coalesce(fc, 0.0) - 1.96 * sigma * sqrt(step), 4) AS yhat_lower,
        | round(coalesce(fc, 0.0) + 1.96 * sigma * sqrt(step), 4) AS yhat_upper,
        | 'CrostonSBA' AS model_name
        |FROM a, (SELECT unnest(range(1, 8)) AS step) st""".stripMargin),
    "ts_detrend_linear_by" -> (SeriesCte +
      """, b AS (SELECT g, ds, y, row_number() OVER (PARTITION BY g ORDER BY ds) - 1 AS t
        |         FROM s),
        |m AS (SELECT g, avg(y) AS ym, avg(t) AS tm FROM b GROUP BY g),
        |reg AS (SELECT b.g,
        |          sum((b.t - m.tm) * (b.y - m.ym)) / sum((b.t - m.tm) * (b.t - m.tm)) AS slope,
        |          max(m.ym) AS ym, max(m.tm) AS tm
        |        FROM b JOIN m ON b.g = m.g GROUP BY b.g)
        |SELECT b.g, b.ds, round(b.y, 6) AS y,
        |  round(r.ym + r.slope * (b.t - r.tm), 6) AS trend,
        |  round(b.y - (r.ym + r.slope * (b.t - r.tm)), 6) AS detrended,
        |  'linear' AS method
        |FROM b JOIN reg r ON b.g = r.g""".stripMargin),
    "ts_features_by" -> (SeriesCte +
      """, w AS (SELECT g, y, lag(y) OVER (PARTITION BY g ORDER BY ds) AS prev,
        |         first_value(y) OVER (PARTITION BY g ORDER BY ds
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fv,
        |         last_value(y) OVER (PARTITION BY g ORDER BY ds
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
        |       FROM s),
        |m AS (SELECT g, avg(y) AS mean FROM s GROUP BY g)
        |SELECT w.g, CAST(count(*) AS DOUBLE) AS length,
        |  round(sum(w.y), 4) AS sum, round(avg(w.y), 6) AS mean,
        |  round(min(w.y), 6) AS minimum, round(max(w.y), 6) AS maximum,
        |  round(max(w.y) - min(w.y), 6) AS range,
        |  round(quantile_cont(w.y, 0.5), 6) AS median,
        |  round(quantile_cont(w.y, 0.25), 6) AS q25,
        |  round(quantile_cont(w.y, 0.75), 6) AS q75,
        |  CAST(sum(CASE WHEN w.y > m.mean THEN 1 ELSE 0 END) AS DOUBLE) AS count_above_mean,
        |  CAST(sum(CASE WHEN w.y < m.mean THEN 1 ELSE 0 END) AS DOUBLE) AS count_below_mean,
        |  round(max(w.fv), 6) AS first_value, round(max(w.lv), 6) AS last_value,
        |  round((max(w.lv) - max(w.fv)) / (count(*) - 1), 6) AS mean_change,
        |  round(avg(abs(w.y - w.prev)), 6) AS mean_abs_change,
        |  round(sum(CASE WHEN w.prev IS NOT NULL THEN abs(w.y - w.prev) ELSE 0 END), 4)
        |    AS absolute_sum_of_changes,
        |  CAST(count(DISTINCT w.y) AS DOUBLE) AS count_unique
        |FROM w JOIN m ON w.g = m.g
        |GROUP BY w.g""".stripMargin),
    "ts_fill_forward_by" -> (PurchaseCte +
      """, mx AS (SELECT g, max(ds) AS last_ds FROM p GROUP BY g),
        |ext AS (
        |  SELECT g, CAST(unnest(generate_series(CAST(last_ds + 1 AS TIMESTAMP),
        |           TIMESTAMP '2024-02-10 00:00:00', INTERVAL 1 DAY)) AS DATE) AS ds,
        |         CAST(NULL AS DOUBLE) AS y
        |  FROM mx WHERE last_ds < DATE '2024-02-10')
        |SELECT g, ds, round(y, 6) AS y FROM p
        |UNION ALL SELECT g, ds, y FROM ext""".stripMargin),
    // Naive single-series: yhat = last value, bounds = yhat ± 1.96·σ_pop·√h
    // (kernels/Forecast.scala:244-262). σ rounds at 4 decimals (cross-engine
    // stddev differs ~1e-14).
    "ts_forecast_single" -> (SeriesCte +
      """, c AS (SELECT ds, y FROM s WHERE g = 'click' AND y IS NOT NULL),
        |p AS (SELECT arg_max(y, ds) AS lastv, stddev_pop(y) AS se FROM c)
        |SELECT CAST(h AS BIGINT) AS h, round(lastv, 6) AS yhat,
        |  round(lastv - 1.96 * se * sqrt(h), 4) AS yhat_lower,
        |  round(lastv + 1.96 * se * sqrt(h), 4) AS yhat_upper,
        |  'Naive' AS model_name
        |FROM p, (SELECT unnest(range(1, 6)) AS h) hs""".stripMargin),
  )
}

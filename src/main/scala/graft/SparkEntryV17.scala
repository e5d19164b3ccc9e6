package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Seventeenth batch: SQL-string table-macro twins for the round-6 TVF
  * surface. Each row reaches an ALREADY-ORACLE-CHECKED plan through
  * `spark.sql("SELECT * FROM <macro>(…)")` instead of the Scala API and
  * shares that row's oracle byte-for-byte — a macro-expansion bug in the new
  * names (cv family, peaks, fill-forward, the `anofox_fcst_` alias layer,
  * ts_macros.cpp:2131-2196) is therefore a hash mismatch, not a smoke-test
  * miss. */
object SparkEntryV17 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  private def exactSum(c: org.apache.spark.sql.Column) =
    sum(round(c, 6).cast(DecimalType(28, 6))).cast(DoubleType)

  private def dailyEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type").as("g"), col("ts").cast(DateType).as("ds"))
      .agg(exactSum(col("value")).as("y"))

  private def purchaseSeries(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("g"), col("ts").cast(DateType).as("ds"))
      .agg(exactSum(col("value")).as("y"))

  /** Planted spike series (SparkEntryV9's construction, shared oracle). */
  private def spikeSeries(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("ds"))
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("g"), col("o_orderdate").cast(DateType).as("ds"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_pos", row_number().over(w) - 1)
      .filter(col("_pos") < 64)
      .select(col("g"), col("ds"),
        when(col("_pos") % 4 === 1, 5.0).otherwise(0.0).as("y"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_macro_cv_split_by" -> ((s, dir) => {
      graft.sql.Register.registerAll(s)
      dailyEvents(s, dir).createOrReplaceTempView("_v17_daily")
      s.sql("SELECT * FROM ts_cv_split_by('_v17_daily', g, ds, y, " +
          "array('2024-01-15', '2024-01-22'), 5)")
        .select(col("g"), col("ds"), round(col("y"), 6).as("y"),
          col("fold_id"), col("split"))
    }),
    "sql_macro_fill_forward_by" -> ((s, dir) => {
      graft.sql.Register.registerAll(s)
      purchaseSeries(s, dir).createOrReplaceTempView("_v17_purchases")
      s.sql("SELECT * FROM ts_fill_forward_by('_v17_purchases', g, ds, y, " +
          "'2024-02-10', '1d')")
        .select(col("g"), col("ds"), round(col("y"), 6).as("y"))
    }),
    "sql_macro_detect_peaks_by" -> ((s, dir) => {
      graft.sql.Register.registerAll(s)
      spikeSeries(s, dir).createOrReplaceTempView("_v17_spikes")
      s.sql("SELECT * FROM ts_detect_peaks_by('_v17_spikes', g, ds, y)")
        .select(col("g"), col("peak_index"), col("ds"),
          round(col("peak_value"), 6).as("peak_value"),
          round(col("prominence"), 6).as("prominence"))
    }),
    // the alias layer: anofox_fcst_<name> must expand to the same plan as
    // <name> (ts_macros.cpp:2186-2196)
    "sql_macro_alias_fill_gaps_by" -> ((s, dir) => {
      graft.sql.Register.registerAll(s)
      purchaseSeries(s, dir).createOrReplaceTempView("_v17_purchases_a")
      s.sql("SELECT * FROM anofox_fcst_ts_fill_gaps_by('_v17_purchases_a', g, ds, y, '1d')")
        .select(col("g"), col("ds"), round(col("y"), 6).as("y"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "sql_macro_cv_split_by" -> SparkEntryV4.oracleSql("ts_cv_split_by"),
    "sql_macro_fill_forward_by" -> SparkEntryV3.oracleSql("ts_fill_forward_by"),
    "sql_macro_detect_peaks_by" -> SparkEntryV9.oracleSql("ts_detect_peaks_by"),
    "sql_macro_alias_fill_gaps_by" -> SparkEntry.fillGapsOracle,
  )
}

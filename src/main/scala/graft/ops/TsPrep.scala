package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.{FreqType, Frequency}

/** Data-preparation operators: pure relational rewrites of the reference's
  * table macros (src/macros/ts_macros.cpp:174-420, :944-1120). All preserve
  * the caller's column names; keep-list filters use left-semi joins (the
  * macros' `IN (subquery)` form), which Catalyst/AQE turns into broadcast
  * semi-joins when the group list is small.
  */
object TsPrep {

  private def keepGroups(df: DataFrame, groupCol: String, keep: DataFrame): DataFrame =
    df.join(keep.select(col(groupCol)), Seq(groupCol), "left_semi")

  /** ts_drop_constant_by (ts_macros.cpp:174): keep groups with
    * MIN != MAX, or all-null values (MIN/MAX null). */
  def dropConstantBy(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val keep = df.groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("_mn"), max(col(valueCol)).as("_mx"))
      .filter(col("_mn") =!= col("_mx") || col("_mn").isNull || col("_mx").isNull)
    keepGroups(df, groupCol, keep)
  }

  /** ts_drop_short_by (ts_macros.cpp:191): keep groups with COUNT(*) >= minLength. */
  def dropShortBy(df: DataFrame, groupCol: String, minLength: Long): DataFrame = {
    val keep = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minLength)
    keepGroups(df, groupCol, keep)
  }

  private def nonZeroDate(dsCol: String, valueCol: String): Column =
    when(col(valueCol) =!= 0 && col(valueCol).isNotNull, col(dsCol))

  /** ts_drop_leading_zeros_by (ts_macros.cpp:208). */
  def dropLeadingZerosBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    df.withColumn("_first_nz", min(nonZeroDate(dsCol, valueCol)).over(w))
      .filter(col(dsCol) >= col("_first_nz"))
      .drop("_first_nz")
  }

  /** ts_drop_trailing_zeros_by (ts_macros.cpp:225). */
  def dropTrailingZerosBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    df.withColumn("_last_nz", max(nonZeroDate(dsCol, valueCol)).over(w))
      .filter(col(dsCol) <= col("_last_nz"))
      .drop("_last_nz")
  }

  /** ts_drop_edge_zeros_by (ts_macros.cpp:242). */
  def dropEdgeZerosBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    df.withColumn("_first_nz", min(nonZeroDate(dsCol, valueCol)).over(w))
      .withColumn("_last_nz", max(nonZeroDate(dsCol, valueCol)).over(w))
      .filter(col(dsCol) >= col("_first_nz") && col(dsCol) <= col("_last_nz"))
      .drop("_first_nz", "_last_nz")
  }

  /** ts_drop_gappy_by (ts_macros.cpp:383): keep groups whose null ratio <= maxGapRatio. */
  def dropGappyBy(df: DataFrame, groupCol: String, valueCol: String, maxGapRatio: Double): DataFrame = {
    val keep = df.groupBy(col(groupCol))
      .agg((sum(when(col(valueCol).isNull, 1).otherwise(0)).cast(DoubleType) /
        count(lit(1))).as("_ratio"))
      .filter(col("_ratio") <= maxGapRatio)
    keepGroups(df, groupCol, keep)
  }

  /** ts_drop_zeros_by (ts_macros.cpp:400): keep groups with any non-zero value. */
  def dropZerosBy(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val keep = df.groupBy(col(groupCol))
      .agg(sum(when(col(valueCol) =!= 0 && col(valueCol).isNotNull, 1).otherwise(0)).as("_nz"))
      .filter(col("_nz") > 0)
    keepGroups(df, groupCol, keep)
  }

  /** ts_fill_nulls_const_by (ts_macros.cpp:261): adds `filled_value`. */
  def fillNullsConstBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String,
                       fillValue: Double): DataFrame =
    df.withColumn("filled_value", coalesce(col(valueCol).cast(DoubleType), lit(fillValue)))

  /** ts_fill_nulls_forward_by (ts_macros.cpp:274): LOCF into `filled_value`. */
  def fillNullsForwardBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("filled_value", last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** ts_fill_nulls_backward_by (ts_macros.cpp:290): NOCB into `filled_value`. */
  def fillNullsBackwardBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dsCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn("filled_value", first(col(valueCol), ignoreNulls = true).over(w))
  }

  /** ts_fill_nulls_mean_by (ts_macros.cpp:306): group mean into `filled_value`. */
  def fillNullsMeanBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    df.withColumn("filled_value", coalesce(col(valueCol), avg(col(valueCol)).over(w)))
  }

  /** ts_diff_by (ts_macros.cpp:323): single lag of order k (not iterated
    * differencing); returns (group, ds, diff_value). */
  def diffBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String,
             diffOrder: Int = 1): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dsCol))
    df.select(col(groupCol), col(dsCol),
      (col(valueCol) - lag(col(valueCol), diffOrder).over(w)).as("diff_value"))
  }

  /** ts_fill_gaps_by (ts_macros.cpp:348 → gaps.rs:78-259): insert missing
    * stamps between consecutive observations. Fixed frequencies insert
    * `prev + k·freq` for k in 1..floor(gap/freq)-1 (observed off-grid points
    * are kept); calendar frequencies insert month/quarter/year starts.
    * Output schema: (group, ds, value) with NULL values for inserted rows.
    *
    * Distributed shape: a window `lag` + per-row stamp generation — no
    * per-group materialization, so it scales to arbitrarily long series.
    */
  def fillGapsBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String,
                 frequency: String): DataFrame = {
    val freq = Frequency.parse(frequency)
    val dsType = df.schema(dsCol).dataType
    val base = df.select(col(groupCol), col(dsCol), col(valueCol))
      .filter(col(dsCol).isNotNull)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dsCol))
    val withPrev = base
      .withColumn("_t", Series.toMicros(col(dsCol), dsType))
      .withColumn("_prev", lag(col("_t"), 1).over(w))

    val stamps: Column = freq.tpe match {
      case FreqType.Fixed =>
        val f = if (Series.isIntegerDs(dsType) && freq.isRaw) freq.n else freq.micros
        val steps = floor((col("_t") - col("_prev")) / lit(f))
        when(col("_prev").isNotNull && steps > 1,
          transform(sequence(lit(1L), steps - 1), k => col("_prev") + k * lit(f)))
          .otherwise(array().cast(ArrayType(LongType)))
      case _ =>
        val gapStamps = udf((prev: java.lang.Long, curr: java.lang.Long) =>
          if (prev == null || curr == null) Array.empty[Long]
          else calendarGapStamps(prev, curr, freq))
        gapStamps(col("_prev"), col("_t"))
    }

    val gapsRows = withPrev
      .select(col(groupCol), explode(stamps).as("_gap_t"))
      .select(col(groupCol),
        Series.fromMicros(col("_gap_t"), dsType).as(dsCol),
        lit(null).cast(base.schema(valueCol).dataType).as(valueCol))

    base.unionByName(gapsRows)
  }

  /** Calendar gap stamps between two observations: month/quarter/year starts
    * strictly between prev and curr periods (gaps.rs:146-259). */
  private[ops] def calendarGapStamps(prev: Long, curr: Long, freq: Frequency): Array[Long] = {
    import java.time.{Instant, LocalDateTime, ZoneOffset}
    def toDt(m: Long) = LocalDateTime.ofInstant(
      Instant.ofEpochSecond(Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L), ZoneOffset.UTC)
    val a = toDt(prev); val b = toDt(curr)
    val unitMonths = freq.tpe match {
      case FreqType.Monthly => 1
      case FreqType.Quarterly => 3
      case FreqType.Yearly => 12
      case FreqType.Fixed => return Array.empty
    }
    def periodIndex(d: LocalDateTime): Int = freq.tpe match {
      case FreqType.Monthly => d.getYear * 12 + (d.getMonthValue - 1)
      case FreqType.Quarterly => d.getYear * 4 + (d.getMonthValue - 1) / 3
      case FreqType.Yearly => d.getYear
      case FreqType.Fixed => 0
    }
    val diff = periodIndex(b) - periodIndex(a)
    if (diff <= 1) return Array.empty
    val startMonth = freq.tpe match {
      case FreqType.Monthly => a.getMonthValue
      case FreqType.Quarterly => ((a.getMonthValue - 1) / 3) * 3 + 1
      case FreqType.Yearly => 1
      case FreqType.Fixed => 1
    }
    val periodStart = LocalDateTime.of(a.getYear, startMonth, 1, 0, 0, 0)
    (1 until diff).map { step =>
      val d = periodStart.plusMonths(step.toLong * unitMonths)
      d.toEpochSecond(ZoneOffset.UTC) * 1000000L
    }.toArray
  }

  /** ts_fill_forward_by (ts_macros.cpp:369 → gaps.rs:282): extend each group
    * beyond its max date to `targetDate` on the frequency grid, with NULL
    * values for the appended rows (fixed: last + k·freq; calendar: period
    * starts after the last observation). */
  def fillForwardBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String,
                    targetDate: String, frequency: String): DataFrame = {
    val freq = Frequency.parse(frequency)
    val dsType = df.schema(dsCol).dataType
    val base = df.select(col(groupCol), col(dsCol), col(valueCol))
      .filter(col(dsCol).isNotNull)
    val targetMicros: Long = {
      val inst = java.time.LocalDateTime.parse(targetDate.replace(" ", "T") match {
        case s if s.length == 10 => s + "T00:00:00"
        case s => s
      }).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
      inst
    }
    val lastPerGroup = base
      .groupBy(col(groupCol))
      .agg(max(Series.toMicros(col(dsCol), dsType)).as("_last"))
    val extendStamps = udf((last: java.lang.Long) => {
      if (last == null) Array.empty[Long]
      else {
        val buf = scala.collection.mutable.ArrayBuffer[Long]()
        freq.tpe match {
          case FreqType.Fixed =>
            val f = if (Series.isIntegerDs(dsType) && freq.isRaw) freq.n else freq.micros
            var cur = last + f
            while (cur <= targetMicros) { buf += cur; cur += f }
          case _ =>
            var step = 1
            var done = false
            while (!done) {
              val stamps = calendarForwardStamp(last, step, freq)
              if (stamps > targetMicros || step > 1000000) done = true
              else { if (stamps > last) buf += stamps; step += 1 }
            }
        }
        buf.toArray
      }
    })
    val appended = lastPerGroup
      .select(col(groupCol), explode(extendStamps(col("_last"))).as("_new_t"))
      .select(col(groupCol),
        Series.fromMicros(col("_new_t"), dsType).as(dsCol),
        lit(null).cast(base.schema(valueCol).dataType).as(valueCol))
    base.unionByName(appended)
  }

  /** Period-start `step` periods after the period containing `last`
    * (gaps.rs fill_forward monthly/quarterly/yearly arms). */
  private[ops] def calendarForwardStamp(last: Long, step: Int, freq: Frequency): Long = {
    import java.time.{Instant, LocalDateTime, ZoneOffset}
    val a = LocalDateTime.ofInstant(
      Instant.ofEpochSecond(Math.floorDiv(last, 1000000L), Math.floorMod(last, 1000000L) * 1000L), ZoneOffset.UTC)
    val (startMonth, unitMonths) = freq.tpe match {
      case FreqType.Monthly => (a.getMonthValue, 1)
      case FreqType.Quarterly => (((a.getMonthValue - 1) / 3) * 3 + 1, 3)
      case FreqType.Yearly => (1, 12)
      case FreqType.Fixed => return Long.MaxValue
    }
    val periodStart = LocalDateTime.of(a.getYear, startMonth, 1, 0, 0, 0)
    periodStart.plusMonths(step.toLong * unitMonths).toEpochSecond(ZoneOffset.UTC) * 1000000L
  }

  /** ts_mark_unknown_by (ts_macros.cpp:944): adds `is_unknown` (ds > cutoff,
    * second-truncated) and per-group `last_known_date` (max ds <= cutoff). */
  def markUnknownBy(df: DataFrame, groupCol: String, dsCol: String, cutoffDate: String): DataFrame = {
    val dt = date_trunc("second", col(dsCol).cast(TimestampType))
    val cutoff = date_trunc("second", lit(cutoffDate).cast(TimestampType))
    val w = Window.partitionBy(col(groupCol))
    df.withColumn("_dt", dt)
      .withColumn("last_known_date", max(when(col("_dt") <= cutoff, col("_dt"))).over(w))
      .withColumn("is_unknown", col("_dt") > cutoff)
      .drop("_dt")
  }

  /** ts_fill_unknown_by (ts_macros.cpp:979): strategy ∈ last_value | null |
    * default. Output (group, ds, value) with caller's names. */
  def fillUnknownBy(df: DataFrame, groupCol: String, dsCol: String, valueCol: String,
                    cutoffDate: String, strategy: String = "last_value",
                    fillValue: Double = 0.0): DataFrame = {
    val dt = date_trunc("second", col(dsCol).cast(TimestampType))
    val cutoff = date_trunc("second", lit(cutoffDate).cast(TimestampType))
    val base = df.select(col(groupCol), dt.as(dsCol), col(valueCol))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val known = when(col(dsCol) <= cutoff, col(valueCol))
    val filled = strategy match {
      case "null" => when(col(dsCol) <= cutoff, col(valueCol)).otherwise(lit(null))
      case "default" => when(col(dsCol) <= cutoff, col(valueCol)).otherwise(lit(fillValue))
      case "last_value" => when(col(dsCol) <= cutoff, col(valueCol))
        .otherwise(last(known, ignoreNulls = true).over(w))
      case other => throw new IllegalArgumentException(
        s"Unknown strategy '$other'. Valid: last_value, null, default")
    }
    base.withColumn("_f", filled)
      .select(col(groupCol), col(dsCol), col("_f").as(valueCol))
  }

  /** ts_validate_timestamps_by (ts_macros.cpp:1021): per-group comparison of
    * present vs expected timestamps. */
  def validateTimestampsBy(df: DataFrame, groupCol: String, dsCol: String,
                           expected: Seq[java.sql.Timestamp]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(col(groupCol), date_trunc("second", col(dsCol).cast(TimestampType)).as("_dt"))
      .distinct()
    val exp = expected.toDF("_expected_dt")
      .select(date_trunc("second", col("_expected_dt")).as("_expected_dt"))
    val groups = src.select(col(groupCol)).distinct()
    val allExpected = groups.crossJoin(broadcast(exp))
    val validation = allExpected.join(src,
      allExpected(groupCol) === src(groupCol) && col("_expected_dt") === col("_dt"), "left")
      .select(allExpected(groupCol), col("_expected_dt"), col("_dt").isNotNull.as("_found"))
    validation.groupBy(col(groupCol))
      .agg(
        min(col("_found")).as("is_valid"),
        count(lit(1)).as("n_expected"),
        sum(when(col("_found"), 1).otherwise(0)).cast(LongType).as("n_found"),
        sum(when(!col("_found"), 1).otherwise(0)).cast(LongType).as("n_missing"),
        sort_array(collect_list(when(!col("_found"), col("_expected_dt")))).as("missing_timestamps"))
  }

  /** ts_validate_timestamps_summary_by (ts_macros.cpp:1066). */
  def validateTimestampsSummaryBy(df: DataFrame, groupCol: String, dsCol: String,
                                  expected: Seq[java.sql.Timestamp]): DataFrame = {
    val perGroup = validateTimestampsBy(df, groupCol, dsCol, expected)
    perGroup.agg(
      min(col("is_valid")).as("all_valid"),
      count(lit(1)).as("n_groups"),
      sum(when(col("is_valid"), 1).otherwise(0)).cast(LongType).as("n_valid_groups"),
      sum(when(!col("is_valid"), 1).otherwise(0)).cast(LongType).as("n_invalid_groups"),
      sort_array(collect_list(when(!col("is_valid"), col(groupCol)))).as("invalid_groups"))
  }
}

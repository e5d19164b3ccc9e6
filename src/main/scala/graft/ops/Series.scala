package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Series gathering and date-type plumbing shared by the grouped operators.
  *
  * The reference materializes each group into dense arrays via
  * `LIST(value ORDER BY date)` inside a GROUP BY (ts_macros.cpp:37-42); the
  * Spark shape is `groupBy(g).agg(sort_array(collect_list(struct(ds, y))))` —
  * Catalyst plans partial + final hash aggregation around a shuffle on the
  * group key, so per-task memory stays O(series length), matching the
  * reference's O(group) contract (ts_forecast_native.cpp:23-26).
  *
  * Date columns may be DATE, TIMESTAMP, INTEGER or BIGINT and are normalized
  * to epoch micros (raw value for integer columns), with the original type
  * restored in outputs (DateColumnType contract, ts_fill_gaps_native.hpp:12-17,
  * ts_forecast_native.cpp:406-424).
  */
object Series {

  /** Column that converts a ds column to epoch micros (or raw long). */
  def toMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case DateType => unix_micros(c.cast(TimestampType)) // UTC session TZ
    case IntegerType | LongType | ShortType => c.cast(LongType)
    case other => throw new IllegalArgumentException(
      s"Unsupported date column type $other: expected DATE, TIMESTAMP, INTEGER or BIGINT")
  }

  /** Restore a micros/raw long column to the original ds type. */
  def fromMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => timestamp_micros(c).cast(dt)
    case DateType => timestamp_micros(c).cast(DateType)
    case IntegerType => c.cast(IntegerType)
    case ShortType => c.cast(ShortType)
    case LongType => c
    case other => throw new IllegalArgumentException(s"Unsupported date column type $other")
  }

  /** True if the ds column carries raw integer time steps. */
  def isIntegerDs(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType => true
    case _ => false
  }

  /** Gather each group into parallel arrays `(_ts, _vs, _nu)` sorted by time:
    * epoch-micros timestamps, values (NaN where null), null mask.
    *
    * Partitioning (r11): the gather output feeds PER-SERIES KERNELS
    * (forecast optimizers, stats, changepoints) whose downstream cost is
    * CPU per row, not bytes — exactly the case AQE's byte-based partition
    * coalescing cannot see. At bench scale the gathered table is ~1 MB, so
    * AQE collapsed the agg exchange to ONE partition and the whole AutoETS
    * pass ran on a single core (measured: 2.2 s kernel stage ≈ the 2.3 s
    * single-thread kernel CPU of all 1,500 series). The fix keys the ONE
    * exchange with an EXPLICIT partition count (`repartition(n, g)` before
    * the groupBy — the aggregate reuses that partitioning, so no second
    * exchange, same bytes on the wire): a REPARTITION_BY_NUM shuffle is
    * never coalesced by AQE, and `n` comes from spark.sql.shuffle.partitions
    * — the standard cluster-sized knob (the bench sets it to
    * SPARK_GRAFT_CPUS), never a local constant. */
  def gather(df: DataFrame, groupCol: String, dsCol: String, yCol: String): DataFrame = {
    val dsType = df.schema(dsCol).dataType
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.filter(col(dsCol).isNotNull)
      .repartition(n, col(groupCol))
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(
        toMicros(col(dsCol), dsType).as("t"),
        coalesce(col(yCol).cast(DoubleType), lit(Double.NaN)).as("v"),
        col(yCol).isNull.as("nu")))).as("_s"))
      .select(col(groupCol), col("_s.t").as("_ts"), col("_s.v").as("_vs"), col("_s.nu").as("_nu"))
  }
}

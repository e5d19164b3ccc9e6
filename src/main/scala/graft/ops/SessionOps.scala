package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Sessionization — split each entity's event timeline into sessions at
  * idle gaps of at least `gapMicros`: two consecutive events of the same
  * entity belong to the same session iff their timestamp distance is
  * STRICTLY less than the gap (the same merge rule as Spark's built-in
  * `session_window`, so the per-event assignment here and the streaming
  * aggregation there draw identical boundaries — SessionOpsSpec pins the
  * equivalence).
  *
  * Scale design — one hash exchange on the entity keys, then two
  * window passes over the SAME partitioning+ordering (a `lag` to flag
  * session starts, a running sum to number them): Catalyst plans both
  * without a second exchange or sort, so the cost is shuffle(|events|
  * slim rows) + one linear scan per partition. No join, no driver
  * state, no per-session materialization. `sessionStats` instead goes
  * through `groupBy(keys, session_window(ts, gap))` — Spark's native
  * merging session aggregation, which is partial-aggregation-friendly
  * and is THE streaming path (watermark + session_window works on an
  * unbounded `readStream` with this exact call). A hot entity
  * serializes its own timeline — inherent to gap semantics (a session
  * boundary is a running property of the ordered stream); the 100 TB
  * mitigation is the same epoch-bucketing composition as
  * [[AsofJoinOp]]'s.
  *
  * Timestamps may be `TimestampType` (micros precision) or integral
  * epoch columns; `gapMicros` is in the comparison unit (micros for
  * timestamps). Null timestamps get a null `session_idx` (a broken
  * clock is not a session signal).
  *
  * Reference: event/stream sessionization surface of the reference
  * engine's streaming examples; merge rule cross-checked against Spark
  * `session_window` and replayed by the DuckDB oracle as
  * lag-diff ≥ gap → boundary, cumulative-sum numbering. */
object SessionOps {

  private def isTs(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
    case TimestampType | TimestampNTZType => true
    case _                                => false
  }

  // NTZ epochs via an explicit UTC-session cast to TimestampType — every
  // graft session pins spark.sql.session.timeZone=UTC, so this is stable.
  private def epoch(df: DataFrame, c: String): Column =
    if (isTs(df, c)) unix_micros(col(c).cast(TimestampType))
    else col(c).cast("long")

  /** Per-event session assignment: adds `session_idx` (0-based per key,
    * in time order) and `session_start` (true on the first event of each
    * session). Rows with a null timestamp get null in both. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gapMicros: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(gapMicros > 0, s"gap must be positive, got $gapMicros")
    val ats = epoch(df, tsCol)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__ats").asc_nulls_first)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__ats", ats)
      .withColumn("__new",
        (lag(col("__ats"), 1).over(w).isNull ||
          col("__ats") - lag(col("__ats"), 1).over(w) >= lit(gapMicros)) &&
          col("__ats").isNotNull)
      .withColumn("session_idx",
        when(col("__ats").isNotNull,
          sum(col("__new").cast("long")).over(wRun) - lit(1L)))
      .withColumn("session_start", when(col("__ats").isNotNull, col("__new")))
      .drop("__ats", "__new")
  }

  /** Per-session rollup via Spark's native merging `session_window`
    * aggregation (partial-agg friendly; identical call works on a
    * stream with a watermark): one row per (keys, session) with
    * `session_start_us` / `session_last_us` (first/last event epoch,
    * micros), `n_events`, `duration_us`, and — when `valueCol` is set —
    * `y_sum` (order-independent DECIMAL-exact sum of the rounded
    * values, the cross-engine-stable form). Null-timestamp rows are
    * excluded (they belong to no session). */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String,
                   gapMicros: Long, valueCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "sessionStats needs at least one key column")
    require(gapMicros > 0, s"gap must be positive, got $gapMicros")
    val withTs = df.filter(col(tsCol).isNotNull)
      .withColumn("__ts",
        if (isTs(df, tsCol)) col(tsCol).cast(TimestampType)
        else timestamp_micros(col(tsCol).cast("long")))
    val aggs: Seq[Column] =
      Seq(min(unix_micros(col("__ts"))).as("session_start_us"),
          max(unix_micros(col("__ts"))).as("session_last_us"),
          count(lit(1)).as("n_events")) ++
        valueCol.map(v =>
          sum(round(col(v), 6).cast("decimal(28,6)")).cast("double").as("y_sum"))
    withTs
      .groupBy((keys.map(col) :+
        session_window(col("__ts"), s"$gapMicros microseconds").as("__w")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("duration_us",
        col("session_last_us") - col("session_start_us"))
      .drop("__w")
  }
}

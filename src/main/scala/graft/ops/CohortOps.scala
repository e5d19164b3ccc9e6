package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Event-analytics rollups over entity timelines: ordered funnels and
  * cohort retention — the product-analytics surface (Amplitude/Snowplow
  * style) a data-curation stack needs when the corpus IS an event log.
  *
  * Funnel semantics — strict order, earliest anchor (the standard tool
  * contract): `t1 = min ts of step 1`; `t_i = min ts of step i with
  * ts >= t_(i-1)` (and `ts <= t1 + window` when a conversion window is
  * set). With no window the greedy earliest anchor is optimal (the
  * minimal `t1` admits the maximal candidate set downstream, inductively
  * for every step); with a window it is the documented anchored-at-first-
  * occurrence behavior every mainstream funnel tool ships.
  *
  * Scale design — NO per-entity event array is ever materialized: each
  * funnel step is one slim aggregation `min(ts) per entity` over the
  * step-filtered events, joined entity-keyed to the previous step's
  * anchor (m steps → m map-side-combined aggregations + m-1 slim joins;
  * every exchange carries one row per converting entity, not the event
  * log). Retention is two aggregations: first-activity day per entity
  * (map-side combined min), then distinct active (cohort, offset, entity)
  * triples rolled up to counts — shuffle bounded by active entity-days,
  * never raw events squared. Both compose with [[SessionOps]] and
  * [[AsofJoinOp]] on the same entity-keyed partitioning.
  *
  * Reference: event-analytics examples of the reference engine's
  * streaming/event documentation; semantics cross-checked against the
  * DuckDB oracle's step-by-step min-over-filtered-join replay. */
object CohortOps {

  private def isTs(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
    case TimestampType | TimestampNTZType => true
    case _                                => false
  }

  private def epoch(df: DataFrame, c: String): Column =
    if (isTs(df, c)) unix_micros(col(c).cast(TimestampType))
    else col(c).cast("long")

  /** Per-entity funnel: one row per entity that completed step 1, with
    * `steps_completed` (1..m) and the conversion timestamps
    * `t1..tm` (epoch micros; null beyond the reached step).
    *
    * @param windowMicros conversion window anchored at t1: every later
    *        step must land within it */
  def funnel(df: DataFrame, keys: Seq[String], tsCol: String, stepCol: String,
             steps: Seq[String], windowMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length, "funnel steps must be distinct")
    val e = df
      .filter(col(tsCol).isNotNull && col(stepCol).isin(steps.map(lit): _*))
      .select(keys.map(col) :+ col(stepCol).as("__s") :+
        epoch(df, tsCol).as("__t"): _*)

    // anchor: earliest step-1 event per entity
    var acc = e.filter(col("__s") === steps.head)
      .groupBy(keys.map(col): _*)
      .agg(min(col("__t")).as("t1"))
    var i = 2
    while (i <= steps.length) {
      val prev = s"t${i - 1}"
      val stepEvents = e.filter(col("__s") === steps(i - 1))
      val gate = windowMicros
        .map(w => col("__t") <= col("t1") + lit(w))
        .getOrElse(lit(true))
      val next = acc.join(stepEvents, keys, "inner")
        .filter(col("__t") >= col(prev) && gate)
        .groupBy(keys.map(col): _*)
        .agg(min(col("__t")).as(s"t$i"))
      acc = acc.join(next, keys, "left")
      i += 1
    }
    val stepCols = (1 to steps.length).map(j => col(s"t$j"))
    val completed = stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("steps_completed", completed.cast("long"))
  }

  /** Conversion table: one row per funnel step with the number of
    * entities that reached it (monotone non-increasing). */
  def funnelCounts(df: DataFrame, keys: Seq[String], tsCol: String,
                   stepCol: String, steps: Seq[String],
                   windowMicros: Option[Long] = None): DataFrame = {
    val f = funnel(df, keys, tsCol, stepCol, steps, windowMicros)
    val perStep = (1 to steps.length).map(j =>
      sum(when(col(s"t$j").isNotNull, 1L).otherwise(0L)).as(s"n$j"))
    val totals = f.agg(perStep.head, perStep.tail: _*)
    totals.select(posexplode(array((1 to steps.length).map(j => col(s"n$j")): _*))
        .as(Seq("__i", "n_entities")))
      .select((col("__i") + 1).cast("long").as("step_idx"),
        element_at(array(steps.map(lit): _*), col("__i") + 1).as("step"),
        col("n_entities"))
  }

  /** Cohort retention: entities grouped by first-activity day; one row
    * per (cohort_day, offset_days) with the count of cohort entities
    * active that day. `maxOffsetDays` caps the matrix width. */
  def retention(df: DataFrame, keys: Seq[String], tsCol: String,
                maxOffsetDays: Int = 30): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be >= 0, got $maxOffsetDays")
    val days = df.filter(col(tsCol).isNotNull)
      .select(keys.map(col) :+
        (epoch(df, tsCol) / lit(86400000000L)).cast("long").as("__day"): _*)
      .distinct() // active entity-days
    val first = days.groupBy(keys.map(col): _*)
      .agg(min(col("__day")).as("__cohort"))
    days.join(first, keys)
      .withColumn("offset_days", col("__day") - col("__cohort"))
      .filter(col("offset_days") <= maxOffsetDays)
      .groupBy(col("__cohort").as("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_active"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Interval-overlap join — attach to each point row every interval row of
  * the same keys whose `[start, end]` contains the point's timestamp
  * ("which campaign/session/maintenance-window was active when this
  * event happened"). The dual of [[AsofJoinOp]]: as-of picks ONE nearest
  * row, interval join returns ALL containing ranges.
  *
  * Scale design — Spark plans a raw `t BETWEEN start AND end` predicate
  * as a broadcast-nested-loop or a per-key sort-merge rescan: O(|P|·|I|)
  * per key. Here the timeline is diced into fixed-width buckets
  * (`bucketMicros`): a point owns exactly ONE bucket, an interval emits
  * one row per covered bucket, and the join is EQUI on
  * `(keys, bucket)` with the exact containment check riding as a cheap
  * post-filter. Every qualifying (point, interval) pair meets in
  * precisely the point's bucket — no dedup step, no row ever counted
  * twice. Cost: shuffle(|P| + Σ span/bucketMicros interval rows); pick
  * `bucketMicros` near the TYPICAL interval span so most intervals emit
  * O(1) rows — a knob the caller owns because it is domain knowledge
  * (an hour for sessions, a day for campaigns). Degenerate long
  * intervals fan out linearly in their span — bounded, observable in
  * the plan, and still never quadratic. No nested-loop join exists in
  * the plan (PlanGuardSpec pins this).
  *
  * `endCol` is INCLUSIVE (closed interval, the session-stats contract);
  * null timestamps/bounds never match. */
object IntervalJoinOp {

  private def isTs(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
    case TimestampType | TimestampNTZType => true
    case _                                => false
  }

  private def epoch(df: DataFrame, c: String): Column =
    if (isTs(df, c)) unix_micros(col(c).cast(TimestampType))
    else col(c).cast("long")

  /** Inner interval join: one output row per (point, containing
    * interval). Interval payload columns are emitted as
    * `intervalPrefix + name`. */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   ptTs: String, startCol: String, endCol: String,
                   bucketMicros: Long,
                   intervalPrefix: String = "iv_"): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equi-key")
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")

    val pt = points
      .filter(col(ptTs).isNotNull)
      .withColumn("__pt", epoch(points, ptTs))
      .withColumn("__bk", floor(col("__pt") / bucketMicros).cast("long"))

    val ivCols = intervals.columns.filterNot(keys.contains).toSeq
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__s", epoch(intervals, startCol))
      .withColumn("__e", epoch(intervals, endCol))
      .filter(col("__s") <= col("__e"))
      .withColumn("__bk",
        explode(sequence(floor(col("__s") / bucketMicros).cast("long"),
          floor(col("__e") / bucketMicros).cast("long"))))
      .select(keys.map(col) ++ Seq(col("__bk"), col("__s"), col("__e")) ++
        ivCols.map(c => col(c).as(s"$intervalPrefix$c")): _*)

    pt.join(iv, keys :+ "__bk")
      .filter(col("__pt") >= col("__s") && col("__pt") <= col("__e"))
      .drop("__pt", "__bk", "__s", "__e")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared testdata table loader — the ONE place that owns the events
  * TIMESTAMP(NANOS) workaround, used by the driver entry points and the
  * specs alike so the conversion cannot drift between them.
  *
  * The events table is TIMESTAMP(NANOS) parquet, which Spark 4 refuses by
  * default — read nanos as long (`spark.sql.legacy.parquet.nanosAsLong`)
  * and convert to a proper micros timestamp column. */
private[graft] object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** The events table with a usable `ts` timestamp column. */
  def events(s: SparkSession, dir: String): DataFrame = table(s, dir, "events")
}

package graft

import org.apache.spark.sql.SparkSession

/** Replica of the driver's t1 smoke: build a DEFAULT-config session (no UTC
  * override, default shuffle partitions — whatever the driver might use),
  * call SparkEntry.entry, assert rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(8, truncate = false)
    println(s"entry rows: $n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}

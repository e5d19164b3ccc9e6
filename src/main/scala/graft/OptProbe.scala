package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch measurement harness for the optimization rounds: times named
  * experiments (GRAFT_OPT=a,b,c) against sf0.1 with the bench's protocol
  * (noop sink, 1 warmup + 3 timed, median). Not part of the driver
  * surface — numbers of record come from graft.Bench. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = (if (args.nonEmpty) args(0)
                 else sys.env.getOrElse("GRAFT_OPT", "q1")).split(",").toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.sql.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = Tables.table(spark, sfDir, name)
    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med3(tag: String)(df: => DataFrame): Unit = {
      once(df)
      val ts = Seq.fill(3)(once(df)).sorted
      println(f"[opt] $tag%-40s median=${ts(1)}%.3f all=${ts.map(x => f"$x%.3f")}")
    }

    def dumpPlan(df: DataFrame, path: String): Unit = {
      val w = new java.io.PrintWriter(path)
      try w.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
    }

    if (which("q1plans")) {
      val li = t("lineitem")
      def exactSumOld(c: org.apache.spark.sql.Column) =
        sum(round(c, 6).cast(DecimalType(28, 6))).cast(DoubleType)
      val q1Old = li
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(round(col("l_quantity"), 6).cast(DecimalType(28, 6))), 2).cast(DoubleType).as("sum_qty"),
          round(sum(round(col("l_extendedprice"), 6).cast(DecimalType(28, 6))), 2).cast(DoubleType).as("sum_base_price"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).cast(DecimalType(28, 6))), 2).cast(DoubleType).as("sum_disc_price"),
          round(exactSumOld(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          round(exactSumOld(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
      dumpPlan(q1Old, "plans/r10/q1_pricing_summary_before.txt")
      dumpPlan(SparkEntry.queries("q1_pricing_summary")(spark, sfDir),
        "plans/r10/q1_pricing_summary_after.txt")
      val cust = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t("orders")
        .filter(col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      val keyset = broadcast(cust)
        .join(ord, col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"))
      val liAgg = li
        .filter(col("l_shipdate") > lit("1997-01-01").cast(TimestampType))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .cast(DecimalType(28, 6))), 2).cast(DoubleType).as("revenue"))
        .filter(col("revenue") > 100000)
      val q3Old = liAgg.join(broadcast(keyset), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("revenue"))
      dumpPlan(q3Old, "plans/r10/q3_segment_revenue_before.txt")
      dumpPlan(SparkEntry.queries("q3_segment_revenue")(spark, sfDir),
        "plans/r10/q3_segment_revenue_after.txt")
    }

    if (which("q1")) {
      val li = t("lineitem")
      println("[opt] lineitem rows=" + li.count() +
        " partitions=" + li.rdd.getNumPartitions)
      med3("q1_current")(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
      def exactSumN(c: org.apache.spark.sql.Column, p: Int) =
        sum(round(c, 6).cast(DecimalType(p, 6))).cast(DoubleType)
      def q1With(p: Int) = li
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(round(col("l_quantity"), 6).cast(DecimalType(p, 6))), 2).cast(DoubleType).as("sum_qty"),
          round(sum(round(col("l_extendedprice"), 6).cast(DecimalType(p, 6))), 2).cast(DoubleType).as("sum_base_price"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).cast(DecimalType(p, 6))), 2).cast(DoubleType).as("sum_disc_price"),
          round(exactSumN(col("l_quantity"), p) / count(lit(1)), 6).as("avg_qty"),
          round(exactSumN(col("l_discount"), p) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
      med3("q1_decimal18")(q1With(18))
      med3("q3_current")(SparkEntry.queries("q3_segment_revenue")(spark, sfDir))
      med3("q1_scan_only")(li
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("c")))
    }

    spark.stop()
  }
}

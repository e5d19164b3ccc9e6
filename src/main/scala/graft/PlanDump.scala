package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the headline operators — the review
  * artifact for scale tuning (pushdown, broadcast, shuffle placement). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_segment_revenue", "fc_seasonal_naive",
        "ts_fill_gaps_by", "ts_stats_by", "dedup_minhash_pairs", "ann_topk",
        "ts_backtest_snaive")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n=============== $n ===============")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

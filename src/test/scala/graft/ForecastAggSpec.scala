package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.Aggregators

/** Port of test/sql/ts_forecast_agg.test: the aggregate API's STRUCT
  * contract — forecast_step, forecast_timestamp (median observed spacing),
  * point_forecast, lower_90/upper_90 (fixed names, ts_forecast_agg.cpp:92-95),
  * model_name, insample_fitted, and the error_message path.
  */
class ForecastAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-forecast-agg")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def singleSeries = {
    val s = spark
    import s.implicits._
    (0 until 20).map { i =>
      ("P1", java.sql.Timestamp.valueOf(s"2024-01-${"%02d".format(i + 1)} 00:00:00"), 10.0 + i)
    }.toDF("product_id", "ts", "value")
  }

  test("struct field lengths match the horizon (:84-121)") {
    val agg = udaf(new Aggregators.ForecastAgg("Naive", 5, Map.empty),
      Encoders.product[Aggregators.TsPoint])
    val fc = singleSeries.groupBy(col("product_id"))
      .agg(agg(col("ts"), col("value")).as("fc"))
      .select(col("fc.*")).collect()(0)
    assert(fc.getSeq[Int](fc.fieldIndex("forecast_step")).toSeq == (1 to 5))
    assert(fc.getSeq[java.sql.Timestamp](fc.fieldIndex("forecast_timestamp")).length == 5)
    assert(fc.getSeq[Double](fc.fieldIndex("point_forecast")).length == 5)
    assert(fc.getSeq[Double](fc.fieldIndex("lower_90")).length == 5)
    assert(fc.getSeq[Double](fc.fieldIndex("upper_90")).length == 5)
    assert(fc.getAs[String]("model_name") == "Naive")
    assert(fc.getSeq[Double](fc.fieldIndex("insample_fitted")).length == 20)
    assert(fc.isNullAt(fc.fieldIndex("error_message")))
    // future timestamps continue the daily spacing from the last observation
    val stamps = fc.getSeq[java.sql.Timestamp](fc.fieldIndex("forecast_timestamp"))
    assert(stamps.head.toString.startsWith("2024-01-21"))
    assert(stamps.last.toString.startsWith("2024-01-25"))
  }

  test("default agg confidence is 0.90, params can widen it (cpp:23)") {
    val out90 = {
      val a = new Aggregators.ForecastAgg("Naive", 3, Map.empty)
      val buf = (0 until 20).foldLeft(a.zero)((b, i) =>
        a.reduce(b, Aggregators.TsPoint(java.sql.Timestamp.valueOf(
          s"2024-01-${"%02d".format(i + 1)} 00:00:00"), Some(10.0 + (i % 5)))))
      a.finish(buf)
    }
    val out99 = {
      val a = new Aggregators.ForecastAgg("Naive", 3, Map("confidence_level" -> "0.99"))
      val buf = (0 until 20).foldLeft(a.zero)((b, i) =>
        a.reduce(b, Aggregators.TsPoint(java.sql.Timestamp.valueOf(
          s"2024-01-${"%02d".format(i + 1)} 00:00:00"), Some(10.0 + (i % 5)))))
      a.finish(buf)
    }
    val w90 = out90.upper_90.head - out90.lower_90.head
    val w99 = out99.upper_90.head - out99.lower_90.head
    assert(w99 > w90, s"w90=$w90 w99=$w99")
  }

  test("too-short series reports error_message instead of throwing") {
    val a = new Aggregators.ForecastAgg("Naive", 3, Map.empty)
    val buf = a.reduce(a.zero,
      Aggregators.TsPoint(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0)))
    val out = a.finish(buf)
    assert(out.point_forecast.isEmpty && out.error_message.isDefined)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.{Decomposition, Detrend, Seasonality}
import graft.ops.{TsCvOp, TsFeaturesOp, TsPrep}

/** Third smoke batch: ts_cv_split.test (cutoff semantics), ts_cv_forecast.test
  * (per-fold forecast rows), ts_cv_backtest.test (fold metric), ts_diff.test
  * (exact first differences), ts_detrend.test (auto selection),
  * ts_decomposition.test (reconstruction), ts_seasonality.test (top-period
  * list), ts_features.test (exact scalar features), ts_fill_forward_native /
  * ts_fill_gaps_native.test (grid extension + NULL insertion).
  */
class ReferenceSmokeSpec3 extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-reference-smoke3")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def day(i: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))

  private def series(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => ("A", day(i), 10.0 + i)).toDF("id", "ds", "y")
  }

  test("ts_cv_split.test: train rows end at the cutoff, test rows follow it") {
    val cutoff = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val out = TsCvOp.cvSplitBy(series(20), "id", "ds", "y", Seq(cutoff), 5)
    val train = out.filter(col("split") === "train")
    val test = out.filter(col("split") === "test")
    assert(train.agg(max("ds")).collect()(0).getDate(0).toString == "2024-01-10")
    assert(test.agg(min("ds")).collect()(0).getDate(0).toString == "2024-01-11")
    assert(test.count() == 5)
  }

  test("ts_cv_forecast.test: one yhat per test row, train rows carry none") {
    val folds = TsCvOp.cvFoldsBy(series(30), "id", "ds", "y", 2, 5)
    val fc = TsCvOp.cvForecastBy(folds, "id", "ds", "y", "Naive")
    val test = fc.filter(col("split") === "test")
    assert(test.count() == 10)
    assert(test.filter(col("yhat").isNull).count() == 0)
    assert(fc.filter(col("split") === "train" && col("yhat").isNotNull).count() == 0)
  }

  test("ts_cv_backtest.test: the fold metric matches a hand computation") {
    // y = 10 + i: Naive per fold predicts the last train value for all 5
    // test steps → errors 1..5 → rmse = sqrt(mean(1,4,9,16,25)) = sqrt(11)
    val out = TsCvOp.backtestAutoBy(series(30), "id", "ds", "y", 5, 2, "1d",
      Map("method" -> "Naive"), "rmse")
    val vals = out.select("fold_metric_score").collect().map(_.getDouble(0))
    vals.foreach(v => assert(math.abs(v - math.sqrt(11.0)) < 1e-9, v))
  }

  test("metric-set parity: every reference metric accepted, typos rejected") {
    // ts_backtest_native.cpp:280-374 accepts exactly these; on the 10+i line
    // with Naive (errors 1..5 per fold) each has a closed form
    def score(metric: String): Double =
      TsCvOp.backtestAutoBy(series(30), "id", "ds", "y", 5, 2, "1d",
        Map("method" -> "Naive"), metric)
        .select("fold_metric_score").head().getDouble(0)
    assert(math.abs(score("mae") - 3.0) < 1e-9)             // mean(1..5)
    assert(math.abs(score("mse") - 11.0) < 1e-9)
    assert(math.abs(score("rmse") - math.sqrt(11.0)) < 1e-9)
    assert(score("mape") > 0 && score("smape") > 0)
    assert(math.abs(score("bias") - -3.0) < 1e-9)           // yhat below actual
    // r2 on actuals {t+1..t+5} vs constant yhat: ss_tot = 10, ss_res = 55
    assert(math.abs(score("r2") - (1.0 - 55.0 / 10.0)) < 1e-9)
    val cov = score("coverage")
    assert(cov >= 0.0 && cov <= 1.0)
    // deviation from the reference (documented in foldMetric): an unknown
    // name raises instead of silently falling back to rmse
    val err = intercept[IllegalArgumentException] { score("rmsle") }
    assert(err.getMessage.contains("rmsle") && err.getMessage.contains("bias|r2"))
  }

  test("ts_diff.test: first differences of the line are exactly the slope") {
    val out = TsPrep.diffBy(series(10), "id", "ds", "y", 1)
    val diffs = out.orderBy("ds").select("diff_value").collect().map(r =>
      if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    assert(diffs.count(_.isNaN) == 1) // first row has no predecessor
    assert(diffs.filterNot(_.isNaN).forall(_ == 1.0))
  }

  test("ts_detrend.test: auto selection picks the linear model on a line") {
    val r = Detrend.auto((0 until 30).map(i => 5.0 + 2.0 * i).toArray)
    assert(r.method == "auto:linear", r.method)
    assert(r.detrended.forall(d => math.abs(d) < 1e-6))
  }

  test("ts_decomposition.test: MSTL components sum back to the series") {
    val y = Array.tabulate(56)(i => 50.0 + 0.3 * i + 8.0 * math.sin(2 * math.Pi * i / 7.0))
    val m = Decomposition.mstl(y, Seq(7))
    (0 until y.length).foreach { i =>
      val recon = m.trend(i) + m.seasonals.map(_._2(i)).sum + m.remainder(i)
      assert(math.abs(recon - y(i)) < 1e-9)
    }
  }

  test("ts_seasonality.test: detect_seasonality ranks the planted period first") {
    val y = Array.tabulate(64)(i => 10.0 + 5.0 * math.sin(2 * math.Pi * i / 8.0))
    val periods = Seasonality.detectSeasonality(y, None)
    assert(periods.nonEmpty && periods.head == 8, periods.toSeq)
    assert(periods.length <= 5) // top-5 contract
  }

  test("ts_features.test: scalar features compute their exact values") {
    val s = spark
    import s.implicits._
    val df = (0 until 10).map(i => ("A", day(i), (i + 1).toDouble)).toDF("id", "ds", "y")
    val out = TsFeaturesOp.featuresBy(df, "id", "ds", "y",
      Seq("length", "sum", "mean", "minimum", "maximum", "median")).collect()(0)
    assert(out.getAs[Double]("length") == 10.0)
    assert(out.getAs[Double]("sum") == 55.0)
    assert(out.getAs[Double]("mean") == 5.5)
    assert(out.getAs[Double]("minimum") == 1.0)
    assert(out.getAs[Double]("maximum") == 10.0)
    assert(out.getAs[Double]("median") == 5.5)
  }

  test("ts_fill_forward_native.test: the grid extends to the target date with NULL values") {
    val out = TsPrep.fillForwardBy(series(5), "id", "ds", "y", "2024-01-10", "1d")
    assert(out.count() == 10)
    assert(out.filter(col("y").isNull).count() == 5) // extension rows carry NULL
    val maxDs = out.agg(max("ds")).collect()(0).getDate(0)
    assert(maxDs.toString == "2024-01-10")
  }

  test("ts_fill_gaps_native.test: inserted rows are NULL, originals preserved") {
    val s = spark
    import s.implicits._
    val gappy = Seq(0, 1, 4, 5).map(i => ("A", day(i), i * 1.0)).toDF("id", "ds", "y")
    val out = TsPrep.fillGapsBy(gappy, "id", "ds", "y", "1d")
    assert(out.count() == 6)
    assert(out.filter(col("y").isNull).count() == 2) // days 2 and 3
    assert(out.filter(col("y").isNotNull).count() == 4)
  }
}

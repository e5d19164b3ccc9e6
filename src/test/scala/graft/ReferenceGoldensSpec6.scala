package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Forecast
import graft.ops.Hierarchy

/** Sixth golden batch: multi-key separator validation (ts_multi_key.test),
  * VARCHAR value-column auto-cast (ts_varchar_edge_cases.test), state-space
  * model contracts (ts_forecast_statespace.test), and the MFLES high-CV
  * stability regression (ts_forecast_mfles_stability.test, issue #168). */
class ReferenceGoldensSpec6 extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-goldens6")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("validate_separator: clean keys (ts_multi_key.test:20-41)") {
    val s = spark
    import s.implicits._
    val ids = Seq(("EU", "STORE001", "SKU42"), ("EU", "STORE001", "SKU43"),
      ("US", "STORE002", "SKU44")).toDF("region_id", "store_id", "item_id")
    val r3 = Hierarchy.validateSeparator(ids, Seq("region_id", "store_id", "item_id")).collect()(0)
    assert(r3.getAs[Boolean]("is_valid"))
    assert(r3.getAs[Int]("n_conflicts") == 0)
    assert(r3.getAs[String]("message") == "Separator is safe to use")
    val r2 = Hierarchy.validateSeparator(ids, Seq("region_id", "store_id")).collect()(0)
    assert(r2.getAs[Boolean]("is_valid"))
    val rd = Hierarchy.validateSeparator(ids, Seq("region_id", "store_id", "item_id"),
      separator = "-").collect()(0)
    assert(rd.getAs[Boolean]("is_valid"))
  }

  test("validate_separator: conflict detection and suggestions (ts_multi_key.test:44-64)") {
    val s = spark
    import s.implicits._
    val bad = Seq(("EU", "STORE|001", "SKU42")).toDF("region_id", "store_id", "item_id")
    val r = Hierarchy.validateSeparator(bad, Seq("region_id", "store_id", "item_id")).collect()(0)
    assert(!r.getAs[Boolean]("is_valid"))
    assert(r.getAs[Int]("n_conflicts") == 1, "n_conflicts counts distinct values")
    assert(r.getAs[scala.collection.Seq[String]]("conflicting_values").toSeq == Seq("STORE|001"))
    assert(r.getAs[String]("message").contains("Try"),
      "message suggests alternative separators")
    assert(r.getAs[String]("message").contains("'-'"))
  }

  test("VARCHAR value columns auto-cast through the ops (ts_varchar_edge_cases.test:44-70)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 60).flatMap { i =>
      Seq(("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
          (10.0 + i * 0.5 + math.sin(i * 3.14159 / 7) * 2).toString),
        ("B", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
          (20.0 + i * 0.3 + math.cos(i * 3.14159 / 7) * 3).toString))
    }
    val df = rows.toDF("id", "ds", "y") // y is StringType, like a CSV import
    assert(df.schema("y").dataType == org.apache.spark.sql.types.StringType)
    val stats = graft.ops.TsStatsOp.statsBy(df, "id", "ds", "y", "1d")
    assert(stats.count() == 2)
    assert(stats.filter(col("id") === "A").select("length").collect()(0).getLong(0) == 60)
    val fc = graft.ops.TsForecastOp.forecastBy(df, "id", "ds", "y", "Naive", 5, "1d")
    assert(fc.count() == 10)
    assert(fc.filter(col("yhat").isNull).count() == 0)
  }

  test("hydrate_features / prepare_regression_input contracts " +
      "(ts_hydrate_features.test, ts_prepare_regression_input.test)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 60).flatMap { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      Seq(("A", d, 10.0 + 50 + i, 20.0 + i % 10, i % 7 == 0),
        ("B", d, 10.0 + i, 20.0 + i % 10, i % 7 == 0))
    }
    val data = rows.toDF("series_id", "date", "revenue", "temperature", "is_weekend")
    val splits = graft.ops.TsCvOp.cvSplitBy(data, "series_id", "date", "revenue",
      Seq(java.sql.Timestamp.valueOf("2024-01-30 00:00:00"),
        java.sql.Timestamp.valueOf("2024-02-15 00:00:00")), 7)
    val hyd = graft.ops.TsCvOp.hydrateFeaturesBy(splits, data, "series_id", "date", "revenue")
    assert(hyd.count() == 180, "30+7 + 46+7 rows per series (ts_hydrate_features.test:38-42)")
    val cols = hyd.columns.toSet
    Seq("fold_id", "split", "group_col", "date_col", "target_col", "_is_test",
      "_train_cutoff").foreach(c => assert(cols.contains(c), s"missing $c"))
    assert(hyd.filter(col("split") === "train" && col("_is_test")).count() == 0)
    assert(hyd.filter(col("split") === "test" && col("_is_test")).count() == 28)
    assert(hyd.filter(col("temperature").isNull).count() == 0, "features preserved")
    assert(hyd.select("fold_id").distinct().count() == 2)

    val reg = graft.ops.TsCvOp.prepareRegressionInputBy(splits, data, "series_id", "date", "revenue")
    assert(reg.count() == 180)
    assert(reg.filter(col("masked_target").isNull).count() == 28,
      "every test row masked (ts_prepare_regression_input.test:44-52)")
    assert(reg.filter(col("split") === "train" && col("masked_target").isNull).count() == 0)
    assert(reg.filter((col("_is_test") && col("split") === "test") ||
      (!col("_is_test") && col("split") === "train")).count() == 180)
    val foldSeries = reg.groupBy("fold_id", "split")
      .agg(countDistinct("group_col").as("n")).collect()
    assert(foldSeries.length == 4 && foldSeries.forall(_.getLong(2) == 2),
      "both series in every (fold, split)")
  }

  private def fcScalar(values: Seq[Double], h: Int, m: String): Forecast.Output =
    Forecast.forecast(values.toArray, Array.fill(values.length)(true),
      Forecast.Options(model = Forecast.canonicalModel(m), horizon = h,
        autoDetectSeasonality = false))

  private val trendUp = Seq(10.0, 12.0, 14.0, 16.0, 18.0, 20.0, 22.0, 24.0, 26.0, 28.0)

  test("ETS state-space contract (ts_forecast_statespace.test:73-150)") {
    val out = fcScalar(trendUp, 3, "ETS")
    assert(out.modelName.startsWith("ETS"))
    assert(fcScalar(trendUp, 5, "ETS").point.length == 5)
    assert(out.point(0) > 25.0, "trending data forecasts above recent level")
    assert(out.point(1) > out.point(0), "forecast keeps increasing on trend")
    assert(out.lower(0) <= out.point(0) && out.upper(0) >= out.point(0))
    assert(fcScalar(trendUp, 3, "ets").modelName.startsWith("ETS"), "case-insensitive")
    val const = fcScalar(Seq.fill(10)(50.0), 3, "ETS")
    assert(math.abs(const.point(0) - 50.0) < 2.0)
    val fitted = Forecast.forecast(trendUp.toArray, Array.fill(10)(true),
      Forecast.Options(model = "ETS", horizon = 3, autoDetectSeasonality = false,
        includeFitted = true, includeResiduals = true))
    assert(fitted.fitted.exists(_.length == 10))
    assert(fitted.residuals.exists(_.length == 10))
  }

  test("ARIMA state-space contract (ts_forecast_statespace.test:155-200)") {
    val out = fcScalar(trendUp, 3, "ARIMA")
    assert(out.modelName.startsWith("ARIMA"))
    assert(fcScalar(trendUp, 5, "ARIMA").point.length == 5)
    assert(out.point(0) > 28.0, "trend continues above the last value")
    assert(out.point(1) > out.point(0))
    val down = Seq(50.0, 48.0, 46.0, 44.0, 42.0, 40.0, 38.0, 36.0, 34.0, 32.0)
    assert(fcScalar(down, 3, "ARIMA").point(0) < 32.0)
  }

  test("MFLES stays bounded on high-CV intermittent data (ts_forecast_mfles_stability.test, issue #168)") {
    val demand = (0 until 38).map { i =>
      if (i % 6 == 2) 5.0 + (i % 13).toDouble
      else if (i % 6 == 0) 3.0 + (i % 7).toDouble
      else 0.0
    }
    Seq("MFLES", "AutoMFLES").foreach { m =>
      val out = fcScalar(demand, 6, m)
      out.point.foreach { v =>
        assert(!v.isNaN && !v.isInfinite)
        assert(math.abs(v) < 1000.0, s"$m catastrophic forecast: $v")
      }
    }
  }
}

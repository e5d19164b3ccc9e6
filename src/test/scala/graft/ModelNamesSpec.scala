package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Forecast

/** Port of test/sql/ts_native_model_names.test (#167 regression): every model
  * reports its own model_name through the forecast and CV-forecast paths —
  * fixed models echo the requested name exactly, Auto* models carry the Auto
  * prefix (selection suffix allowed), and unknown names error identically on
  * both paths.
  */
class ModelNamesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-model-names")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // trend + weekly seasonality, 60 points (model_name_data G1)
  private val trendSeasonal: Seq[Double] =
    (0 until 60).map(i => 10.0 + i * 0.5 + math.sin(i * 3.14159 / 7) * 3.0)
  // spiky intermittent demand (model_name_intermittent I1)
  private val intermittent: Seq[Double] =
    (0 until 60).map(i => if (i % 5 == 0) 10.0 else 0.0)

  private def name(values: Seq[Double], m: String): String =
    Forecast.forecast(values.toArray, Array.fill(values.length)(true),
      Forecast.optionsFromParams(m, 3, Map.empty)).modelName

  test("fixed models echo their name exactly (ts_native_model_names.test:70-256)") {
    val continuous = Seq("Naive", "SMA", "SeasonalNaive", "SES", "SESOptimized",
      "RandomWalkDrift", "Holt", "HoltWinters", "SeasonalES", "SeasonalESOptimized",
      "SeasonalWindowAverage", "Theta", "OptimizedTheta", "DynamicTheta",
      "DynamicOptimizedTheta", "ETS", "ARIMA", "MFLES", "MSTL", "TBATS")
    continuous.foreach(m => assert(name(trendSeasonal, m) == m, s"model $m"))
    val sparse = Seq("CrostonClassic", "CrostonOptimized", "CrostonSBA",
      "TSB", "ADIDA", "IMAPA")
    sparse.foreach(m => assert(name(intermittent, m) == m, s"model $m"))
  }

  test("Auto models carry the Auto prefix (ts_native_model_names.test:258-296)") {
    assert(name(trendSeasonal, "AutoETS").startsWith("AutoETS"))
    assert(name(trendSeasonal, "AutoARIMA").startsWith("AutoARIMA"))
    assert(name(trendSeasonal, "AutoTheta").startsWith("AutoTheta"))
    assert(name(trendSeasonal, "AutoMFLES") == "AutoMFLES")
    assert(name(trendSeasonal, "AutoMSTL") == "AutoMSTL")
    assert(name(trendSeasonal, "AutoTBATS").startsWith("AutoTBATS"))
  }

  test("cv forecast path propagates model_name (ts_native_model_names.test:300-415)") {
    val s = spark
    import s.implicits._
    val df = (0 until 60).map { i =>
      ("G1", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        10.0 + i * 0.5 + math.sin(i * 3.14159 / 7) * 3.0)
    }.toDF("id", "ds", "y")
    val folds = ops.TsCvOp.cvFoldsBy(df, "id", "ds", "y", 1, 3)
    Seq("Naive", "SESOptimized", "HoltWinters", "OptimizedTheta", "ETS",
      "ARIMA", "MSTL").foreach { m =>
      val names = ops.TsCvOp.cvForecastBy(folds, "id", "ds", "y", m)
        .filter(org.apache.spark.sql.functions.col("split") === "test")
        .select("model_name").distinct().collect().map(_.getString(0)).toSeq
      assert(names == Seq(m), s"model $m → $names")
    }
    val auto = ops.TsCvOp.cvForecastBy(folds, "id", "ds", "y", "AutoARIMA")
      .filter(org.apache.spark.sql.functions.col("split") === "test")
      .select("model_name").distinct().collect().map(_.getString(0))
    assert(auto.length == 1 && auto(0).startsWith("AutoARIMA"))
  }

  test("unknown model errors identically on both paths (ts_native_model_names.test:420-446)") {
    Seq("AIDA", "NotAModel").foreach { bad =>
      val e = intercept[Forecast.InvalidModel](name(trendSeasonal, bad))
      assert(e.getMessage.contains(s"Unknown model: $bad"))
      val e2 = intercept[Forecast.InvalidModel](
        Forecast.optionsFromParams(bad, 1, Map.empty))
      assert(e2.getMessage.contains("Unknown model"))
    }
  }
}

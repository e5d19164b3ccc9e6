package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference's complete scalar-function surface (src/scalar_functions/
  * metrics.cpp, conformal.cpp, bootstrap.cpp registration names) is reachable
  * from Spark SQL, each under its own name and the anofox_fcst_ alias.
  */
class SqlScalarSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-sql-surface")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.Register.registerAll(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one(sql: String): Any = spark.sql(s"SELECT $sql AS v").collect()(0).get(0)

  test("every reference scalar name is registered (extension registration list)") {
    val names = Seq("ts_mae", "ts_mse", "ts_rmse", "ts_mape", "ts_smape", "ts_mase",
      "ts_r2", "ts_bias", "ts_rmae", "ts_quantile_loss", "ts_mqloss", "ts_coverage",
      "ts_mean_interval_width", "ts_conformal_quantile", "ts_conformal_intervals",
      "ts_conformal_predict", "ts_conformal_predict_asymmetric",
      "ts_conformal_predict_per_step", "ts_conformal_learn", "ts_conformal_apply",
      "ts_conformal_coverage", "ts_conformal_evaluate", "ts_bootstrap_intervals",
      "ts_bootstrap_quantiles", "ts_estimate_backtest_memory")
    val registered = spark.catalog.listFunctions().collect().map(_.name).toSet
    names.foreach { n =>
      assert(registered.contains(n), s"$n not registered")
      assert(registered.contains("anofox_fcst_" + n.stripPrefix("ts_")), s"$n alias missing")
    }
  }

  test("new conformal scalars compute correct values") {
    // coverage: 2 of 3 inside
    assert(one("ts_conformal_coverage(array(1.0, 5.0, 9.0), array(0.0, 4.0, 10.0), array(2.0, 6.0, 11.0))")
      == 2.0 / 3.0)
    // evaluate returns the 5-field struct
    val ev = spark.sql(
      """SELECT ts_conformal_evaluate(array(1.0, 5.0), array(0.0, 4.0),
        |array(2.0, 6.0), 0.1) AS v""".stripMargin).collect()(0).getStruct(0)
    assert(ev.getDouble(0) == 1.0) // coverage
    assert(ev.getDouble(2) == 2.0) // mean width
    assert(ev.getLong(4) == 2L)    // n observations
    // per-step: step quantiles applied per horizon position
    val ps = spark.sql(
      """SELECT ts_conformal_predict_per_step(
        |array(array(-1.0, 1.0), array(-2.0, 2.0)), array(10.0, 20.0), 0.1) AS v""".stripMargin)
      .collect()(0).getStruct(0)
    assert(ps.getSeq[Double](0).length == 2 && ps.getSeq[Double](1).length == 2)
    // mqloss over two quantile tracks
    val mq = one("ts_mqloss(array(1.0, 2.0), array(array(1.0, 2.0), array(1.0, 2.0)), array(0.1, 0.9))")
    assert(mq == 0.0)
    // bootstrap quantiles: monotone in quantile level
    val bq = spark.sql(
      """SELECT ts_bootstrap_quantiles(array(-1.0, 0.0, 1.0), array(10.0, 10.0),
        |50, array(0.1, 0.9), 42) AS v""".stripMargin).collect()(0).getSeq[scala.collection.Seq[Double]](0)
    assert(bq.length == 2 && bq(0).zip(bq(1)).forall { case (lo, hi) => lo <= hi })
  }

  test("extended-seasonality scalars: reference names, arities, struct fields") {
    // sinusoid, period 7, 70 points
    val sine = "transform(sequence(0, 69), i -> 10.0 * sin(i * 2 * pi() / 7.0))"
    // ts_analyze_seasonality: 1-arg and the (timestamps, values) overload
    val a = spark.sql(s"SELECT ts_analyze_seasonality($sine) AS v")
      .selectExpr("v.detected_periods", "v.primary_period",
        "v.seasonal_strength", "v.trend_strength").collect()(0)
    assert(a.getInt(1) == 7, s"primary_period: $a")
    assert(a.getDouble(2) > 0.3)
    val a2 = spark.sql(
      s"""SELECT ts_analyze_seasonality(
         |  transform(sequence(0, 69), i -> timestamp_seconds(86400 * i)),
         |  $sine) AS v""".stripMargin)
      .selectExpr("v.primary_period").collect()(0)
    assert(a2.getInt(0) == 7, "timestamps overload must ignore timestamps")
    // ts_seasonal_strength_windowed: default window 2·period steps by period
    val w = spark.sql(s"SELECT ts_seasonal_strength_windowed($sine, 7) AS v")
      .collect()(0).getSeq[Double](0)
    assert(w.length == (70 - 14) / 7 + 1, s"windows: ${w.length}")
    assert(w.forall(s => s > 0.3 && s <= 1.0))
    val wErr = intercept[Exception] {
      spark.sql(s"SELECT ts_seasonal_strength_windowed($sine, 7, 14, 'spectral') AS v")
        .collect()
    }
    val chain = Iterator.iterate[Throwable](wErr)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("not supported"), chain)
    // ts_detect_seasonality_changes: seasonal half then flat half → cessation
    val fading =
      "transform(sequence(0, 69), i -> if(i < 35, 10.0 * sin(i * 2 * pi() / 7.0), 0.0))"
    val ch = spark.sql(s"SELECT ts_detect_seasonality_changes($fading, 7) AS v")
      .selectExpr("v.n_changes", "v.change_points", "v.strength_curve").collect()(0)
    assert(ch.getLong(0) >= 1L, s"no change detected: $ch")
    val cps = ch.getSeq[org.apache.spark.sql.Row](1)
    assert(cps.exists(_.getString(2) == "cessation"),
      s"expected a cessation change point: $cps")
    assert(cps.forall(cp => cp.getDouble(1) == cp.getLong(0).toDouble),
      "time must equal index (seasonality.rs:188-196)")
    assert(ch.getSeq[Double](2).nonEmpty)
    // ts_instantaneous_period: per-point estimates near the true period
    val ip = spark.sql(
      "SELECT ts_instantaneous_period(transform(sequence(0, 63), i -> sin(i * 2 * pi() / 8.0))) AS v")
      .selectExpr("v.periods", "v.frequencies", "v.amplitudes").collect()(0)
    val periods = ip.getSeq[Double](0)
    assert(periods.length == 64 && ip.getSeq[Double](1).length == 64 &&
      ip.getSeq[Double](2).length == 64)
    val mid = periods.slice(16, 48).sorted.apply(16)
    assert(math.abs(mid - 8.0) < 1.0, s"median instantaneous period $mid")
    // ts_detect_amplitude_modulation: growing envelope → emerging
    val growing =
      "transform(sequence(0, 69), i -> (1.0 + i / 20.0) * sin(i * 2 * pi() / 7.0))"
    val am = spark.sql(s"SELECT ts_detect_amplitude_modulation($growing, 7) AS v")
      .selectExpr("v.is_seasonal", "v.has_modulation", "v.modulation_type",
        "v.wavelet_amplitude", "v.time_points", "v.scale").collect()(0)
    assert(am.getBoolean(0) && am.getBoolean(1), s"modulation missed: $am")
    assert(am.getString(2) == "emerging")
    assert(am.getSeq[Double](3).length == 10 && am.getSeq[Double](4).length == 10)
    assert(am.getDouble(5) == 7.0)
    // alias surface
    assert(spark.sql(s"SELECT anofox_fcst_analyze_seasonality($sine) AS v")
      .selectExpr("v.primary_period").collect()(0).getInt(0) == 7)
    // short series → NULL (not a job-aborting require), like every sibling:
    // a 3-point group is data the surface tolerates, not a config error
    for (fn <- Seq("ts_seasonal_strength_windowed(array(1.0, 2.0, 3.0), 7)",
      "ts_detect_seasonality_changes(array(1.0, 2.0, 3.0), 7)",
      "ts_detect_seasonality_changes(array(1.0, 2.0, 3.0, 4.0, 5.0), 7)",
      "ts_analyze_seasonality(array(1.0, 2.0))",
      "ts_instantaneous_period(array(1.0, 2.0, 3.0))",
      "ts_detect_amplitude_modulation(array(1.0, 2.0, 3.0), 7)")) {
      assert(spark.sql(s"SELECT $fn AS v").collect()(0).isNullAt(0),
        s"$fn must be NULL on insufficient data")
    }
  }

  test("features config scalars parse real configs into the reference struct") {
    val j = spark.sql(
      """SELECT ts_features_config_from_json('["mean", "std_dev"]') AS v""")
      .selectExpr("v.feature_names", "v.overrides").collect()(0)
    assert(j.getSeq[String](0) == Seq("mean", "std_dev"))
    val ov = j.getSeq[org.apache.spark.sql.Row](1)
    assert(ov.map(r => (r.getString(0), r.getString(1))) ==
      Seq(("mean", "{}"), ("std_dev", "{}")))
    // the reference's documented one-line comma form (ts_features.cpp:452)
    val c = spark.sql("SELECT ts_features_config_from_csv('mean,std_dev,skewness') AS v")
      .selectExpr("v.feature_names").collect()(0)
    assert(c.getSeq[String](0) == Seq("mean", "std_dev", "skewness"))
    // parsed config == what ts_features_from_csv applies (shared parser)
    assert(graft.ops.TsFeaturesOp.parseCsvConfig("feature\nsum\nrange") ==
      Seq("sum", "range"))
    // a single-row line-grammar config "feature,params_json" must keep
    // parsing as ONE feature (the params cell is a payload, not a name)
    assert(graft.ops.TsFeaturesOp.parseCsvConfig("mean,{}") == Seq("mean"))
    // a comma INSIDE the params json must not fragment into bogus names
    assert(graft.ops.TsFeaturesOp.parseCsvConfig("""mean,{"k": 1, "j": 2}""") ==
      Seq("mean"))
  }

  test("ts_detect_multiple_periods returns (period, confidence, iteration) rows") {
    val out = spark.sql(
      """SELECT ts_detect_multiple_periods(
        |  transform(sequence(0, 63), i -> 10.0 + sin((i + 1) * 2 * pi() / 8.0))) AS v""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(out.nonEmpty)
    assert(math.abs(out.head.getDouble(0) - 8.0) < 0.5)
    assert(out.head.getInt(2) == 1)
  }

  test("learn/apply round-trips margins") {
    val out = spark.sql(
      """SELECT ts_conformal_apply(array(10.0, 20.0), l.v._3, l.v._4, l.v._5) AS v
        |FROM (SELECT ts_conformal_learn(array(-2.0, -1.0, 1.0, 2.0), array(0.1),
        |  'symmetric', 'split') AS v) l""".stripMargin).collect()(0).getStruct(0)
    val lows = out.getSeq[scala.collection.Seq[Double]](0)
    val his = out.getSeq[scala.collection.Seq[Double]](1)
    assert(lows.length == 1 && lows(0).length == 2)
    assert(lows(0)(0) < 10.0 && his(0)(0) > 10.0)
  }
}

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

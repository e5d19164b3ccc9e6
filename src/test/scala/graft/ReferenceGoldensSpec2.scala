package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Stats
import graft.ops.{TsPrep, TsStatsOp}

/** Second golden batch from the reference corpus: ts_stats.test (scalar
  * stats + calendar-frequency expected_length/n_gaps) and
  * ts_imputation.test (null-fill table macros). */
class ReferenceGoldensSpec2 extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-reference-goldens-2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def st(values: Seq[java.lang.Double]): Stats.TsStats =
    Stats.compute(values.map(v => if (v == null) Double.NaN else v.doubleValue()).toArray,
      values.map(_ != null).toArray)

  private def d(xs: Double*): Seq[java.lang.Double] = xs.map(java.lang.Double.valueOf)

  test("_ts_stats scalar goldens (ts_stats.test:53-137)") {
    val s5 = st(d(1, 2, 3, 4, 5))
    assert(s5.length == 5)
    assert(s5.mean == 3.0)
    assert(s5.median == 3.0)
    assert(s5.min == 1.0)
    assert(s5.max == 5.0)
    assert(s5.range == 4.0)
    assert(s5.sum == 15.0)
    assert(st(d(0, 1, 0, 2, 0)).n_zeros == 3)
    assert(st(d(-1, 0, 1, 2, 3)).n_positive == 3)
    assert(st(d(-2, -1, 0, 1, 2)).n_negative == 2)
    assert(math.abs(s5.skewness) < 0.1)
    assert(st((1 to 10).map(i => java.lang.Double.valueOf(i.toDouble))).autocorr_lag1 > 0)
    assert(st(d(5)).length == 1)
    assert(st(d(3, 3, 3, 3, 3)).variance == 0.0)
    assert(st(Seq[java.lang.Double](1.0, null, 3.0, null, 5.0)).n_nulls == 2)
  }

  test("ts_stats_by calendar frequencies: expected_length and n_gaps " +
      "(ts_stats.test:170-245, issue #147 bugs 2-3)") {
    val s = spark
    import s.implicits._
    // Jan..Dec 2023 monthly, complete → 12/12, 0 gaps
    val complete = (1 to 12).map(m =>
      ("series_1", java.sql.Date.valueOf(f"2023-$m%02d-15"), 100.0 + m * 10))
      .toDF("g", "ds", "y")
    val rc = TsStatsOp.statsBy(complete, "g", "ds", "y", "1mo")
      .select("length", "expected_length", "n_gaps").collect()(0)
    assert(rc.getLong(0) == 12 && rc.getLong(1) == 12 && rc.getLong(2) == 0)
    // Jan, Feb, Mar, May, Jun → length 5, expected 6, 1 gap
    val gapped = Seq(1, 2, 3, 5, 6).map(m =>
      ("series_1", java.sql.Date.valueOf(f"2023-$m%02d-15"), 100.0 + m * 10))
      .toDF("g", "ds", "y")
    val rg = TsStatsOp.statsBy(gapped, "g", "ds", "y", "1mo")
      .select("length", "expected_length", "n_gaps").collect()(0)
    assert(rg.getLong(0) == 5 && rg.getLong(1) == 6 && rg.getLong(2) == 1)
    // quarterly Q1-Q4 complete → 4/4
    val quarterly = (1 to 4).map(q =>
      ("product_A", java.sql.Date.valueOf(f"2023-${(q - 1) * 3 + 1}%02d-01"), 1000.0 + q * 100))
      .toDF("g", "ds", "y")
    val rq = TsStatsOp.statsBy(quarterly, "g", "ds", "y", "1q")
      .select("length", "expected_length").collect()(0)
    assert(rq.getLong(0) == 4 && rq.getLong(1) == 4)
  }

  /** impute_test fixture (ts_imputation.test:12-18): values 1, ∅, 3, ∅, 5. */
  private def imputeFixture: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(("A", 1, Some(1.0)), ("A", 2, Option.empty[Double]), ("A", 3, Some(3.0)),
      ("A", 4, Option.empty[Double]), ("A", 5, Some(5.0))).toDF("id", "date", "val")
  }

  test("null-fill goldens (ts_imputation.test:24-80)") {
    val cst = TsPrep.fillNullsConstBy(imputeFixture, "id", "date", "val", 0.0)
    assert(cst.count() == 5)
    assert(cst.filter(col("filled_value").isNull).count() == 0)
    assert(cst.agg(sum("filled_value")).collect()(0).getDouble(0) == 9.0)

    val fwd = TsPrep.fillNullsForwardBy(imputeFixture, "id", "date", "val")
    assert(fwd.count() == 5)
    assert(fwd.filter(col("filled_value").isNull).count() == 0)
    // second row forward-fills to 1.0
    assert(fwd.orderBy("date").collect()(1).getAs[Double]("filled_value") == 1.0)

    val bwd = TsPrep.fillNullsBackwardBy(imputeFixture, "id", "date", "val")
    assert(bwd.count() == 5)
    // second row backward-fills to 3.0
    assert(bwd.orderBy("date").collect()(1).getAs[Double]("filled_value") == 3.0)

    val mean = TsPrep.fillNullsMeanBy(imputeFixture, "id", "date", "val")
    // group mean of {1,3,5} = 3.0 fills both nulls
    assert(mean.orderBy("date").collect()(1).getAs[Double]("filled_value") == 3.0)
  }
}

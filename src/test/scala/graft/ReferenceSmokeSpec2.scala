package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Hierarchy, TsCvOp, TsFeaturesOp, TsPrep}

/** Second smoke batch: ts_cv_folds.test (fold sizing + ds type/name
  * preservation), ts_mark_unknown.test, ts_aggregate_hierarchy.test
  * (level totals), ts_features_config.test (catalog names in the parsed
  * config).
  */
class ReferenceSmokeSpec2 extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-reference-smoke2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def day(i: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(i))

  test("ts_cv_folds.test: expanding folds size train/test exactly (:20-33)") {
    val s = spark
    import s.implicits._
    val df = (0 until 24).map(i => ("S", day(i), i + 1.0)).toDF("series_id", "ds", "y")
    val folds = TsCvOp.cvFoldsBy(df, "series_id", "ds", "y", 2, 6)
    val sizes = folds.groupBy(col("fold_id"), col("split")).count()
      .orderBy("fold_id", "split")
      .collect().map(r => (r.getAs[Any]("fold_id").toString.toInt, r.getString(1), r.getLong(2)))
    assert(sizes.toSeq == Seq((1, "test", 6L), (1, "train", 12L),
      (2, "test", 6L), (2, "train", 18L)), sizes.toSeq)
  }

  test("ts_cv_folds.test: ds type preserved across DATE/TIMESTAMP/INT/BIGINT (:48-89)") {
    val s = spark
    import s.implicits._
    val base = (0 until 12).map(i => ("S", i, i + 1.0)).toDF("series_id", "step", "y")
    def dsOf(df: org.apache.spark.sql.DataFrame) =
      TsCvOp.cvFoldsBy(df, "series_id", "ds", "y", 1, 3).schema("ds").dataType
    assert(dsOf(base.withColumn("ds", date_add(lit(day(0)), col("step")))) == DateType)
    assert(dsOf(base.withColumn("ds", to_timestamp(date_add(lit(day(0)), col("step")))))
      == TimestampType)
    assert(dsOf(base.withColumn("ds", col("step"))) == IntegerType)
    assert(dsOf(base.withColumn("ds", col("step").cast(LongType))) == LongType)
  }

  test("ts_cv_folds.test: caller's column names flow through (:92-123)") {
    val s = spark
    import s.implicits._
    val df = (0 until 8).map(i => ("A", day(i), i + 1.0))
      .toDF("my_group", "my_date", "my_value")
    val folds = TsCvOp.cvFoldsBy(df, "my_group", "my_date", "my_value", 1, 2)
    Seq("my_group", "my_date", "my_value").foreach(c =>
      assert(folds.columns.contains(c), c))
  }

  test("ts_mark_unknown.test: cutoff flags future rows, keeps all columns (:32-57)") {
    val s = spark
    import s.implicits._
    val df = (0 until 5).flatMap(i =>
      Seq(("A", day(i), (i + 1) * 1.0, i % 2 == 0), ("B", day(i), (i + 1) * 10.0, false)))
      .toDF("series_id", "date", "value", "is_holiday")
    val out = TsPrep.markUnknownBy(df, "series_id", "date", "2023-01-03")
    assert(out.count() == 10)
    assert(out.filter(col("is_unknown")).count() == 4)
    assert(out.filter(!col("is_unknown")).count() == 6)
    assert(out.filter(col("value").isNotNull && col("is_holiday").isNotNull).count() == 10)
    assert(out.columns.contains("last_known_date"))
  }

  test("ts_aggregate_hierarchy.test: every level total equals the leaf total") {
    val s = spark
    import s.implicits._
    val df = (for {
      region <- Seq("na", "eu"); store <- Seq("s1", "s2"); i <- 0 until 5
    } yield (region, store, day(i), 10.0)).toDF("region", "store", "ds", "y")
    val out = Hierarchy.aggregateHierarchy(df, "ds", "y", Seq("region", "store"))
    val leafTotal = 2 * 2 * 5 * 10.0
    // every prefix level sums to the same grand total (no double counting)
    val totals = out.groupBy(col("level")).agg(sum("y").as("t"))
      .collect().map(r => r.getAs[Any]("level").toString -> r.getDouble(1)).toMap
    assert(totals.size == 3)
    totals.values.foreach(t => assert(math.abs(t - leafTotal) < 1e-9, totals))
  }

  test("ts_features_config.test: parsed config carries catalog names (:14-73)") {
    val tpl = TsFeaturesOp.configTemplate(spark)
      .select("feature").collect().map(_.getString(0)).toSet
    Seq("mean", "variance", "length").foreach(f =>
      assert(tpl.contains(f), s"template missing $f"))
    assert(tpl.size >= 100)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Port of test/sql/ts_parallel_correctness.test, re-expressed for Spark's
  * execution model: results must be bit-identical regardless of input
  * partitioning (the reference's threads=N vs threads=1 contract maps to
  * partition count here — the invariant a 1000-executor cluster relies on).
  */
class ParallelCorrectnessSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-parallel-correctness")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 50 series × 60 days (ts_parallel_correctness.test:14-21). */
  private def data: DataFrame = {
    val s = spark
    import s.implicits._
    (1 to 50).flatMap { series =>
      (0 until 60).map { day =>
        (f"series_$series%03d",
          java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(day)),
          100.0 + series * 10.0 + day * 0.5 + (day % 7) * 3.0)
      }
    }.toDF("unique_id", "ds", "y")
  }

  /** Level shift at day 30, 10 series (:131-141). */
  private def shifted: DataFrame = {
    val s = spark
    import s.implicits._
    (1 to 10).flatMap { series =>
      (0 until 60).map { day =>
        (f"series_$series%03d",
          java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(day)),
          (if (day < 30) 100.0 else 200.0) + series * 0.1)
      }
    }.toDF("unique_id", "ds", "y")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("\u0001"))
  }

  private def invariant(op: DataFrame => DataFrame, input: DataFrame): Unit = {
    val one = rows(op(input.repartition(1)))
    val many = rows(op(input.repartition(16)))
    assert(one.nonEmpty && one == many)
  }

  test("forecast_by invariant to partitioning (ts_parallel_correctness.test:30-75)") {
    invariant(ops.TsForecastOp.forecastBy(_, "unique_id", "ds", "y", "Naive", 7, "1d"), data)
  }

  test("fill_gaps_by invariant to partitioning (:78-120)") {
    val gappy = data.filter(!dayofmonth(col("ds")).isin(5, 15, 25))
    invariant(ops.TsPrep.fillGapsBy(_, "unique_id", "ds", "y", "1d"), gappy)
  }

  test("detect_changepoints_by invariant to partitioning (:124-170)") {
    invariant(ops.TsChangepointOp.detectChangepointsBy(_, "unique_id", "ds", "y"), shifted)
  }

  test("stats_by invariant to partitioning (:174-220)") {
    invariant(ops.TsStatsOp.statsBy(_, "unique_id", "ds", "y", "1d"), data)
  }

  test("backtest invariant to partitioning (:224-270)") {
    invariant(ops.TsCvOp.backtestAutoBy(_, "unique_id", "ds", "y", 7, 2, "1d",
      Map("method" -> "SeasonalNaive", "seasonal_period" -> "7"), "rmse"), data)
  }

  test("decompose_seasonal_by invariant to partitioning") {
    // NaN edge rows → null for the comparison (NaN != NaN under Seq equality)
    invariant(df => ops.TsDecompositionOp.decomposeSeasonalBy(df, "unique_id", "ds", "y", 7)
      .select(col("unique_id"), col("ds"), col("y"), col("seasonal"),
        when(isnan(col("trend")), lit(null)).otherwise(col("trend")).as("trend"),
        when(isnan(col("remainder")), lit(null)).otherwise(col("remainder")).as("remainder")),
      data)
  }

  test("cv_forecast_by invariant to partitioning") {
    invariant(df => ops.TsCvOp.cvForecastBy(
      ops.TsCvOp.cvFoldsBy(df, "unique_id", "ds", "y", 2, 7),
      "unique_id", "ds", "y", "SeasonalNaive", Map("seasonal_period" -> "7")), data)
  }

  test("dedup cluster resolution invariant to partitioning") {
    val s = spark
    import s.implicits._
    // chain + clique + isolated pairs, enough edges to span partitions
    val pairs = ((1L to 40L).sliding(2).map(w => (w(0), w(1))).toSeq ++
      Seq((100L, 101L), (100L, 102L), (101L, 102L), (200L, 201L)))
      .toDF("id_a", "id_b")
    invariant(llm.TextOps.dedupClusters(_), pairs)
  }

  test("dedupExact (hash-prefilter form) invariant to partitioning") {
    val s = spark
    import s.implicits._
    val docs = (1L to 120L).map(i => (i, s"doc content ${i % 37}"))
      .toDF("doc_id", "text")
    invariant(llm.TextOps.dedupExact(_, Seq("text"), "doc_id"), docs)
  }

  test("persisted IVF probe invariant to corpus partitioning at write time") {
    val s = spark
    import s.implicits._
    val corpus = (0 until 60)
      .map(i => (i.toLong, Array.tabulate(6)(j => math.sin(i * (j + 2)).abs + 0.1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    def probe(c: DataFrame): DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-inv").toString
      llm.SimilarityOps.ivfWriteIndex(c, "vec_id", "embedding", nLists = 6, dir)
      llm.SimilarityOps.ivfProbeIndex(s, dir, queries, "vec_id", "embedding",
        k = 5, nProbe = 6)
    }
    invariant(probe, corpus)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.QuantileOps

/** Exact top-fraction / top-k score selection (the two-phase sortable-bits
  * histogram) against the brute-force sorted reference. */
class QuantileOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-quantile-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic score mix: positives, negatives, zeros, exact ties. */
  private def scored = {
    val sp = spark
    import sp.implicits._
    (0L until 500L).map { i =>
      val s =
        if (i % 97 == 0) 0.0                       // tied zeros
        else if (i % 5 == 0) -((i % 13).toDouble)  // tied negatives
        else math.sin(i.toDouble) * 100.0          // spread doubles
      (i, s)
    }.toDF("id", "score")
  }

  private def refTopK(k: Int, highest: Boolean): Set[Long] = {
    val rows = scored.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val sorted =
      if (highest) rows.sortBy { case (id, s) => (-s, id) }
      else rows.sortBy { case (id, s) => (s, id) }
    sorted.take(k).map(_._1).toSet
  }

  test("selectTopK equals the sorted reference (highest and lowest, with ties)") {
    for (k <- Seq(0, 1, 37, 250, 499, 500, 600); hi <- Seq(true, false)) {
      val got = QuantileOps.selectTopK(scored, "id", "score", k, highest = hi)
        .collect().map(_.getLong(0)).toSet
      assert(got == refTopK(k, hi), s"k=$k highest=$hi")
    }
  }

  test("filterTopFraction keeps floor(frac*N), drops null/NaN scores, partition-invariant") {
    val sp = spark
    import sp.implicits._
    val withBad = scored.unionByName(
      Seq((1000L, Double.NaN), (1001L, 0.0 / 0.0)).toDF("id", "score"))
      .unionByName(Seq(1002L).toDF("id").withColumn("score", lit(null).cast("double")))
    val out = QuantileOps.filterTopFraction(withBad, "id", "score", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(out == refTopK(150, highest = true)) // floor(0.3 * 500) over rankable rows
    assert(!out.exists(_ >= 1000L))
    val out7 = QuantileOps.filterTopFraction(withBad.repartition(7), "id", "score", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(out7 == out)
    assert(QuantileOps.filterTopFraction(scored, "id", "score", 0.0).count() == 0)
    assert(QuantileOps.filterTopFraction(scored, "id", "score", 1.0).count() == 500)
  }

  test("cutoff ties break by id ascending") {
    val sp = spark
    import sp.implicits._
    val tied = (0L until 100L).map(i => (i, 5.0)).toDF("id", "score")
    val got = QuantileOps.selectTopK(tied, "id", "score", 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 10L).toSet)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.QuantileOps

/** Round-10: KLL summary persistence + shard merge (VERDICT r9 #5 — the
  * restartable-ingest gap: HLL and Count-Min had write/read + shard-merge,
  * the score-distribution sketch did not).
  *
  * EXACT regime (capacity ≥ total): no compaction fires anywhere, so the
  * persisted-shard merge must be BIT-IDENTICAL to the single-pass sketch
  * — same items, same n, err = 0, and every quantile the literal order
  * statistic. APPROXIMATE regime: per-shard compactions make the merged
  * items layout-dependent, so the pin is the mergeable-summaries
  * invariant — the summed err bound holds against true ranks. */
class KllPersistSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-kll-persist")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("kll_persist").toString

  test("exact regime: persisted shard merge == single-pass sketch, quantiles exact") {
    val sp = spark
    import sp.implicits._
    // deterministic scores, 4 shards of 250
    val scored = (1 to 1000).map(i => (i.toLong, (i * 37 % 991) * 0.5))
      .toDF("id", "score")
    val qs = Seq(0.25, 0.5, 0.9, 1.0)

    val shards = scored.withColumn("group", pmod(col("id"), lit(4)))
    val dir = tmp()
    QuantileOps.writeKllSketch(
      QuantileOps.sketchSummaryBy(shards, "group", "score", capacity = 4096), dir)
    val merged = QuantileOps.mergeKllSummaries(
      QuantileOps.readKllSketch(spark, dir), Seq.empty, capacity = 4096)

    // merged summary == the single-pass summary, item for item
    val single = QuantileOps.sketchSummary(scored, "score", capacity = 4096)
      .collect()(0)
    val m = merged.collect()(0)
    assert(m.getLong(m.fieldIndex("n")) === 1000L)
    assert(m.getLong(m.fieldIndex("err")) === 0L)
    assert(m.getSeq[Any](m.fieldIndex("items")) ===
      single.getSeq[Any](single.fieldIndex("items")))

    // quantiles from the merged summary == direct sketch == order stats
    val got = QuantileOps.quantilesFromSummary(merged, qs)
      .orderBy("q").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val direct = QuantileOps.scoreQuantilesSketch(scored, "score", qs,
      capacity = 4096).orderBy("q").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got === direct)
    val sorted = scored.select(round(col("score"), 6)).collect()
      .map(_.getDouble(0)).sorted
    qs.zip(got).foreach { case (q, (_, v)) =>
      val target = math.max(1, math.ceil(q * 1000).toInt)
      assert(v === sorted(target - 1), s"q=$q must be the exact order statistic")
    }
  }

  test("exact regime: per-group merge keeps groups independent") {
    val sp = spark
    import sp.implicits._
    val scored = (1 to 600).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble)).toDF("id", "g", "score")
    val dir = tmp()
    // shard WITHIN group: (g, shard) summaries, then merge back per g
    val perShard = QuantileOps.sketchSummaryBy(
      scored.withColumn("group", concat(col("g"), lit(":"), pmod(col("id"), lit(3)))),
      "group", "score", capacity = 2048)
      .withColumn("g", substring(col("group"), 1, 1))
    QuantileOps.writeKllSketch(perShard, dir)
    val merged = QuantileOps.mergeKllSummaries(
      QuantileOps.readKllSketch(spark, dir), Seq("g"), capacity = 2048)
    val med = QuantileOps.quantilesFromSummary(merged, Seq(0.5), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // group a = evens 2..600 (n=300, rank 150 → 300.0); b = odds 1..599
    assert(med("a") === 300.0)
    assert(med("b") === 299.0)
  }

  test("approximate regime: merged err bound holds against true ranks") {
    val sp = spark
    import sp.implicits._
    // 20k skewed scores, capacity 128 → heavy compaction in every shard
    val scored = (1 to 20000).map { i =>
      val v = if (i % 10 == 0) i * 0.001 else math.log(i.toDouble) * 7.3
      (i.toLong, v)
    }.toDF("id", "score")
    val dir = tmp()
    QuantileOps.writeKllSketch(
      QuantileOps.sketchSummaryBy(
        scored.withColumn("group", pmod(col("id"), lit(8))),
        "group", "score", capacity = 128), dir)
    val merged = QuantileOps.mergeKllSummaries(
      QuantileOps.readKllSketch(spark, dir), Seq.empty, capacity = 128)
    val row = merged.collect()(0)
    val n = row.getLong(row.fieldIndex("n"))
    val err = row.getLong(row.fieldIndex("err"))
    assert(n === 20000L)
    assert(err > 0L, "capacity 128 over 20k rows must compact")
    assert(err < n / 4, s"bound must stay far under n, got $err")

    val sorted = scored.select(round(col("score"), 6)).collect()
      .map(_.getDouble(0)).sorted
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    QuantileOps.quantilesFromSummary(merged, qs).collect().foreach { r =>
      val q = r.getDouble(r.fieldIndex("q"))
      val v = r.getDouble(r.fieldIndex("value"))
      val target = math.max(1L, math.ceil(q * n).toLong)
      // true rank range of the returned value in the sorted input
      val lo = sorted.indexWhere(_ >= v) + 1
      val hi = sorted.lastIndexWhere(_ <= v) + 1
      val dist = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(dist <= err, s"q=$q value=$v true-rank distance $dist > err $err")
    }
  }
}

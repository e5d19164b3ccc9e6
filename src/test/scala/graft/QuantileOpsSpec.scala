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

  /** The op's documented rank key: the 6-decimal-rounded score (Spark's
    * round = shortest-decimal BigDecimal, HALF_UP; NaN/∞ pass through). */
  private def r6(s: Double): Double =
    if (s.isNaN || s.isInfinite) s
    else BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def refTopK(k: Int, highest: Boolean): Set[Long] = {
    val rows = scored.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val sorted =
      if (highest) rows.sortBy { case (id, s) => (-r6(s), id) }
      else rows.sortBy { case (id, s) => (r6(s), id) }
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

  test("withExactRank equals the sorted reference; quantileBuckets is balanced") {
    val ref = scored.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (r6(s), id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val got = QuantileOps.withExactRank(scored.repartition(7), "id", "score")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(got == ref)
    // descending rank mirrors: rank_desc = N + 1 - rank_asc only when scores
    // are distinct; with ties the id tiebreak keeps both orders deterministic
    val desc = QuantileOps.withExactRank(scored, "id", "score", ascending = false)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(desc.values.toSeq.sorted == (1L to 500L))
    val buckets = QuantileOps.quantileBuckets(scored, "id", "score", 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    assert(buckets.values.forall(b => b >= 0 && b < 3))
    // balanced: floor((rank-1)*3/500) — sizes 167/167/166
    val sizes = buckets.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(0L -> 167, 1L -> 167, 2L -> 166), sizes.toString)
    assert(buckets.toSeq.map { case (id, b) => (ref(id), b) }
      .forall { case (r, b) => b == (r - 1) * 3 / 500 })
  }

  test("property: selectTopK equals sorted reference on adversarial doubles") {
    val sp = spark
    import sp.implicits._
    // generated via a fixed seed; includes ±Infinity, subnormals, exact
    // ties, and dense near-ties crossing bit-bucket boundaries
    val rnd = new scala.util.Random(12345)
    val pool: Array[Double] = Array(
      Double.PositiveInfinity, Double.NegativeInfinity, 0.0, -0.0,
      Double.MinPositiveValue, -Double.MinPositiveValue, 1e308, -1e308)
    val rows = (0L until 400L).map { i =>
      val s = (i % 4) match {
        case 0 => pool(rnd.nextInt(pool.length))
        case 1 => rnd.nextGaussian()
        case 2 => math.floor(rnd.nextGaussian() * 3) // heavy ties
        case _ => java.lang.Double.longBitsToDouble(
          (java.lang.Double.doubleToLongBits(1.5) & ~0xFFFL) | rnd.nextInt(16).toLong)
      }
      (i, s)
    }
    val df = rows.toDF("id", "score")
    for (k <- Seq(1, 50, 199, 400); hi <- Seq(true, false)) {
      // the rounded key collapses the dense near-ties and subnormals onto
      // shared values — exactly the id-tiebreak determinism the op promises
      val sorted =
        if (hi) rows.sortBy { case (id, s) => (-r6(s), id) }
        else rows.sortBy { case (id, s) => (r6(s), id) }
      val expect = sorted.take(k).map(_._1).toSet
      val got = QuantileOps.selectTopK(df, "id", "score", k, highest = hi)
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"k=$k highest=$hi")
    }
  }

  test("cutoff ties break by id ascending") {
    val sp = spark
    import sp.implicits._
    val tied = (0L until 100L).map(i => (i, 5.0)).toDF("id", "score")
    val got = QuantileOps.selectTopK(tied, "id", "score", 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 10L).toSet)
  }

  test("percentileByGroup is per-group cume_dist on the rounded score; ties share; NaN dropped") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 2.0), (4L, "a", 5.0),
      (5L, "b", 10.0), (6L, "b", 20.0),
      (7L, "b", Double.NaN),
      // rounds onto id 2/3's grid point → joins the same tie row
      (8L, "a", 2.0000001),
    ).toDF("id", "grp", "score")
    val got = QuantileOps.percentileByGroup(df, "grp", "id", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    // group a has 5 rows: 1.0 → 1/5; {2.0, 2.0, 2.0000001→2.0} → 4/5; 5.0 → 1
    assert(got(1L) == ("a", 1.0, 0.2))
    assert(got(2L) == ("a", 2.0, 0.8) && got(3L) == ("a", 2.0, 0.8) &&
      got(8L) == ("a", 2.0, 0.8))
    assert(got(4L) == ("a", 5.0, 1.0))
    // group b: the NaN row is gone, 2 rankable rows
    assert(!got.contains(7L))
    assert(got(5L) == ("b", 10.0, 0.5) && got(6L) == ("b", 20.0, 1.0))
    // partition invariance
    val again = QuantileOps.percentileByGroup(df.repartition(7), "grp", "id", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(again == got)

    // the composed gate keeps tie-closed top sets per group: top-10%
    // excludes group a's 2.0-tie block (pct 0.8 ≤ 0.9) keeping only 5.0;
    // top-60% admits the whole tie block and group b's 10.0
    val kept10 = QuantileOps.filterTopFractionByGroup(df, "grp", "id", "score", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(kept10 == Set(4L, 6L))
    val kept60 = QuantileOps.filterTopFractionByGroup(df, "grp", "id", "score", 0.6)
      .collect().map(_.getLong(0)).toSet
    assert(kept60 == Set(2L, 3L, 8L, 4L, 5L, 6L))
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Funnel + retention against single-node references: the m-aggregation
  * funnel plan must equal a per-entity greedy scan (strict order,
  * earliest anchor, optional conversion window), and the retention
  * rollup must equal a hand-computed cohort matrix — including
  * same-timestamp steps, expired windows, and re-entries. */
class CohortOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-cohort-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val Steps = Seq("view", "click", "buy")

  /** Greedy reference: t1 = min view; t_i = min step_i ts >= t_(i-1)
    * (and <= t1 + w). */
  private def ref(events: Seq[(Long, String, Long)], w: Option[Long]):
      Map[Long, Seq[Option[Long]]] =
    events.groupBy(_._1).flatMap { case (g, evs) =>
      val byStep = Steps.map(s => evs.filter(_._2 == s).map(_._3).sorted)
      byStep.head.headOption.map { t1 =>
        val ts = Array.fill[Option[Long]](Steps.length)(None)
        ts(0) = Some(t1)
        for (i <- 1 until Steps.length) {
          ts(i) = ts(i - 1).flatMap(prev =>
            byStep(i).find(t => t >= prev && w.forall(t <= t1 + _)))
        }
        (g, ts.toSeq)
      }
    }

  private def runFunnel(events: Seq[(Long, String, Long)], w: Option[Long]):
      Map[Long, Seq[Option[Long]]] = {
    val sp = spark; import sp.implicits._
    CohortOps.funnel(events.toDF("g", "step", "t"), Seq("g"), "t", "step",
        Steps, w)
      .collect().map { r =>
        (r.getLong(0), (1 to Steps.length).map(j =>
          if (r.isNullAt(j)) None else Some(r.getLong(j))))
      }.toMap
  }

  private val fixture: Seq[(Long, String, Long)] = Seq(
    // full conversion
    (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
    // same-timestamp step chain (>= admits equality)
    (2L, "view", 5L), (2L, "click", 5L), (2L, "buy", 5L),
    // click BEFORE view never counts; later click does
    (3L, "click", 1L), (3L, "view", 8L), (3L, "click", 9L),
    // stops at step 1
    (4L, "view", 100L),
    // never enters (no view)
    (5L, "click", 2L), (5L, "buy", 3L),
    // earliest-anchor: second view irrelevant, buy between click ts
    (6L, "view", 10L), (6L, "view", 50L), (6L, "click", 60L), (6L, "buy", 55L),
    (6L, "buy", 70L))

  test("funnel equals the greedy per-entity reference (no window)") {
    assert(runFunnel(fixture, None) == ref(fixture, None))
    // spot: entity 5 absent, entity 2 fully converted at t=5
    val got = runFunnel(fixture, None)
    assert(!got.contains(5L))
    assert(got(2L) == Seq(Some(5L), Some(5L), Some(5L)))
    assert(got(3L)(1) == Some(9L))
  }

  test("conversion window anchored at t1 expires later steps") {
    for (w <- Seq(Some(15L), Some(45L), Some(0L))) {
      assert(runFunnel(fixture, w) == ref(fixture, w), s"w=$w")
    }
    // entity 6: click at 60 > 10+45 -> window kills steps 2,3
    assert(runFunnel(fixture, Some(45L))(6L) == Seq(Some(10L), None, None))
  }

  test("funnelCounts is the monotone per-step conversion table") {
    val sp = spark; import sp.implicits._
    val counts = CohortOps.funnelCounts(fixture.toDF("g", "step", "t"),
        Seq("g"), "t", "step", Steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
      .sortBy(_._1)
    val want = ref(fixture, None)
    assert(counts.map(_._3) == (0 until Steps.length)
      .map(i => want.values.count(_(i).isDefined).toLong).toList)
    assert(counts.map(_._2) == Steps.toList)
    assert(counts.map(_._3) == counts.map(_._3).sorted.reverse)
  }

  test("retention matrix equals the hand-computed cohort rollup") {
    val sp = spark; import sp.implicits._
    val day = 86400000000L
    val events = Seq(
      // user 10: first day 0, active days 0, 1, 3 (two events on day 1)
      (10L, 0L * day + 5), (10L, 1L * day + 7), (10L, 1L * day + 9),
      (10L, 3L * day),
      // user 11: first day 1, active days 1, 2
      (11L, 1L * day + 1), (11L, 2L * day + 1),
      // user 12: cohort 0, returns past the cap
      (12L, 0L * day), (12L, 40L * day))
    val got = CohortOps.retention(events.toDF("g", "t"), Seq("g"), "t",
        maxOffsetDays = 30)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Interval join vs the quadratic reference: the bucketed equi-join must
  * return exactly the containment pairs for ANY bucket width — nested
  * and overlapping intervals, closed-boundary touches, zero-length
  * intervals, spans crossing many buckets, and negative epochs. */
class IntervalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-interval-join")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val points = Seq( // (g, t, pid)
    (1L, 0L, 100L), (1L, 10L, 101L), (1L, 15L, 102L), (1L, 29L, 103L),
    (1L, 30L, 104L), (1L, -5L, 105L), (2L, 10L, 106L), (3L, 7L, 107L))
  private val intervals = Seq( // (g, s, e, ivid)
    (1L, 0L, 10L, 1L), (1L, 5L, 29L, 2L), (1L, 15L, 15L, 3L),
    (1L, -10L, -1L, 4L), (1L, 100L, 90L, 5L), // inverted: never matches
    (2L, 0L, 1000L, 6L), (4L, 0L, 100L, 7L))

  private def brute: Set[(Long, Long, Long)] =
    (for {
      (g, t, pid) <- points; (g2, s, e, ivid) <- intervals
      if g == g2 && s <= e && t >= s && t <= e
    } yield (g, pid, ivid)).toSet

  test("bucketed join equals the quadratic scan for any bucket width") {
    val sp = spark; import sp.implicits._
    val p = points.toDF("g", "t", "pid")
    val iv = intervals.toDF("g", "s", "e", "ivid")
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val got = IntervalJoinOp.intervalJoin(p, iv, Seq("g"), "t", "s", "e", w)
        .select("g", "pid", "iv_ivid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute, s"bucketMicros=$w")
    }
    // spot semantics: closed boundaries (t=0 in [0,10], t=29 in [5,29]),
    // zero-length interval catches its exact point, multi-match fans out
    assert(brute.contains((1L, 100L, 1L)))
    assert(brute.contains((1L, 103L, 2L)))
    assert(brute.contains((1L, 102L, 3L)))
    assert(brute.count(_._2 == 101L) == 2) // t=10 in [0,10] and [5,29]
  }

  test("timestamp-typed columns and null bounds behave") {
    val sp = spark; import sp.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val p = Seq((1L, ts(100), 1L), (1L, null.asInstanceOf[java.sql.Timestamp], 2L))
      .toDF("g", "t", "pid")
    val iv = Seq((1L, ts(50), ts(150), 10L),
        (1L, null.asInstanceOf[java.sql.Timestamp], ts(200), 11L))
      .toDF("g", "s", "e", "ivid")
    val got = IntervalJoinOp.intervalJoin(p, iv, Seq("g"), "t", "s", "e",
        60L * 1000000)
      .collect().map(r => (r.getLong(2), r.getLong(5))).toSet
    assert(got == Set((1L, 10L)))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AsofJoinOp + SessionOps against brute-force references: the op's
  * union+window plan must reproduce, row for row, the quadratic per-key
  * scan a single node would do — on dense synthetic timelines (exact
  * ties, gaps, missing keys, null timestamps) and on the real events
  * table. Sessionize is additionally pinned against Spark's own
  * `session_window` merging (same boundary rule, so per-event labels
  * aggregate to exactly the stats rows). */
class EventOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-event-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // --- synthetic fixtures ------------------------------------------------

  /** Left probes: keys 1..3 (key 3 absent on the right), ts includes exact
    * ties with right rows and out-of-range probes. */
  private def leftDf: DataFrame = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, 5L), (1L, 10L), (1L, 10L), (1L, 17L), (1L, 100L),
      (2L, 1L), (2L, 50L), (3L, 20L)
    ).toDF("g", "ts").withColumn("lid", monotonically_increasing_id())
  }

  private def rightDf: DataFrame = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, 10L, 1.0), (1L, 15L, 2.0), (1L, 40L, 3.0),
      (2L, 2L, 10.0), (2L, 49L, 20.0)
    ).toDF("g", "ts", "v")
  }

  /** Brute-force single-node as-of. `direction`: backward|forward|nearest
    * (nearest = closer of the two candidates, ties to backward; tolerance
    * applied AFTER selection, per pandas). */
  private def bruteAsof(left: Seq[(Long, Long)], right: Seq[(Long, Long, Double)],
                        direction: String, strict: Boolean,
                        tol: Option[Long]): Seq[(Long, Long, Option[(Long, Double)])] =
    left.map { case (g, t) =>
      def pick(forward: Boolean): Option[(Long, Double)] = {
        val cands = right.filter(_._1 == g).filter { case (_, rt, _) =>
          if (forward) { if (strict) rt > t else rt >= t }
          else { if (strict) rt < t else rt <= t }
        }
        if (cands.isEmpty) None
        else Some {
          val b = if (forward) cands.minBy(_._2) else cands.maxBy(_._2)
          (b._2, b._3)
        }
      }
      val sel = direction match {
        case "backward" => pick(forward = false)
        case "forward"  => pick(forward = true)
        case _ =>
          (pick(forward = false), pick(forward = true)) match {
            case (Some(b), Some(f)) =>
              if (t - b._1 <= f._1 - t) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
      }
      val best = sel.filter { case (rt, _) => tol.forall(d => math.abs(rt - t) <= d) }
      (g, t, best)
    }

  private def runAsof(direction: String, strict: Boolean, tol: Option[Long]): Unit = {
    val got = AsofJoinOp.asofJoin(leftDf, rightDf, Seq("g"), "ts", "ts",
        Seq("v"), direction, strict, tol)
      .select("g", "ts", "right_ts", "right_v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
      .sortBy(x => (x._1, x._2))
    val sp = spark; import sp.implicits._
    val l = leftDf.select("g", "ts").as[(Long, Long)].collect().toSeq
    val r = rightDf.as[(Long, Long, Double)].collect().toSeq
    val want = bruteAsof(l, r, direction, strict, tol)
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == want, s"direction=$direction strict=$strict tol=$tol")
  }

  test("asof backward inclusive matches brute force (ties, gaps, absent keys)") {
    runAsof("backward", strict = false, None)
  }
  test("asof backward strict excludes exact-timestamp matches") {
    runAsof("backward", strict = true, None)
  }
  test("asof forward inclusive matches brute force") {
    runAsof("forward", strict = false, None)
  }
  test("asof forward strict matches brute force") {
    runAsof("forward", strict = true, None)
  }
  test("asof tolerance nulls matches farther than the bound") {
    runAsof("backward", strict = false, Some(6L))
    runAsof("forward", strict = false, Some(4L))
  }
  test("asof nearest picks the closer side, ties to backward; tolerance after selection") {
    runAsof("nearest", strict = false, None)
    runAsof("nearest", strict = true, None)
    runAsof("nearest", strict = false, Some(3L))
  }

  test("asof: null left ts yields no match; left row multiplicity preserved") {
    val sp = spark; import sp.implicits._
    val l = Seq((1L, Some(10L)), (1L, None)).toDF("g", "ts")
    val out = AsofJoinOp.asofJoin(l, rightDf, Seq("g"), "ts", "ts", Seq("v"))
    assert(out.count() == 2)
    val nullRow = out.filter(col("ts").isNull).collect()
    assert(nullRow.length == 1 && nullRow.head.isNullAt(out.columns.indexOf("right_v")))
    // duplicate left (g, ts) rows each get the same match
    val dup = AsofJoinOp.asofJoin(leftDf, rightDf, Seq("g"), "ts", "ts", Seq("v"))
      .filter(col("g") === 1 && col("ts") === 10)
    assert(dup.count() == 2)
    assert(dup.select("right_v").distinct().collect().map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("asof on the events table: timestamp typed, vs brute force per user") {
    val ev = graft.Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("g"), col("ts"))
      .agg(sum("value").as("y"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("g"), col("ts"))
      .agg(sum("value").as("v"))
    val got = AsofJoinOp.asofJoin(purchases, clicks, Seq("g"), "ts", "ts", Seq("v"))
      .select(col("g"), unix_micros(col("ts").cast("timestamp")).as("t"),
        unix_micros(col("right_ts").cast("timestamp")).as("rt"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val rByKey = clicks.select(col("g"), unix_micros(col("ts").cast("timestamp")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sorted) }
    purchases.select(col("g"), unix_micros(col("ts").cast("timestamp")).as("t")).collect().foreach { r =>
      val (g, t) = (r.getLong(0), r.getLong(1))
      val want = rByKey.get(g).map(_.filter(_ <= t)).filter(_.nonEmpty)
        .map(_.max).getOrElse(-1L)
      assert(got((g, t)) == want, s"user $g ts $t")
    }
  }

  // --- sessionize --------------------------------------------------------

  test("sessionize: boundaries at gap, strict-less-than merge rule, ties, nulls") {
    val sp = spark; import sp.implicits._
    // gap=10: diffs of exactly 10 split, 9 doesn't; ties stay together
    val df = Seq(
      (1L, Some(0L)), (1L, Some(9L)), (1L, Some(19L)), (1L, Some(19L)),
      (1L, Some(29L)), (1L, Some(100L)),
      (2L, Some(5L)), (2L, None)
    ).toDF("g", "ts")
    val out = SessionOps.sessionize(df, Seq("g"), "ts", 10L)
      .select("g", "ts", "session_idx")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val k1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 0,9 merge; 19 splits (diff 10); 19,19 tie together; 29 merges (diff 10 from 19 → split!)
    // diffs: 0→9:9 same; 9→19:10 NEW; 19→19:0 same; 19→29:10 NEW; 29→100 NEW
    assert(k1.map(_._3.get) == Seq(0L, 0L, 1L, 1L, 2L, 3L))
    assert(out.filter(_._1 == 2L).forall(x => x._2.isEmpty == x._3.isEmpty))
    assert(out.exists(x => x._1 == 2L && x._2.isEmpty && x._3.isEmpty))
  }

  test("sessionize labels aggregate to exactly the session_window stats rows") {
    val ev = graft.Tables.events(spark, sfDir)
    val gap = 6L * 3600 * 1000000 // 6 hours in micros
    val labeled = SessionOps.sessionize(ev, Seq("user_id"), "ts", gap)
      .groupBy("user_id", "session_idx")
      .agg(min(unix_micros(col("ts").cast("timestamp"))).as("session_start_us"),
        max(unix_micros(col("ts").cast("timestamp"))).as("session_last_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start_us", "session_last_us", "n_events")
    val stats = SessionOps.sessionStats(ev, Seq("user_id"), "ts", gap)
      .select("user_id", "session_start_us", "session_last_us", "n_events")
    assert(labeled.count() > 0)
    assert(labeled.exceptAll(stats).isEmpty && stats.exceptAll(labeled).isEmpty)
  }

  test("sessionStats y_sum sums the value column exactly") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 0L, 1.25), (1L, 1L, 2.5), (1L, 1000L, 4.0))
      .toDF("g", "ts", "value")
    val out = SessionOps.sessionStats(df, Seq("g"), "ts", 10L, Some("value"))
      .orderBy("session_start_us")
      .select("n_events", "y_sum").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((2L, 3.75), (1L, 4.0)))
  }
}

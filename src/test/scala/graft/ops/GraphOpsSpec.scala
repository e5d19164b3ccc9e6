package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scaled-long PageRank: symmetry/hub invariants on hand graphs and exact
  * parity with an independently-coded driver-side integer replay. */
class GraphOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-graph")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The same integer recurrence, coded independently (maps + loops). */
  private def naive(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val S = GraphOps.Scale
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var pr = nodes.map(_ -> S / n).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / outdeg(s) }.sum
      }
      pr = nodes.map(v => v -> ((15L * (S / n)) / 100 + 85L * in.getOrElse(v, 0L) / 100)).toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cycle stays uniform; the star hub dominates; sinks leak mass") {
    // 3-cycle: perfect symmetry — all ranks equal every iteration
    val cyc = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 10)
    assert(cyc.values.toSet.size == 1)
    // star with a back-edge: the 9↔1 exchange is 2-periodic (rank
    // oscillates between hub and its target), so assert the stable
    // facts: both dominate the leaves, and the leaves stay symmetric
    val star = run(Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)), iters = 10)
    assert(star(9L) > star(2L) && star(1L) > star(2L))
    assert(star(2L) == star(3L))
    // a sink (no out-edges) is allowed: its rank leaks, others still rank
    val sink = run(Seq((1L, 2L), (3L, 2L)), iters = 5)
    assert(sink(2L) > sink(1L) && sink(1L) == sink(3L))
  }

  test("property: exact parity with the independent integer replay on random graphs") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 5) {
      val n = 5 + rnd.nextInt(15)
      val edges = (for {
        s <- 0 until n; _ <- 0 until (1 + rnd.nextInt(3))
      } yield (s.toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val got = run(edges, iters = 7)
        val want = naive(edges, iters = 7)
        assert(got == want, s"trial $trial")
      }
    }
  }

  /** The dangling-redistribution recurrence, coded independently. */
  private def naiveDangling(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val S = GraphOps.Scale
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var pr = nodes.map(_ -> S / n).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / outdeg(s) }.sum
      }
      val dShare = nodes.filterNot(outdeg.contains).map(pr).sum / n
      pr = nodes.map(v => v ->
        ((15L * (S / n)) / 100 + 85L * (in.getOrElse(v, 0L) + dShare) / 100)).toMap
    }
    pr
  }

  test("dangling redistribution: sink mass returns uniformly; no-sink graphs unchanged") {
    val sp = spark
    import sp.implicits._
    def runD(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
      GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iters,
          redistributeDangling = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sink graph: 1→2, 3→2 (node 2 is a sink). With the drop default the
    // total mass decays; with redistribution it stays ≈ SCALE (integer
    // truncation loses < ~100 units per node per iteration)
    val sinkEdges = Seq((1L, 2L), (3L, 2L))
    val dropped = run(sinkEdges, iters = 8)
    val redist = runD(sinkEdges, iters = 8)
    val S = GraphOps.Scale
    assert(dropped.values.sum < (S * 8) / 10,
      s"drop mode must leak sink mass, total ${dropped.values.sum}")
    val total = redist.values.sum
    assert(math.abs(total - S) < 1000L,
      s"redistributed total must stay ~= SCALE, got $total")
    // parity with the independently-coded recurrence
    assert(redist === naiveDangling(sinkEdges, iters = 8))
    // random sink-bearing graphs: exact parity
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 3) {
      val n = 6 + rnd.nextInt(10)
      // only even nodes emit edges → odd destinations are sinks
      val edges = (for {
        s <- 0 until n if s % 2 == 0; _ <- 0 until (1 + rnd.nextInt(2))
      } yield (s.toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty)
        assert(runD(edges, iters = 6) === naiveDangling(edges, iters = 6),
          s"trial $trial")
    }
    // a graph with NO sinks: both modes agree exactly (dShare = 0)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(runD(cyc, iters = 6) === run(cyc, iters = 6))
  }

  test("partition invariance: the scaled ranks are identical longs") {
    val sp = spark
    import sp.implicits._
    val edges = (0 until 50).map(i => (i.toLong, ((i * 7 + 3) % 50).toLong))
      .filter(e => e._1 != e._2)
    val a = GraphOps.pageRank(edges.toDF("s", "d").repartition(7), "s", "d", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}

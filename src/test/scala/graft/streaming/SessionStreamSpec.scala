package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SessionOps

/** Batch ≡ stream for session statistics: [[SessionOps.sessionStats]] is
  * one merging `session_window` aggregation, so the IDENTICAL call runs
  * over a streaming source — including sessions whose events arrive
  * split across micro-batches (the state-merge path a batch run never
  * exercises). The final streamed table must equal the batch rollup of
  * the same rows. */
class SessionStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-session-stream")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("sessionStats over micro-batches equals the batch rollup (sessions split across batches)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val gapUs = 10L * 1000000 // 10 s
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: one session split across batches (5, 8 | 12), then a new
    // session (40); user 2: single-event sessions in separate batches
    val batch1 = Seq((1L, ts(5), 1.5), (1L, ts(8), 2.0), (2L, ts(3), 7.0))
    val batch2 = Seq((1L, ts(12), 0.5), (1L, ts(40), 4.0), (2L, ts(30), 1.0))

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val streamed = SessionOps.sessionStats(
      input.toDF().toDF("user_id", "ts", "value"),
      Seq("user_id"), "ts", gapUs, Some("value"))
    val query = streamed.writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()

    val got = sp.sql("SELECT * FROM session_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .toSet
    val want = SessionOps.sessionStats(
        (batch1 ++ batch2).toDF("user_id", "ts", "value"),
        Seq("user_id"), "ts", gapUs, Some("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .toSet
    assert(got == want)
    // the split session merged: user 1 has sessions {5..12} and {40}
    val u1 = got.filter(_._1 == 1L).map(x => (x._2, x._3, x._4))
    assert(u1 == Set((5000000L, 12000000L, 3L), (40000000L, 40000000L, 1L)))
  }
}

package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.CardinalityOps

/** Batch ≡ stream for the HLL cardinality sketch: [[CardinalityOps
  * .hllCountBy]] is one groupBy + a mergeable TypedImperativeAggregate,
  * so the IDENTICAL call runs over a streaming source with a window
  * column in the group key — "distinct users per (window, event type)"
  * as a live dashboard. Micro-batches split every group across batches
  * (including repeated users), so the state-store register merge — the
  * path a batch run never exercises — must reproduce the batch registers
  * bit-for-bit, and therefore the identical estimate. */
class HllStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-hll-stream")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("windowed distinct-user sketch over micro-batches equals the batch sketch") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // two 60 s windows × two event types; users repeat within a batch,
    // across batches (the register-merge dedup), and across windows
    // (distinct state per group)
    val batch1 = Seq(
      (1L, ts(5), "click"), (2L, ts(10), "click"), (1L, ts(20), "click"),
      (3L, ts(15), "view"), (1L, ts(70), "click"))
    val batch2 = Seq(
      (2L, ts(25), "click"), (4L, ts(40), "click"), (3L, ts(45), "view"),
      (5L, ts(50), "view"), (4L, ts(80), "click"), (1L, ts(95), "view"))

    def sketch(df: org.apache.spark.sql.DataFrame) =
      CardinalityOps.hllCountBy(
        df.withColumn("w", window(col("ts"), "60 seconds")),
        Seq("w", "event_type"), "user_id", p = 6)

    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val streamed = sketch(input.toDF().toDF("user_id", "ts", "event_type"))
      .select(col("w.start").cast("long").as("ws"), col("event_type"),
        col("regs"), col("est"))
    val query = streamed.writeStream.format("memory").queryName("hll_out")
      .outputMode("complete").start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getSeq[Int](2), r.getDouble(3))
    val got = sp.sql("SELECT * FROM hll_out").collect().map(key).toSet
    val want = sketch((batch1 ++ batch2).toDF("user_id", "ts", "event_type"))
      .select(col("w.start").cast("long").as("ws"), col("event_type"),
        col("regs"), col("est"))
      .collect().map(key).toSet
    assert(got == want)

    // sanity: in the linear-counting regime the estimates sit near the
    // exact distinct counts ({click,view} per window = {3,1} and {2,1})
    val ests = got.toSeq.map(r => (r._1, r._2) -> r._4).toMap
    assert(math.abs(ests((0L, "click")) - 3.0) < 0.5)
    assert(math.abs(ests((60L, "click")) - 2.0) < 0.5)
  }

  test("count-min counters over micro-batches equal the batch sketch (sum-merge path)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val batch1 = Seq((0L, "alpha beta alpha"), (1L, "beta gamma"))
    val batch2 = Seq((2L, "alpha delta beta"), (3L, "gamma gamma epsilon"))

    val input = MemoryStream[(Long, String)]
    val streamed = graft.llm.FrequencyOps.cmSketch(
      input.toDF().toDF("doc_id", "text"), "text", d = 4, w = 256)
    val query = streamed.writeStream.format("memory").queryName("cm_out")
      .outputMode("complete").start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()

    val got = sp.sql("SELECT * FROM cm_out").collect()(0).getSeq[Long](0)
    val want = graft.llm.FrequencyOps.cmSketch(
        (batch1 ++ batch2).toDF("doc_id", "text"), "text", d = 4, w = 256)
      .collect()(0).getSeq[Long](0)
    assert(got == want)
    assert(got.sum == 11L * 4) // 11 token occurrences x d rows
  }
}

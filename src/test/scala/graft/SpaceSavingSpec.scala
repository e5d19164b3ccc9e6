package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextOps

/** Round-9: the frequent-items sketch path for corpus top-k tokens
  * ([[graft.functions.SpaceSavingTopK]] via [[TextOps.topTokensSketch]]).
  *
  * Two regimes, two kinds of gate. EXACT (capacity ≥ vocabulary): no purge
  * fires, the sketch must be row-identical to the exact groupBy op with
  * max_err = 0, regardless of partitioning — that's the regime the driver
  * row hash-gates. APPROXIMATE (vocabulary ≫ capacity): estimates are
  * partition-layout dependent by sketch nature, so the pins are the
  * order-independent INVARIANTS — |est − true| ≤ max_err for every
  * returned token, max_err ≤ 2n/capacity, heavy hitters separated by more
  * than 2·max_err keep their exact ranks, and tail junk cannot displace
  * them. */
class SpaceSavingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-space-saving")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Skewed synthetic corpus: 5 heavy tokens with well-separated counts +
    * a long hapax tail, shuffled deterministically across documents. */
  private def skewedDocs(nJunk: Int): (Seq[String], Map[String, Long]) = {
    val heavy = Seq("alpha" -> 2000, "bravo" -> 1600, "charlie" -> 1200,
      "delta" -> 800, "echo" -> 400)
    val toks = scala.collection.mutable.ArrayBuffer[String]()
    heavy.foreach { case (t, c) => (0 until c).foreach(_ => toks += t) }
    (0 until nJunk).foreach(i => toks += s"junk$i")
    val rng = new scala.util.Random(42)
    val shuffled = rng.shuffle(toks.toSeq)
    // pack ~20 tokens per document
    val docs = shuffled.grouped(20).map(_.mkString(" ")).toSeq
    val truth = shuffled.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    (docs, truth)
  }

  test("exact regime: row-identical to topTokens, max_err 0, partition-invariant") {
    val sess = spark; import sess.implicits._
    val (docs, _) = skewedDocs(nJunk = 200) // vocab 205 < capacity
    val base = (docs :+ "" :+ "   ").toDF("text") // blank docs contribute nothing
    for (parts <- Seq(1, 7)) {
      val df = base.repartition(parts)
      val exact = TextOps.topTokens(df, "text", k = 50)
        .select("token", "cnt", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
      val sk = TextOps.topTokensSketch(df, "text", k = 50, capacity = 1024).collect()
      assert(sk.forall(_.getLong(3) == 0L), "no purge may fire below capacity")
      val skRows = sk.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
      assert(skRows == exact.sortBy(_._3), s"parts=$parts")
    }
  }

  test("exact regime: k larger than the vocabulary returns the whole vocabulary") {
    val sess = spark; import sess.implicits._
    val df = Seq("a b b c", "c c d").toDF("text")
    val sk = TextOps.topTokensSketch(df, "text", k = 50, capacity = 64).collect()
    assert(sk.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("c", 3L), ("b", 2L), ("a", 1L), ("d", 1L)))
    assert(sk.map(_.getInt(2)).toSeq == Seq(1, 2, 3, 4))
  }

  test("grouped exact regime: per-group results equal per-group exact top-k") {
    val sess = spark; import sess.implicits._
    val (docsA, _) = skewedDocs(nJunk = 100)
    val df = (docsA.map(("a", _)) ++ Seq(("b", "x y x"), ("b", "y x z")))
      .toDF("src", "text").repartition(5)
    val got = TextOps.topTokensSketchBy(df, "src", "text", k = 10, capacity = 1024)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toSeq.sorted
    val expected = Seq("a", "b").flatMap { g =>
      TextOps.topTokens(df.filter($"src" === g), "text", k = 10).collect()
        .map(r => (g, r.getString(0), r.getLong(1), r.getInt(2), 0L))
    }.sorted
    assert(got == expected)
  }

  test("streaming: sketch state merges across micro-batches; complete mode equals batch") {
    val sess = spark; import sess.implicits._
    implicit val sqlCtx = sess.sqlContext
    val (docs, _) = skewedDocs(nJunk = 150) // exact regime
    val batch = TextOps.topTokens(docs.toDF("text"), "text", k = 20)
      .select("token", "cnt", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val stream = MemoryStream[String]
    val q = TextOps.topTokensSketch(stream.toDF().withColumnRenamed("value", "text"),
        "text", k = 20, capacity = 1024)
      .writeStream.format("memory").queryName("toptok_stream").outputMode("complete")
      .start()
    // three micro-batches: the typed buffer must round-trip the state
    // store (serialize/deserialize) and merge with later batches' partials
    docs.grouped((docs.size + 2) / 3).foreach { chunk =>
      stream.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = sess.table("toptok_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch)
  }

  test("randomized exact-regime sweep: sketch == exact groupBy over random corpora") {
    val sess = spark; import sess.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val vocab = 1 + rng.nextInt(300)
      val nDocs = 1 + rng.nextInt(80)
      val docs = (0 until nDocs).map(_ =>
        Seq.fill(rng.nextInt(30))(s"w${rng.nextInt(vocab)}").mkString(" "))
      val k = 1 + rng.nextInt(vocab + 10)
      val parts = 1 + rng.nextInt(6)
      val df = docs.toDF("text").repartition(parts)
      val exact = TextOps.topTokens(df, "text", k).select("token", "cnt", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(_._3).toSeq
      val sk = TextOps.topTokensSketch(df, "text", k,
        capacity = math.max(k, vocab + 1))
        .collect()
      assert(sk.forall(_.getLong(3) == 0L), s"trial=$trial")
      assert(sk.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq == exact,
        s"trial=$trial vocab=$vocab nDocs=$nDocs k=$k parts=$parts")
    }
  }

  test("approximate regime: error bounds hold and separated heavies keep exact ranks") {
    val sess = spark; import sess.implicits._
    val (docs, truth) = skewedDocs(nJunk = 4000) // vocab 4005 >> capacity 256
    val n = truth.values.sum
    for (parts <- Seq(1, 8)) { // single partition AND the merge path
      val df = docs.toDF("text").repartition(parts)
      val rows = TextOps.topTokensSketch(df, "text", k = 10, capacity = 256).collect()
      val err = rows.head.getLong(3)
      assert(rows.forall(_.getLong(3) == err))
      assert(err > 0, "this corpus must exercise the purge path")
      assert(err <= 2 * n / 256, s"offset bound: err=$err n=$n")
      rows.foreach { r =>
        val trueCnt = truth.getOrElse(r.getString(0), 0L)
        assert(math.abs(r.getLong(1) - trueCnt) <= err,
          s"token=${r.getString(0)} est=${r.getLong(1)} true=$trueCnt err=$err")
      }
      // heavy counts are separated by 400 > 2·err (err ≤ 78), so the top-5
      // ranks are provably exact; junk (est ≤ 1 + err) cannot enter
      assert(rows.take(5).map(_.getString(0)).toSeq ==
        Seq("alpha", "bravo", "charlie", "delta", "echo"), s"parts=$parts")
    }
  }
}

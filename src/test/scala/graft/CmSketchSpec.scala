package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{FrequencyOps, SampleOps}

/** Count-Min sketch (Cormode & Muthukrishnan 2005): mixer parity with the
  * shared LCG, the overcount guarantee, exactness in the no-collision
  * regime, and the shard-merge linearity identity. */
class CmSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-cm-sketch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketOf equals the shared SampleOps.hashBucket mixer on random entities") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    val hs = Seq.fill(200)(math.abs(rnd.nextLong()) % SampleOps.P)
    val d = 4; val w = 1024; val seed = 13L
    val viaSql = hs.toDF("h")
      .withColumn("i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("b", pmod(SampleOps.hashBucket(col("h") * d + col("i"), seed), lit(w.toLong)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (h <- hs; i <- 0 until d)
      assert(viaSql((h, i)) ==
        graft.functions.CountMinSketch.bucketOf(h, i, d, w, seed).toLong,
        s"h=$h i=$i")
  }

  test("estimates are exact in the no-collision regime and never undercount") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha"),
      (1L, "beta gamma beta beta"),
      (2L, "alpha delta")).toDF("doc_id", "text")
    // w big enough that 4 distinct tokens cannot collide in every row
    val sketch = FrequencyOps.cmSketch(docs, "text", d = 4, w = 4096)
    val probes = Seq("alpha", "beta", "gamma", "delta", "absent").toDF("term")
    val est = FrequencyOps.cmEstimate(sketch, probes, "term", d = 4, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("alpha" -> 3L, "beta" -> 4L, "gamma" -> 1L, "delta" -> 1L)
    exact.foreach { case (t, c) => assert(est(t) == c, t) }
    // absent tokens can only overcount, never undercount
    assert(est("absent") >= 0L)

    // tiny w forces collisions: still never an undercount
    val tiny = FrequencyOps.cmEstimate(
      FrequencyOps.cmSketch(docs, "text", d = 2, w = 2), probes, "term",
      d = 2, w = 2).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) => assert(tiny(t) >= c, s"undercount for $t") }
  }

  test("tfidfKeywords: IDF ranks rare above common, ubiquitous terms score 0, partition-invariant") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "the quark the the"),    // 'the' everywhere, 'quark' unique
      (1L, "the cat the dog"),
      (2L, "the cat the fish")).toDF("doc_id", "text")
    val out = FrequencyOps.tfidfKeywords(docs, "doc_id", "text", k = 4,
      w = 4096)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    val byDoc = rows.groupBy(_._1)
    // doc 0: 'quark' (tf 1, df 1 → ln 3) beats 'the' (tf 3, df 3 → score 0)
    assert(byDoc(0L).minBy(_._2)._3 == "quark")
    val theRow = byDoc(0L).find(_._3 == "the").get
    assert(theRow._5 == 3L && theRow._6 == 0.0)
    // doc 1: 'cat'/'dog' (df 2 / 1) outrank 'the'; dog (rarer) first
    assert(byDoc(1L).sortBy(_._2).map(_._3).take(2).toSeq == Seq("dog", "cat"))
    // exact df in the no-collision regime
    assert(byDoc(1L).find(_._3 == "cat").get._5 == 2L)
    // partition invariance
    val again = FrequencyOps.tfidfKeywords(docs.repartition(5), "doc_id",
        "text", k = 4, w = 4096)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(again.toSet == rows.map(r => (r._1, r._2, r._3)).toSet)
  }

  test("property: estimates never undercount on random corpora; exact when w is large") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val vocab = (0 until 30).map(i => s"w$i")
      val docs = (0L until 60L).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val exact = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (t, occ) => t -> occ.size.toLong }
      val df = docs.toDF("doc_id", "text")
      val probes = vocab.toDF("term")
      for (w <- Seq(8, 64, 1 << 14)) {
        val est = FrequencyOps.cmEstimate(
            FrequencyOps.cmSketch(df, "text", d = 3, w = w), probes, "term",
            d = 3, w = w)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        exact.foreach { case (t, c) =>
          assert(est(t) >= c, s"trial $trial w=$w undercounts $t") }
        if (w >= (1 << 14))
          exact.foreach { case (t, c) =>
            assert(est(t) == c, s"trial $trial w=$w not exact for $t") }
      }
    }
  }

  test("shard-merge linearity: merged per-shard counters equal the single pass") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} shared")).toDF("doc_id", "text")
    val whole = FrequencyOps.cmSketch(docs, "text")
      .collect()(0).getSeq[Long](0)
    val merged = FrequencyOps.cmMergeShards(
        FrequencyOps.cmSketch(docs.withColumn("shard", pmod(col("doc_id"), lit(3))),
          "text", groupCols = Seq("shard")))
      .collect()(0).getSeq[Long](0)
    assert(whole == merged)
    // total mass per sketch row = total token occurrences (3 per doc)
    assert(whole.sum == 40L * 3 * 4)
  }
}

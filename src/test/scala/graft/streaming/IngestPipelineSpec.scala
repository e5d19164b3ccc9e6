package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{ClassifierOps, DsirOps, TextOps}

/** Batch ≡ stream for the composed curation ingest pipeline
  * ([[IngestPipeline]]): html_strip → normalize → C4/Gopher → NB gate →
  * DSIR gate → bigram-LM gate → exact dedup, fed as one batch DataFrame
  * and as the same rows arriving over streaming micro-batches. The kept
  * row set must be identical, and so must the scores the gates attach —
  * NB and bigram bit-exact, DSIR to 1e-9 (documented reassociation). */
class IngestPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-ingest-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // prose long enough to clear the Gopher word-count floor, with enough
  // sentences and stopwords for C4; spam variants for the NB/DSIR gates
  private def prose(tag: String): String =
    (1 to 6).map(i => s"The $tag corpus keeps sentence $i with plain words " +
      s"that people have to read and be happy about it.").mkString(" ")
  private def spam(tag: String): String =
    (1 to 6).map(i => s"The $tag pills keep offer $i with cheap words " +
      s"that people have to click and be free about it.").mkString(" ")

  private def models(s: SparkSession): IngestPipeline.GateModels = {
    import s.implicits._
    val labeled = ((1 to 8).map(i => (i.toLong, prose(s"seed$i"), true)) ++
      (1 to 8).map(i => (100L + i, spam(s"junk$i"), false)))
      .toDF("id", "text", "label")
    val nbDf = ClassifierOps.nbTrain(labeled, "text", "label",
      numBuckets = 1 << 16, seed = 7).localCheckpoint(true)
    val corpus = ((1 to 8).map(i => (i.toLong, prose(s"raw$i"))) ++
      (1 to 8).map(i => (50L + i, spam(s"raw$i")))).toDF("id", "text")
    val target = (1 to 8).map(i => (i.toLong, prose(s"tgt$i"))).toDF("id", "text")
    val dsirM = DsirOps.fitModel(corpus, target, "text", numBuckets = 4096,
      seed = 3, alpha = 0.5)
    val dsir = DsirOps.DsirModel(dsirM.ratios.localCheckpoint(true),
      dsirM.unseen.localCheckpoint(true), dsirM.numBuckets, dsirM.seed)
    val lmCorpus = (1 to 12).map(i => (i.toLong, prose(s"lm$i"))).toDF("id", "text")
    val bgM = TextOps.trainBigramLm(lmCorpus, "text", vocabSize = 256,
      bigramVocabSize = 1024)
    val bigram = TextOps.BigramLmModel(bgM.vocab.localCheckpoint(true),
      bgM.bigrams.localCheckpoint(true), bgM.totals.localCheckpoint(true),
      bgM.vocabSize, bgM.alpha, bgM.lambda)
    IngestPipeline.GateModels(ClassifierOps.NbModel(nbDf, 1 << 16, 7L),
      dsir, minLogw = -1e9, bigram, maxPerplexity = 1e9)
  }

  test("batch and stream curation keep the same rows with the same scores") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val m = models(s)
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00")
    // html wrappers, a cross-batch duplicate (22 repeats 20 after
    // strip+normalize), spam (NB gate), and a fragment (C4/Gopher gates)
    val batch1 = Seq(
      (20L, ts(1), s"<div><p>${prose("keepA")}</p></div><script>var x;</script>"),
      (21L, ts(2), s"<p>${spam("dropme")}</p>"),
      (23L, ts(3), "<p>Too short.</p>"))
    val batch2 = Seq(
      (22L, ts(4), s"<div>${prose("keepA")}</div>"), // dup of 20 post-strip
      (24L, ts(5), s"<p>${prose("keepB")}</p><!-- c -->"),
      // null text: every broadcast gate must score it as the empty document
      // (the NB/DSIR scorers used to NPE here and kill the micro-batch)
      (25L, ts(6), null.asInstanceOf[String]))
    val all = (batch1 ++ batch2).toDF("doc_id", "ts", "text")

    val outCols = Seq("doc_id", "nb_score", "logw", "sum_logp", "perplexity")
    def snap(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double, Double, Double)] =
      df.select(outCols.head, outCols.tail: _*).collect()
        .map(r => r.getLong(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    val batchKept = snap(IngestPipeline.curateBatch(all, "ts", "text", m))
    assert(batchKept.keySet == Set(20L, 24L),
      s"gates must keep exactly the two fresh prose docs, got ${batchKept.keySet}")

    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = IngestPipeline.curateStream(
      input.toDF().toDF("doc_id", "ts", "text"), "ts", "text", m)
    val query = out.writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val streamKept = snap(spark.table("ingest_out"))
      assert(streamKept.keySet == batchKept.keySet,
        s"stream kept ${streamKept.keySet}, batch kept ${batchKept.keySet}")
      for ((id, (nb, lw, slp, ppl)) <- batchKept) {
        val (snb, slw, sslp, sppl) = streamKept(id)
        assert(snb == nb, s"doc $id nb_score must be bit-exact")
        assert(sslp == slp && sppl == ppl,
          s"doc $id bigram sum_logp/perplexity must be bit-exact")
        assert(math.abs(slw - lw) < 1e-9, s"doc $id logw")
      }
    } finally query.stop()
  }

  test("historical-corpus bloom gate drops known docs identically in batch and stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // the standing corpus, fingerprinted on its CURATED text (the contract)
    val standingRaw = Seq(
      (900L, s"<div>${prose("known1")}</div>"),
      (901L, s"<p>${prose("known2")}</p>")).toDF("doc_id", "text")
    val standing = TextOps.textNormalize(
      TextOps.htmlStrip(standingRaw, "text", out = "_p")
        .drop("text").withColumnRenamed("_p", "text"),
      "text", out = "text")
    val bloom = graft.llm.BloomOps.buildBloom(standing,
      graft.llm.BloomOps.productionFingerprint(col("text")),
      mBits = 1 << 16, k = 4, seed = 11L)
    val m = models(s).copy(bloom = Some(bloom))
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 12:${i}%02d:00")
    val rows = Seq(
      // same curated text as standing doc 900, different markup: must drop
      (30L, ts(1), s"<p>${prose("known1")}</p>"),
      (31L, ts(2), s"<div>${prose("fresh1")}</div>"),
      (32L, ts(3), s"<p>${prose("known2")}</p><!-- x -->"),
      (33L, ts(4), s"<p>${prose("fresh2")}</p>"))
    val batchKept = IngestPipeline.curateBatch(rows.toDF("doc_id", "ts", "text"),
      "ts", "text", m).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == Set(31L, 33L),
      s"known docs must be bloom-gated, got $batchKept")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val query = IngestPipeline.curateStream(
        input.toDF().toDF("doc_id", "ts", "text"), "ts", "text", m)
      .select("doc_id")
      .writeStream.format("memory").queryName("bloom_gate_out")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("bloom_gate_out").collect().map(_.getLong(0)).toSet
      assert(streamed == batchKept)
    } finally query.stop()
    // without the bloom model the same rows all pass the gates
    val noBloom = IngestPipeline.curateBatch(rows.toDF("doc_id", "ts", "text"),
      "ts", "text", m.copy(bloom = None))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(noBloom == Set(30L, 31L, 32L, 33L))
  }

  test("the gate stage itself is batch≡stream row-for-row (no dedup state involved)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val m = models(s)
    val rows = (0 until 12).map { i =>
      val t = if (i % 3 == 2) spam(s"v$i") else prose(s"v$i")
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 11:${i}%02d:00"),
        s"<p>$t</p>")
    }
    val batch = IngestPipeline.gate(rows.toDF("doc_id", "ts", "text"), "text", m)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val query = IngestPipeline.gate(input.toDF().toDF("doc_id", "ts", "text"),
        "text", m)
      .select("doc_id")
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("gate_out").collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.forall(_ % 3 != 2), s"spam must be gated: $batch")
    } finally query.stop()
  }
}

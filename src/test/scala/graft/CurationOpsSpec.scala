package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{MixOps, SimilarityOps, TextOps}

/** Round-16 curation ops: SemDeDup semantics + cluster cap, kNN-graph
  * exactness vs brute force, boilerplate line removal, token histogram,
  * and token-budget mixing (exact prefix semantics, boundary handling,
  * partition invariance). */
class CurationOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-curation-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Two tight clusters around orthogonal axes + one planted near-dup in
    * each, far from each other (cos between clusters ≈ 0). */
  private def clusteredVecs = {
    val sp = spark
    import sp.implicits._
    Seq(
      (0L, Seq(1.0, 0.01, 0.0, 0.0)),
      (1L, Seq(1.0, 0.011, 0.0, 0.0)), // near-dup of 0
      (2L, Seq(0.9, 0.3, 0.0, 0.0)),   // same cluster, below floor
      (3L, Seq(0.0, 0.0, 1.0, 0.02)),
      (4L, Seq(0.0, 0.0, 1.0, 0.021)), // near-dup of 3
      (5L, Seq(0.0, 0.0, 0.3, 0.9))    // same cluster, below floor
    ).toDF("id", "vec")
  }

  test("semDedupPairs finds in-cluster near-dups only; semDedup keeps one exemplar") {
    val df = clusteredVecs
    val centroids = SimilarityOps.ivfTrain(df, "id", "vec", nLists = 2, iters = 2)
    val pairs = SimilarityOps.semDedupPairs(df, "id", "vec", centroids, minSim = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (3L, 4L)), s"got $pairs")
    val kept = SimilarityOps.semDedupWithCentroids(df, "id", "vec", centroids, 0.999)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 3L, 5L), s"got $kept")
  }

  test("semDedupPairs splits over-cap clusters: a planted >cap cluster still dedups") {
    val sp = spark
    import sp.implicits._
    // worst case for the cap: 40 IDENTICAL vectors in one cluster (cap 10).
    // The old behavior skipped the cluster entirely (0 pairs, all 40 kept);
    // the split path must still dedup it. Identical vectors defeat the
    // sign-LSH round (all land on the same side of every hyperplane), so
    // this specifically exercises the residual id-hash salt: ⌈40/10⌉ = 4
    // salt groups, every within-group pair found, ≥ 36 of 40 rows dropped.
    val dupes = (0L until 40L).map(i => (i, Seq(1.0, 0.01, 0.0, 0.0)))
    val far = Seq((100L, Seq(0.0, 0.0, 1.0, 0.0)), (101L, Seq(0.0, 0.0, 0.99, 0.1)))
    val df = (dupes ++ far).toDF("id", "vec")
    val centroids = SimilarityOps.ivfTrain(df, "id", "vec", nLists = 1, iters = 1)
    val pairs = SimilarityOps.semDedupPairs(df, "id", "vec", centroids, 0.999,
      maxClusterSize = 10)
    assert(pairs.count() > 0, "an over-cap cluster must still produce pairs")
    // no pair crosses the similarity floor: the far vectors are not dups
    assert(pairs.filter(col("id_a") >= 100L || col("id_b") >= 100L).count() == 0)
    val kept = SimilarityOps.semDedupWithCentroids(df, "id", "vec", centroids, 0.999,
      maxClusterSize = 10).collect().map(_.getLong(0)).toSet
    assert(kept.count(_ < 40L) <= 4,
      s"at most one exemplar per salt group may survive, kept ${kept.count(_ < 40L)}")
    assert(kept.contains(0L), "the lowest id is always an exemplar")
    assert((kept & Set(100L, 101L)) == Set(100L, 101L), "non-dup rows are untouched")
    // and an under-cap cluster is bit-identical to the uncapped join
    val small = clusteredVecs
    val c2 = SimilarityOps.ivfTrain(small, "id", "vec", nLists = 1, iters = 1)
    val uncapped = SimilarityOps.semDedupPairs(small, "id", "vec", c2, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((0L, 1L), (3L, 4L)))
  }

  test("removeDuplicatedSpans: keep-first, overlap coverage, short docs untouched") {
    val sp = spark
    import sp.implicits._
    val plant = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (0L, s"zero unique words here $plant trailing tail"),
      (1L, s"one other opening $plant closing words"),
      (2L, s"two begins $plant and again $plant ends"),
      (3L, "three has no duplicated content at all"),
      (4L, "tiny doc")).toDF("id", "text")
    val outDf = graft.llm.TextOps.removeDuplicatedSpans(docs, "id", "text", gramLen = 5)
    val out = outDf.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 0 holds the first (id, pos) occurrence -> untouched
    assert(out(0L) == (s"zero unique words here $plant trailing tail", 0L))
    // doc 1's plant window is covered; surrounding words survive
    assert(out(1L) == ("one other opening closing words", 5L))
    // doc 2 loses BOTH its occurrences (neither is the global first)
    assert(out(2L) == ("two begins and again ends", 10L))
    // no duplicated grams -> canonicalized passthrough
    assert(out(3L) == ("three has no duplicated content at all", 0L))
    // shorter than gramLen -> untouched
    assert(out(4L) == ("tiny doc", 0L))

    // within-document repetition: the SECOND occurrence goes, first stays
    val rep = Seq((7L, s"$plant filler one two three $plant")).toDF("id", "text")
    val repOut = graft.llm.TextOps.removeDuplicatedSpans(rep, "id", "text", gramLen = 5)
      .collect().head
    assert(repOut.getString(1) == s"$plant filler one two three")
    assert(repOut.getLong(2) == 5L)
  }

  test("removeDuplicatedSpans: start-array form == exploded-coverage specification (DedupSpanParity)") {
    // r11: the production rebuild probes dup-window STARTS with a binary-
    // search range query; this pins output equality with the exploded-
    // coverage executable specification on adversarial overlap shapes plus
    // the real sf0.001 corpus, at two gram lengths.
    val sp = spark
    import sp.implicits._
    val plant = "alpha beta gamma delta epsilon"
    val inline = Seq(
      (1000000L, s"zero unique words here $plant trailing tail"),
      (1000001L, s"one other opening $plant closing words"),
      (1000002L, s"two begins $plant and again $plant ends"),
      (1000003L, plant),                                 // doc IS one window
      (1000004L, s"$plant $plant $plant"),               // back-to-back overlap
      (1000005L, "x"),                                   // sub-gram
      (1000006L, s"lead $plant mid $plant aft $plant"),  // interleaved
      (1000007L, null.asInstanceOf[String])              // null text
    ).toDF("doc_id", "text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).unionByName(inline)
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).toSet
    for (g <- Seq(3, 20)) {
      val prod = snap(TextOps.removeDuplicatedSpans(corpus, "doc_id", "text", gramLen = g))
      val spec = snap(TextOps.removeDuplicatedSpansExploded(corpus, "doc_id", "text", gramLen = g))
      assert(prod == spec, s"start-array form diverged from the spec at gramLen=$g")
    }
  }

  test("decontaminateSpans: quoted eval items scrubbed, clean text and short docs untouched") {
    val sp = spark
    import sp.implicits._
    val evalItem = "what is the capital of atlantis"
    val bench = Seq((100L, evalItem)).toDF("bid", "btext")
    val docs = Seq(
      (0L, s"intro words $evalItem outro words"),   // quotes the item
      (1L, "totally unrelated clean document body here"),
      (2L, evalItem),                                // IS the item → empty
      (3L, "short doc"),                             // < n tokens
      (4L, s"$evalItem and $evalItem twice")         // both occurrences go
    ).toDF("id", "text")
    val out = graft.llm.TextOps.decontaminateSpans(docs, bench, "id", "text",
        "btext", n = 6)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) == ("intro words outro words", 6L))
    assert(out(1L) == ("totally unrelated clean document body here", 0L))
    assert(out(2L) == ("", 6L))
    assert(out(3L) == ("short doc", 0L))
    // 14 tokens: windows at 0 and 7 cover 0-5 and 7-12; 'and' + 'twice' survive
    assert(out(4L) == ("and twice", 12L))
    // partition invariance
    val again = graft.llm.TextOps.decontaminateSpans(
        docs.repartition(5), bench, "id", "text", "btext", n = 6)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(again == out)
  }

  test("containmentVerify catches quote-inclusion pairs the Jaccard gate misses") {
    val sp = spark
    import sp.implicits._
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val wrapper = s"editorial preamble text goes here $quote and a very long " +
      "trailing commentary section follows with many additional tokens " +
      "padding the wrapper document until the shared shingles are a small " +
      "fraction of its total shingle set size overall"
    val docs = Seq((1L, quote), (2L, wrapper), (3L, quote), (4L, "unrelated words entirely"))
      .toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val got = graft.llm.TextOps.containmentVerify(pairs, docs, "id", "text",
        shingleSize = 5, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // the quoted doc sits whole inside the wrapper: containment(A in B) = 1
    assert(got((1L, 2L))._1 == 1.0 && got((1L, 2L))._2 < 0.5)
    // identical docs: both directions 1.0
    assert(got((1L, 3L)) == ((1.0, 1.0)))
    // unrelated pair filtered
    assert(!got.contains((1L, 4L)))
    // the SAME pair fails a 0.9 Jaccard gate — the relation Jaccard misses
    val jac = graft.llm.TextOps.jaccardVerify(pairs, docs, "id", "text",
        shingleSize = 5, threshold = 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)) && jac.contains((1L, 3L)))

    // text shorter than the shingle → empty set → containment 0, filtered
    val tiny = Seq((7L, "ab"), (8L, "ab")).toDF("id", "text")
    assert(graft.llm.TextOps.containmentVerify(
      Seq((7L, 8L)).toDF("id_a", "id_b"), tiny, "id", "text", 5, 0.5).count() == 0)
  }

  test("unigram LM: smoothed probs, OOV fallback, empty docs survive scoring") {
    val sp = spark
    import sp.implicits._
    // corpus: "a" ×3, "b" ×2, "c" ×1; vocab 2 → c is OOV. N = 6, V+1 = 3.
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "")).toDF("id", "text")
    val lm = graft.llm.TextOps.trainUnigramLm(docs, "text", vocabSize = 2, alpha = 0.5)
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDouble(2))).toMap
    val denom = 6.0 + 0.5 * 3
    assert(lm(Some("a"))._1 == 3L)
    assert(math.abs(lm(Some("a"))._2 - math.log(3.5 / denom)) < 1e-12)
    assert(math.abs(lm(Some("b"))._2 - math.log(2.5 / denom)) < 1e-12)
    assert(lm(None)._1 == 0L, "the NULL row carries the OOV probability")
    assert(math.abs(lm(None)._2 - math.log(0.5 / denom)) < 1e-12)
    assert(!lm.contains(Some("c")), "c is below the vocab cutoff")

    val scored = graft.llm.TextOps.lmPerplexity(docs, "id", "text", 2, 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.isNullAt(4))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected1 = 2 * r6(math.log(3.5 / denom)) + r6(math.log(2.5 / denom))
    assert(scored(1L)._1 == 3L && math.abs(scored(1L)._2 - expected1) < 1e-9)
    val expected2 = r6(math.log(3.5 / denom)) + r6(math.log(2.5 / denom)) +
      r6(math.log(0.5 / denom))
    assert(math.abs(scored(2L)._2 - expected2) < 1e-9, "OOV token uses the fallback")
    assert(scored(3L) == ((0L, 0.0, true)), "empty docs score 0 tokens, null perplexity")
  }

  test("knnGraph with exhaustive probing equals brute force with self excluded") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextGaussian()))).toDF("id", "vec")
    val graph = SimilarityOps.knnGraph(df, "id", "vec", k = 3, nLists = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: corpus as its own query set, drop self rows, take top 3
    val brute = SimilarityOps.bruteForceTopK(df, df, "id", "vec", k = 4)
      .filter(col("qid") =!= col("vid"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("vid"))))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(graph == brute)
    assert(!graph.exists { case (q, v) => q == v }, "self edges must be excluded")
  }

  test("removeBoilerplateLines strips only lines above maxDocs, preserving order and blanks") {
    val sp = spark
    import sp.implicits._
    val docs = (0 until 8).map { i =>
      (i.toLong, s"HEADER\nbody $i\n\ntail ${i % 2}")
    }.toDF("id", "text")
    // HEADER in 8 docs (> 3, stripped); 'tail 0'/'tail 1' in 4 docs each
    // (> 3, stripped); body lines unique (kept); blank line kept
    val out = TextOps.removeBoilerplateLines(docs, "id", "text", maxDocs = 3)
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("text_clean")).toSeq ==
      (0 until 8).map(i => s"body $i\n"))
    assert(out.forall(_.getAs[Long]("text_clean_lines_removed") == 2L))
    // at maxDocs = 4 the tail lines survive
    val loose = TextOps.removeBoilerplateLines(docs, "id", "text", maxDocs = 4)
      .orderBy("id").collect()
    assert(loose.map(_.getAs[String]("text_clean")).toSeq ==
      (0 until 8).map(i => s"body $i\n\ntail ${i % 2}"))
  }

  test("topTokens ranks by count desc then token asc, deterministically") {
    val sp = spark
    import sp.implicits._
    val docs = Seq("b b b a a c", "a  b\tz", "Z c").toDF("text")
    val top = TextOps.topTokens(docs, "text", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // lowercase folds Z into z; b:4, a:3, c:2, z:2 — c beats z on the
    // token-asc tiebreak at the k boundary
    val expected = Seq(("b", 4L, 1), ("a", 3L, 2), ("c", 2L, 3))
    assert(top.sortBy(_._3).toSeq == expected, s"got ${top.toSeq}")
  }

  test("selectPerDomainBudget implements the exact prefix rule and is partition-invariant") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 300L).map(i => (i, s"dom${i % 3}", 10L + i % 7)).toDF("id", "dom", "toks")
    val budgets = Map("dom0" -> 250L, "dom1" -> 1000000L, "dom2" -> 0L)
    val out = MixOps.selectPerDomainBudget(docs, "id", "dom", "toks", budgets, seed = 3,
      nCoarse = 16) // tiny nCoarse forces multi-row boundary buckets
    val kept = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // reference: per-domain cumsum in hash order must stay within budget,
    // and the NEXT candidate must overflow (maximality)
    val bucketOf = docs.withColumn("_b", graft.llm.SampleOps.hashBucket(col("id"), 3))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (dom <- Seq("dom0", "dom1", "dom2")) {
      val all = (0L until 300L).filter(i => s"dom${i % 3}" == dom)
        .sortBy(i => (bucketOf(i), i))
      val toks = all.map(i => 10L + i % 7)
      val cums = toks.scanLeft(0L)(_ + _).tail
      val expect = all.zip(cums).takeWhile(_._2 <= budgets(dom)).map(_._1).toSet
      val got = kept.filter(_._2 == dom).map(_._1).toSet
      assert(got == expect, s"$dom: got ${got.size}, expected ${expect.size}")
    }
    // unbudgeted domains are dropped entirely
    val capped0 = kept.filter(_._2 == "dom2")
    assert(capped0.isEmpty)
    // partition invariance
    val out2 = MixOps.selectPerDomainBudget(docs.repartition(7), "id", "dom", "toks",
      budgets, seed = 3, nCoarse = 16).collect().map(_.getLong(0)).toSet
    assert(out2 == kept.map(_._1).toSet)
  }

  test("blocklistFilter: word-level match, block vs flag modes, case-insensitive") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a clean document here"),
      (2L, "contains the BADWORD token"),
      (3L, "badwordish is not a match"),
      (4L, "")).toDF("id", "text")
    val terms = Seq("badword", "other").toDF("term")
    val kept = graft.llm.ReportOps.blocklistFilter(docs, "id", "text", terms)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L), "substring-only hits must NOT match")
    val flags = graft.llm.ReportOps.blocklistFilter(docs, "id", "text", terms, "flag")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("has_blocked")).toMap
    assert(flags == Map(1L -> false, 2L -> true, 3L -> false, 4L -> false))
  }

  test("corpusReport aggregates per stratum") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "en", "one two three"), (2L, "en", "four"), (3L, "de", "eins zwei")
    ).toDF("id", "lang", "text")
    val rep = graft.llm.ReportOps.corpusReport(docs, "text", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(rep("en") == ((2L, 4L, 1L, 3L, 2.0)))
    assert(rep("de") == ((1L, 2L, 2L, 2L, 2.0)))
  }

  test("selectToTokenBudget: budget growth is monotone (supersets)") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 200L).map(i => (i, 5L + i % 11)).toDF("id", "toks")
    val small = MixOps.selectToTokenBudget(docs, "id", "toks", budget = 300L, seed = 1)
      .collect().map(_.getLong(0)).toSet
    val large = MixOps.selectToTokenBudget(docs, "id", "toks", budget = 900L, seed = 1)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "a grown budget must keep every previously kept doc")
    assert(small.nonEmpty && large.size > small.size)
  }
}

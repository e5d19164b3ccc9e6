package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{DomainOps, MixOps, SimilarityOps, TextOps}

/** Round-6 curation additions: cross-corpus dedup (incremental-ingest
  * shape), C4/Gopher heuristic quality filters, and the deterministic
  * training-order shard. */
class QualityCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-quality-curation")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def longText(tag: String): String =
    (1 to 30).map(i => s"${tag}x$i${tag.reverse}q$i").mkString(" ")

  test("dedupAgainstCorpus drops incoming near-dups of the reference, keeps fresh docs") {
    val sp = spark
    import sp.implicits._
    val ref = Seq(
      (1L, longText("refdoc one")),
      (2L, longText("refdoc two")),
      (3L, longText("refdoc three"))).toDF("id", "text")
    val incoming = Seq(
      (100L, longText("refdoc one")),   // exact dup of ref 1
      (101L, longText("fresh alpha")),  // genuinely new
      (102L, longText("refdoc three")), // exact dup of ref 3
      (103L, longText("fresh beta"))).toDF("id", "text")
    val cand = TextOps.crossCorpusCandidates(incoming, ref, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((100L, 1L)) && cand.contains((102L, 3L)), s"got $cand")
    assert(!cand.exists { case (i, _) => i == 101L || i == 103L }, s"got $cand")
    val kept = TextOps.dedupAgainstCorpus(incoming, ref, "id", "text", threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(101L, 103L), s"got $kept")
  }

  test("dedup index survives a disk round trip with its signature parameters") {
    val sp = spark
    import sp.implicits._
    val ref = Seq((1L, longText("persisted one")), (2L, longText("persisted two")))
      .toDF("id", "text")
    val incoming = Seq((10L, longText("persisted one")), (11L, longText("novel doc")))
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx").toString
    TextOps.writeDedupIndex(ref, "id", "text", dir, threshold = 0.9)
    val idx = TextOps.loadDedupIndex(spark, dir)
    assert(idx.numHashes == 64 && idx.shingleSize == 5)
    assert(idx.bands == TextOps.bandsForThreshold(64, 0.9))
    val kept = TextOps.dedupAgainstIndex(incoming, idx, "id", "text", threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L), s"got $kept")
  }

  test("loadDedupIndex fails fast on a missing or mismatched format_version") {
    val sp = spark
    import sp.implicits._
    val ref = Seq((1L, longText("versioned one"))).toDF("id", "text")
    // pre-versioning layout: meta without format_version (what an old build
    // wrote) — its bucket values are incompatible, so loading must refuse,
    // not silently join zero candidates
    val legacy = java.nio.file.Files.createTempDirectory("graft-dedup-v0").toString
    TextOps.writeDedupIndex(ref, "id", "text", legacy)
    spark.read.parquet(s"$legacy/meta").drop("format_version")
      .write.mode("overwrite").parquet(s"$legacy/meta2")
    // parquet can't overwrite a path being read; swap directories on disk
    val metaDir = java.nio.file.Paths.get(legacy, "meta")
    val meta2Dir = java.nio.file.Paths.get(legacy, "meta2")
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(metaDir)
    java.nio.file.Files.move(meta2Dir, metaDir)
    val eMissing = intercept[IllegalArgumentException] {
      TextOps.loadDedupIndex(spark, legacy)
    }
    assert(eMissing.getMessage.contains("format_version"))
    // wrong version number
    val stale = java.nio.file.Files.createTempDirectory("graft-dedup-v1").toString
    TextOps.writeDedupIndex(ref, "id", "text", stale)
    val bumped = spark.read.parquet(s"$stale/meta")
      .withColumn("format_version", lit(TextOps.DedupIndexFormatVersion - 1))
    bumped.write.mode("overwrite").parquet(s"$stale/meta2")
    rmTree(java.nio.file.Paths.get(stale, "meta"))
    java.nio.file.Files.move(java.nio.file.Paths.get(stale, "meta2"),
      java.nio.file.Paths.get(stale, "meta"))
    val eStale = intercept[IllegalArgumentException] {
      TextOps.loadDedupIndex(spark, stale)
    }
    assert(eStale.getMessage.contains("format_version"))
    // a current-version index still loads
    val ok = java.nio.file.Files.createTempDirectory("graft-dedup-v2").toString
    TextOps.writeDedupIndex(ref, "id", "text", ok)
    assert(TextOps.loadDedupIndex(spark, ok).numHashes == 64)
  }

  test("crossCorpusCandidates skips over-cap buckets (shared boilerplate)") {
    val sp = spark
    import sp.implicits._
    val boiler = longText("boilerplate shared")
    val ref = (1L to 8L).map(i => (i, boiler)).toDF("id", "text")
    val incoming = (100L to 107L).map(i => (i, boiler)).toDF("id", "text")
    // combined bucket population 16 > cap 10 → no candidates from that bucket
    val cand = TextOps.crossCorpusCandidates(incoming, ref, "id", "text",
      maxBucketSize = 10)
    assert(cand.count() == 0)
    // with a permissive cap every (incoming, ref) pair is a candidate
    val all = TextOps.crossCorpusCandidates(incoming, ref, "id", "text",
      maxBucketSize = 1000)
    assert(all.count() == 64)
  }

  test("c4QualityFilter keeps clean prose, rejects the C4 disqualifiers") {
    val sp = spark
    import sp.implicits._
    val good = "This is a full sentence. Here is another one! And a third?\nAll lines end well."
    val docs = Seq(
      (1L, good),
      (2L, "Lorem Ipsum dolor sit amet. Plus two more. Sentences here."),
      (3L, "function f() { return 1; }. Has braces. Three sentences."),
      (4L, "Enable JavaScript to view this page. Second sentence. Third sentence."),
      (5L, "too short.")).toDF("id", "text")
    val out = TextOps.c4QualityFilter(docs, "text")
      .select(col("id"), col("c4_keep"), col("n_sentences"), col("terminal_line_ratio"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._1, s"good doc rejected: ${out(1L)}")
    assert(out(1L)._2 == 4L) // . ! ? .
    assert(out(1L)._3 == 1.0) // both lines end terminally
    assert(!out(2L)._1) // lorem ipsum
    assert(!out(3L)._1) // brace
    assert(!out(4L)._1) // javascript
    assert(!out(5L)._1) // one sentence, two words
  }

  test("gopherQualityFilter signal semantics and keep rule") {
    val sp = spark
    import sp.implicits._
    val good = (1 to 60).map(i => s"with the quality of and that tokens be w$i").mkString(" ")
    val docs = Seq(
      (1L, good),
      (2L, "short words only five here"), // < 50 words
      (3L, (1 to 60).map(_ => "### ## #").mkString(" ")), // symbol ratio + no alpha
      (4L, (1 to 60).map(i => s"- bullet line w$i\n").mkString), // all bullet lines
      (5L, (1 to 60).map(i => s"zq$i xv$i").mkString(" "))) // no stopwords
      .toDF("id", "text")
    val out = TextOps.gopherQualityFilter(docs, "text")
      .select(col("id"), col("gopher_keep"), col("n_words"), col("alpha_word_ratio"),
        col("bullet_line_ratio"), col("stopword_hits"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    assert(out(1L)._1, s"good doc rejected: ${out(1L)}")
    assert(out(1L)._5 >= 2)
    assert(!out(2L)._1)
    assert(!out(3L)._1 && out(3L)._3 == 0.0)
    assert(!out(4L)._1 && out(4L)._4 == 1.0)
    assert(!out(5L)._1 && out(5L)._5 == 0L)
  }

  test("hashEmbed: unit norm, determinism, zero vector for empty text, similarity ordering") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),      // identical → identical vec
      (3L, "alpha beta gamma delta unrelatedlongtoken"), // 4/5 shared tokens
      (4L, "totally different words entirely here"),
      (5L, "   ")).toDF("id", "text")               // no tokens → zero vec
    val emb = TextOps.hashEmbed(docs, "id", "text", dim = 64, seed = 7)
    val vecs = emb.select(col("id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    assert(vecs(1L) == vecs(2L))
    assert(math.abs(dot(vecs(1L), vecs(1L)) - 1.0) < 1e-12, "unit norm")
    assert(vecs(5L).forall(_ == 0.0), "empty text → zero vector")
    assert(dot(vecs(1L), vecs(3L)) > dot(vecs(1L), vecs(4L)),
      "shared-token doc must score closer than unrelated doc")
    // partition invariance (the groupBy path must not depend on layout)
    val emb2 = TextOps.hashEmbed(docs.repartition(5), "id", "text", dim = 64, seed = 7)
      .select(col("id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(emb2 == vecs)
    // the bridge: hashEmbed output feeds the semantic dedup path directly
    val centroids = SimilarityOps.ivfTrain(emb, "id", "embedding", nLists = 2)
    val pairs = SimilarityOps.semDedupPairs(emb, "id", "embedding", centroids, minSim = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("native hashEmbed is bit-identical to the declarative scatter-accumulate spec") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(13)
    val long = (1 to 300).map(i => s"w${rnd.nextInt(40)}tok$i").mkString(" ")
    val docs = Seq[(Long, String)](
      (1L, "alpha beta gamma delta epsilon"),
      (2L, ""),                              // no tokens → zero vector
      (3L, " \t\n\r\f "),
      (4L, "UPPER Case MiXeD tokens"),       // lowercase outside the expr
      (5L, "héllo wörld 日本語 emoji 😀 pair"), // multi-byte / astral
      (6L, "dup dup dup dup"),               // sign cancellation candidates
      (7L, long)).toDF("id", "text")
    for ((dim, seed) <- Seq((64, 7L), (8, 0L), (16, -3L))) {
      val native = TextOps.hashEmbed(docs, "id", "text", dim, seed)
        .select(col("id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
      val ref = TextOps.hashEmbedReference(docs, "id", "text", dim, seed)
        .select(col("id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
      assert(native == ref, s"dim=$dim seed=$seed")
    }
  }

  test("canonicalizeUrl strips fragments/tracking/default ports/trailing slash, lowers scheme+host") {
    val sp = spark
    import sp.implicits._
    val urls = Seq(
      (1L, "HTTPS://WWW.Example.com:443/Path/One/?utm_source=x&id=5#frag"),
      (2L, "http://example.org:80/a/b/?gclid=abc"),
      (3L, "https://example.net/x?id=1&utm_campaign=z&ref=tw"),
      (4L, "sub.example.io/p/"),
      (5L, "//cdn.example.co.uk/lib.js?fbclid=1"),
      (6L, "http://example.com:8080/q?a=1&b=2")).toDF("id", "url")
    val out = DomainOps.canonicalizeUrl(urls, "url")
      .select(col("id"), col("url_canonical")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "https://www.example.com/Path/One?id=5", out(1L))
    assert(out(2L) == "http://example.org/a/b", out(2L))
    assert(out(3L) == "https://example.net/x?id=1", out(3L))
    assert(out(4L) == "sub.example.io/p", out(4L))
    assert(out(5L) == "//cdn.example.co.uk/lib.js", out(5L))
    assert(out(6L) == "http://example.com:8080/q?a=1&b=2", out(6L)) // non-default port kept
  }

  test("canonicalizeUrl is idempotent; self-dedup against own corpus drops everything") {
    val sp = spark
    import sp.implicits._
    val urls = Seq(
      (1L, "HTTPS://WWW.Example.com:443/Path/One/?utm_source=x&id=5#frag"),
      (2L, "http://example.org:80/a/b/?gclid=abc"),
      (3L, "sub.example.io/p/"),
      (4L, "//cdn.example.co.uk/lib.js?fbclid=1"),
      (5L, "http://example.com:8080/q?a=1&b=2")).toDF("id", "url")
    val once = DomainOps.canonicalizeUrl(urls, "url")
      .select(col("id"), col("url_canonical").as("url"))
    val twice = DomainOps.canonicalizeUrl(once, "url")
      .select(col("id"), col("url_canonical").as("url"))
    assert(once.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      twice.collect().map(r => (r.getLong(0), r.getString(1))).toSet)

    // a batch deduped against an identical reference corpus keeps nothing
    // (every doc's shingle set equals its twin's)
    val docs = (1L to 10L).map(i => (i, longText(s"self$i"))).toDF("id", "text")
    val ref = docs.withColumn("id", col("id") + 100L)
    assert(TextOps.dedupAgainstCorpus(docs, ref, "id", "text", threshold = 1.0)
      .count() == 0L)
  }

  test("contaminationReport counts overlapping grams and contaminated corpus docs per benchmark doc") {
    val sp = spark
    import sp.implicits._
    val benchText = (1 to 20).map(i => s"bench$i").mkString(" ") // 20 tokens → 8 13-gram windows
    val corpus = Seq(
      (1L, benchText),                                  // full copy: all 8 windows
      (2L, (1 to 14).map(i => s"bench$i").mkString(" ")), // prefix: windows 1-2
      (3L, "entirely unrelated corpus text " + (1 to 20).map(i => s"c$i").mkString(" ")))
      .toDF("id", "text")
    val bench = Seq((100L, benchText), (101L, (1 to 20).map(i => s"clean$i").mkString(" ")))
      .toDF("bid", "text")
    val out = TextOps.contaminationReport(corpus, bench, "id", "bid", "text", n = 13)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(100L) == ((8L, 8L, 2L, 1.0)), s"got ${out(100L)}")
    assert(out(101L) == ((8L, 0L, 0L, 0.0)), s"got ${out(101L)}")
  }

  test("bigramPerplexity: bigram-predictable text scores lower perplexity than shuffled text") {
    val sp = spark
    import sp.implicits._
    // same unigram distribution in both docs, so the unigram tier cannot
    // tell them apart — only the bigram term can
    val ordered = (1 to 40).map(_ => "alpha beta gamma delta").mkString(" ")
    val shuffled = new scala.util.Random(3).shuffle(
      ((1 to 40).flatMap(_ => Seq("alpha", "beta", "gamma", "delta"))).toList).mkString(" ")
    val docs = Seq((1L, ordered), (2L, shuffled), (3L, "")).toDF("id", "text")
    val out = TextOps.bigramPerplexity(docs, "id", "text",
        vocabSize = 16, bigramVocabSize = 32, lambda = 0.75)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 160L && out(2L)._1 == 160L)
    assert(out(1L)._2 > out(2L)._2,
      s"ordered text must have higher logp: ${out(1L)._2} vs ${out(2L)._2}")
    assert(out(3L) == ((0L, 0.0)))
  }

  test("bigram LM: OOV-context tokens fall back to the unigram tier") {
    val sp = spark
    import sp.implicits._
    // vocab cap 2 keeps only {a, b} (counts 6/5); context "z" is OOV, so
    // tokens after z must score exactly as unigrams even though (z, a)
    // repeats — a capped-context model has no bigram evidence for z
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "z a z a z b a b")).toDF("id", "text")
    val model = TextOps.trainBigramLm(docs, "text", vocabSize = 2,
      bigramVocabSize = 32, alpha = 0.5, lambda = 0.75)
    // the bigram table only carries in-vocab contexts
    val ctxs = model.bigrams.select("_b1").distinct()
      .collect().map(_.getString(0)).toSet
    assert(ctxs.subsetOf(Set("a", "b")), s"OOV contexts leaked: $ctxs")
    // scoring a doc whose every context is OOV (z/w are outside the top-2
    // vocab; note pos-3 z follows OOV w, never in-vocab a) ≡ scoring it
    // under the unigram tier alone
    val probe = Seq((10L, "z w z w a")).toDF("id", "text")
    val big = TextOps.bigramScoreWithModel(probe, "id", "text", model)
      .select("sum_logp").head.getDouble(0)
    val uni = TextOps.lmScore(probe, "id", "text",
        TextOps.trainUnigramLm(docs, "text", vocabSize = 2, alpha = 0.5))
      .select("sum_logp").head.getDouble(0)
    assert(big == uni, s"OOV-context scoring must equal unigram: $big vs $uni")
  }

  test("bigram LM: broadcast scorer is bit-exact with the batch plan through a disk round trip") {
    val sp = spark
    import sp.implicits._
    val ordered = (1 to 40).map(_ => "alpha beta gamma delta").mkString(" ")
    val shuffled = new scala.util.Random(3).shuffle(
      ((1 to 40).flatMap(_ => Seq("alpha", "beta", "gamma", "delta"))).toList).mkString(" ")
    val docs = Seq((1L, Option(ordered)), (2L, Option(shuffled)), (3L, Option("")),
      (4L, Option("alpha beta zeta alpha")),
      (5L, Option.empty[String]),     // null text must score as the empty doc
      (6L, Option("solo")))           // 1-token doc: no bigram windows
      .toDF("id", "text")
    val model = TextOps.trainBigramLm(docs, "text", vocabSize = 4,
      bigramVocabSize = 8, alpha = 0.5, lambda = 0.75)
    // the descending-sequence trap: a 1-token doc must contribute NO
    // phantom (w, null)/(null, w) pairs to the bigram table
    assert(model.bigrams.filter(col("_b1").isNull || col("_b2").isNull).count() == 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_bigram_spec").toString
    TextOps.writeBigramLm(model, dir)
    val loaded = TextOps.loadBigramLm(sp, dir)
    assert(loaded.vocabSize == 4 && loaded.alpha == 0.5 && loaded.lambda == 0.75)
    // the joins form is the executable SPECIFICATION; the public batch path
    // delegates to the broadcast scorer, so pin all three pairwise
    val batch = TextOps.bigramScoreWithModelJoins(docs, "id", "text", model)
      .select("id", "n_tokens", "sum_logp")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val stream = TextOps.bigramScoreBroadcast(docs, "text", loaded)
      .select("id", "n_tokens", "sum_logp")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(batch == stream, s"joins $batch vs broadcast $stream")
    val public = TextOps.bigramScoreWithModel(docs, "id", "text", model)
      .select("id", "n_tokens", "sum_logp")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(public == batch, s"public $public vs joins $batch")
    assert(batch(3L) == ((0L, 0.0)))
    // null text: batch's left-join+coalesce and the broadcast scorer's
    // coalesced tokenizer must both yield the empty-document score (the
    // broadcast path used to NPE here — a batch≡stream parity break)
    assert(batch(5L) == ((0L, 0.0)) && stream(5L) == ((0L, 0.0)))
  }

  test("temperatureSample flattens the mixture toward low-resource strata, deterministically") {
    val sp = spark
    import sp.implicits._
    // 900 docs of "big", 100 of "small" → proportional 200-doc sample would
    // take 180/20; τ=2 weights sqrt(900):sqrt(100) = 3:1 → expect ~150/50
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "small"))).toDF("id", "lang")
    val out = graft.llm.SampleOps.temperatureSample(df, "id", "lang",
      targetTotal = 200, tau = 2.0, seed = 11)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = counts.getOrElse("big", 0L).toDouble
    val small = counts.getOrElse("small", 0L).toDouble
    assert(small > 30 && small < 70, s"small stratum ~50 expected, got $small")
    assert(big > 110 && big < 190, s"big stratum ~150 expected, got $big")
    assert(big / small < 900.0 / 100.0, "mix must be flatter than proportional")
    // deterministic across runs and partitionings
    val again = graft.llm.SampleOps.temperatureSample(df.repartition(7), "id", "lang",
      targetTotal = 200, tau = 2.0, seed = 11)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
    // a stratum whose rate caps at 1.0 is fully kept
    val tiny = ((0L until 5L).map(i => (i, "rare")) ++
      (100L until 1100L).map(i => (i, "common"))).toDF("id", "lang")
    val keptRare = graft.llm.SampleOps.temperatureSample(tiny, "id", "lang",
      targetTotal = 2000, tau = 2.0, seed = 1)
      .filter(col("lang") === "rare").count()
    assert(keptRare == 5L)
  }

  test("deterministicShard is a partition-invariant permutation with dense shard positions") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 100L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val a = MixOps.deterministicShard(df, "id", nShards = 4, seed = 7)
      .select("id", "shard_id", "shard_pos")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // same assignment regardless of physical partitioning
    val b = MixOps.deterministicShard(df.repartition(7), "id", nShards = 4, seed = 7)
      .select("id", "shard_id", "shard_pos")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a == b)
    // every row exactly once; per-shard positions dense from 0
    assert(a.size == 100)
    a.values.groupBy(_._1).foreach { case (shard, rows) =>
      val ps = rows.map(_._2).toSeq.sorted
      assert(ps == (0L until ps.length.toLong), s"shard $shard positions not dense: $ps")
    }
    // a different seed produces a different permutation
    val c = MixOps.deterministicShard(df, "id", nShards = 4, seed = 8)
      .select("id", "shard_id", "shard_pos")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a != c)
  }

  test("dedupParagraphs keeps first occurrence, preserves blanks and structure") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "unique one\n\nshared para\ntail one"),
      (2L, "unique two\nshared para\n\ntail two"), // loses 'shared para'
      (3L, "shared para\nunique three"), // loses it too (doc 1 was first)
      (4L, "repeat me\nrepeat me\nunique four"), // intra-doc dup: 2nd goes
      (5L, "unique one\n\nshared para\ntail one") // full copy of doc 1: all dropped
    ).toDF("id", "text")
    val out = graft.llm.TextOps.dedupParagraphs(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === ("unique one\n\nshared para\ntail one", 0L))
    assert(out(2L) === ("unique two\n\ntail two", 1L))
    assert(out(3L) === ("unique three", 1L))
    assert(out(4L) === ("repeat me\nunique four", 1L))
    assert(out(5L) === ("", 3L), "a full duplicate keeps only its blank line")
    // whitespace-variant paragraphs dedup (trim before hashing)…
    val ws = Seq((1L, "alpha beta"), (2L, "  alpha beta  ")).toDF("id", "text")
    val wsOut = graft.llm.TextOps.dedupParagraphs(ws, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wsOut(1L) === "alpha beta" && wsOut(2L) === "")
    // …and the decision is partition-invariant
    val p1 = graft.llm.TextOps.dedupParagraphs(docs.repartition(1), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val p7 = graft.llm.TextOps.dedupParagraphs(docs.repartition(7), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p1 === p7)
    // scale shape: paragraph text never crosses an exchange (only
    // (id, pos, hash) and the slim drop-set do; the id-keyed rebuild join
    // carries the base rows, whose join is on the bounded drop side)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shuffles = graft.llm.TextOps.dedupParagraphs(docs, "id", "text")
      .queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.forall(!_.child.output.exists(c => c.name == "_l")),
      "exploded paragraph text must die before any exchange")
  }

  test("corpusDiff classifies added/removed/changed, hides the unchanged bulk by default") {
    val sp = spark
    import sp.implicits._
    val oldC = Seq(
      (1L, "same text"),
      (2L, "will change"),
      (3L, "will be removed"),
      (5L, null.asInstanceOf[String]), // null -> text : changed
      (6L, null.asInstanceOf[String]), // null -> null : unchanged
      (7L, "")).toDF("id", "text") // "" -> null : changed (null != empty)
    val newC = Seq(
      (1L, "same text"),
      (2L, "has changed"),
      (4L, "brand new"),
      (5L, "now has text"),
      (6L, null.asInstanceOf[String]),
      (7L, null.asInstanceOf[String])).toDF("id", "text")
    val delta = graft.llm.ReportOps.corpusDiff(oldC, newC, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(delta === Map(2L -> "changed", 3L -> "removed", 4L -> "added",
      5L -> "changed", 7L -> "changed"))
    val full = graft.llm.ReportOps.corpusDiff(oldC, newC, "id", "text",
      includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.size === 7)
    assert(full(1L) === "unchanged" && full(6L) === "unchanged")
    // summary reconciles with both versions' counts
    val summary = graft.llm.ReportOps.corpusDiffSummary(oldC, newC, "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary === Map("added" -> 1L, "removed" -> 1L, "changed" -> 3L,
      "unchanged" -> 2L))
    assert(summary("removed") + summary("changed") + summary("unchanged") === oldC.count())
    assert(summary("added") + summary("changed") + summary("unchanged") === newC.count())
    // scale shape: only the slim (id, flags, fp) projections cross the join
    // exchange — document text never shuffles
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shuffles = graft.llm.ReportOps.corpusDiff(oldC, newC, "id", "text")
      .queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.forall(!_.child.output.exists(_.name == "text")),
      "corpusDiff must never shuffle document text")
  }
}

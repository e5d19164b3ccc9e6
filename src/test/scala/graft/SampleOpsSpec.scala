package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{SampleOps, TextOps}

/** Deterministic sampling + corpus-curation ops: reproducibility, subset
  * nesting across rates, split totality, chunk reconstruction, scrubbing. */
class SampleOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-sample-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ids(n: Int) = {
    val sp = spark
    import sp.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("sampleBernoulli is deterministic, rate-accurate, and partition-invariant") {
    val df = ids(20000)
    val a = SampleOps.sampleBernoulli(df, "id", 0.3, seed = 7).collect().map(_.getLong(0)).toSet
    val b = SampleOps.sampleBernoulli(df.repartition(13), "id", 0.3, seed = 7)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning")
    val rate = a.size.toDouble / 20000
    assert(math.abs(rate - 0.3) < 0.02, s"empirical rate $rate should be ~0.3")
    // a different seed draws a genuinely different sample
    val c = SampleOps.sampleBernoulli(df, "id", 0.3, seed = 8).collect().map(_.getLong(0)).toSet
    assert(a != c)
  }

  test("samples nest: rate 0.1 with the same seed is a subset of rate 0.3") {
    val df = ids(5000)
    val small = SampleOps.sampleBernoulli(df, "id", 0.1, 42).collect().map(_.getLong(0)).toSet
    val big = SampleOps.sampleBernoulli(df, "id", 0.3, 42).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "hash-threshold samples must be nested in rate")
  }

  test("assignSplit labels every row exactly once with ~requested proportions") {
    val df = ids(20000)
    val out = SampleOps.assignSplit(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), 42)
    assert(out.count() == 20000)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.01)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.01)
    // splits are disjoint by construction (single label column); stable
    val again = SampleOps.assignSplit(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), 42)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("sampleStratified applies per-stratum rates with a default") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 9000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
      .toDF("id", "lang")
    val out = SampleOps.sampleStratified(df, "id", "lang",
      Map("en" -> 0.5, "zh" -> 0.0), defaultRate = 0.2, seed = 1)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en") / 3000.0 - 0.5) < 0.05)
    assert(!counts.contains("zh"), "rate-0 stratum must vanish")
    assert(math.abs(counts("fr") / 3000.0 - 0.2) < 0.05)
  }

  test("validation: bad rates and weights fail fast") {
    val df = ids(10)
    intercept[IllegalArgumentException](SampleOps.sampleBernoulli(df, "id", 1.2, 1))
    intercept[IllegalArgumentException](SampleOps.assignSplit(df, "id", Seq("a" -> 0.5), 1))
    intercept[IllegalArgumentException](
      SampleOps.assignSplit(df, "id", Seq("a" -> 0.7, "b" -> -0.3, "c" -> 0.6), 1))
    intercept[IllegalArgumentException](TextOps.chunkByTokens(df, "id", "id", 4, 4))
  }

  test("chunkByTokens: overlapped windows reconstruct the token stream") {
    val sp = spark
    import sp.implicits._
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc"), (3L, "exact four token doc")).toDF("doc_id", "text")
    val out = TextOps.chunkByTokens(df, "doc_id", "text", maxTokens = 32, overlap = 8)
      .select("doc_id", "chunk_id", "chunk_text", "chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 100 tokens, window 32, step 24 → ceil((100-8)/24) = 4 chunks
    assert(d1.length == 4)
    assert(d1.forall(c => c._4 == c._3.split(" ").length))
    assert(d1.head._3.startsWith("w1 ") && d1.last._3.endsWith(" w100"))
    // consecutive chunks overlap by exactly 8 tokens
    val t0 = d1(0)._3.split(" "); val t1 = d1(1)._3.split(" ")
    assert(t0.takeRight(8).sameElements(t1.take(8)))
    // de-overlapped concatenation reproduces the original token stream
    val rebuilt = d1.head._3.split(" ") ++ d1.tail.flatMap(_._3.split(" ").drop(8))
    assert(rebuilt.sameElements(text.split(" ")))
    // short docs yield exactly one whole chunk
    assert(out.filter(_._1 == 2L).map(c => (c._2, c._3)).toSeq == Seq((0L, "short doc")))
  }

  test("packSequences: deterministic layout, bounded pack sizes, conservation") {
    val sp = spark
    import sp.implicits._
    // 400 chunks of 10-40 tokens across 50 docs
    val chunks = (0L until 400L).map(i => (i % 50, i / 50, 10L + (i % 4) * 10L))
      .toDF("doc_id", "chunk_id", "chunk_tokens")
    val packed = TextOps.packSequences(chunks, "doc_id", "chunk_id", "chunk_tokens",
      budget = 100, nBuckets = 4)
    assert(packed.count() == 400, "packing must not drop or duplicate rows")
    // identical assignment regardless of input partitioning (layout is
    // (hash-bucket, id, chunk), never partition order)
    val again = TextOps.packSequences(chunks.repartition(7), "doc_id", "chunk_id",
      "chunk_tokens", budget = 100, nBuckets = 4)
    assert(packed.except(again).count() == 0 && again.except(packed).count() == 0)
    // each pack holds <= budget + (max row tokens - 1); it can only overflow
    // by the straddling row
    val sizes = packed.groupBy("pack_id").agg(sum("chunk_tokens").as("tok"))
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 100 + 40 - 1), s"pack overflow bound violated: ${sizes.max}")
    assert(sizes.sum == chunks.agg(sum("chunk_tokens")).head().getLong(0))
    // packs within a bucket are dense: all but the last reach the boundary
    val perPack = packed.groupBy("pack_id").agg(sum("chunk_tokens").as("tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byBucket = perPack.groupBy(_._1 / 4294967296L)
    byBucket.foreach { case (_, ps) =>
      val nonLast = ps.sortBy(_._1).init
      assert(nonLast.forall(_._2 >= 100 - 39), "non-final packs must be near the budget")
    }
  }

  test("contaminatedIds flags 13-gram overlap with benchmarks, not shorter overlap") {
    val sp = spark
    import sp.implicits._
    val benchText = (1 to 30).map(i => s"b$i").mkString(" ")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val corpus = Seq(
      // contains b5..b17 = 13 consecutive benchmark tokens → contaminated
      (1L, "clean prefix " + (5 to 17).map(i => s"b$i").mkString(" ") + " clean suffix"),
      // only 12 consecutive benchmark tokens → clean
      (2L, "clean prefix " + (5 to 16).map(i => s"b$i").mkString(" ") + " clean suffix"),
      // same 13 tokens but interrupted → clean
      (3L, (5 to 11).map(i => s"b$i").mkString(" ") + " X " + (12 to 17).map(i => s"b$i").mkString(" ")),
      (4L, "entirely unrelated words in this document body")
    ).toDF("doc_id", "text")
    val flagged = TextOps.contaminatedIds(corpus, bench, "doc_id", "text", n = 13)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L))
  }

  test("repetitionStats: dup fractions match hand counts, degenerate text scores high") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "a b c d"),                  // all unique: 0 everywhere
      (2L, "spam spam spam spam"),      // 4 tokens 1 distinct; 3 bigrams 1 distinct
      (3L, "x"),                        // single token: no bigrams/trigrams
      (4L, "a b a b a b")               // tokens 6/2; bigrams 5 distinct 2; trigrams 4 distinct 2
    ).toDF("doc_id", "text")
    val got = graft.llm.TextOps.repetitionStats(df, "text")
      .select("doc_id", "dup_token_frac", "dup_2gram_frac", "dup_3gram_frac")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) == ((0.0, 0.0, 0.0)))
    assert(got(2L) == ((0.75, math.rint((1 - 1.0 / 3) * 1e6) / 1e6, 0.5)))
    assert(got(3L) == ((0.0, 0.0, 0.0)))
    assert(got(4L)._1 == math.rint((1 - 2.0 / 6) * 1e6) / 1e6)
    assert(got(4L)._2 == 0.6 && got(4L)._3 == 0.5)
  }

  test("weightedSampleK matches the A-ES reference fold and is partition-invariant") {
    val sp = spark; import sp.implicits._
    val n = 400
    val df = (1L to n.toLong).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    val seed = 37L
    // single-node reference: mixer draw -> log-domain key -> top-k cut
    val P = SampleOps.P
    val mult = 2654435761L % P
    def mix(id: Long): Long = {
      var x = (((id % P) + P) % P * mult + seed % P) % P
      (0 until 3).foreach(_ => x = ((x ^ (x >> 16)) * 48271L) % P)
      x
    }
    def key(id: Long, w: Double): Double = {
      val raw = math.log((mix(id) + 1).toDouble / P.toDouble) / w
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = (1L to n.toLong).map(i => (i, key(i, (i % 7 + 1).toDouble)))
      .sortBy { case (id, s) => (-s, id) }.take(50).toSet
    for (parts <- Seq(1, 5)) {
      val got = SampleOps.weightedSampleK(df.repartition(parts), "id", "w", 50, seed)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("weightedSampleK favors heavy weights; k >= n returns all positive-weight rows") {
    val sp = spark; import sp.implicits._
    val heavy = (1L to 100L).map(i => (i, 9.0))
    val light = (101L to 500L).map(i => (i, 1.0))
    val df = (heavy ++ light).toDF("id", "w")
    var heavyHits = 0; var lightHits = 0
    for (seed <- 1L to 20L) {
      val picked = SampleOps.weightedSampleK(df, "id", "w", 50, seed)
        .collect().map(_.getLong(0)).toSet
      heavyHits += picked.count(_ <= 100)
      lightHits += picked.count(_ > 100)
    }
    // heavy ids are 9x likelier per draw (pool weight 900 vs 400, depleting
    // as heavies are drawn): ~63% of slots go heavy; an unweighted sample
    // would give 20%. Assert well above unweighted, below exhaustion.
    assert(heavyHits > 1.5 * lightHits, s"heavy=$heavyHits light=$lightHits")
    val all = (1L to 10L).map(i => (i, i.toDouble)) :+ ((11L, 0.0)) :+ ((12L, -1.0))
    val full = SampleOps.weightedSampleK(all.toDF("id", "w"), "id", "w", 100, 5L)
    assert(full.collect().map(_.getLong(0)).toSet == (1L to 10L).toSet)
  }

  test("weightedSampleK per group: independent quotas, unaffected by other groups") {
    val sp = spark; import sp.implicits._
    val a = (1L to 50L).map(i => ("a", i, 1.0 + i))
    val b = (51L to 90L).map(i => ("b", i, 2.0))
    val df = (a ++ b).toDF("g", "id", "w")
    val out = SampleOps.weightedSampleK(df, "id", "w", 10, 7L, Seq("g"))
    val byG = out.collect().groupBy(_.getString(0))
    assert(byG("a").length == 10 && byG("b").length == 10)
    // group a's selection is a function of group a's rows only
    val aOnly = SampleOps.weightedSampleK(a.toDF("g", "id", "w"), "id", "w",
      10, 7L, Seq("g"))
    assert(aOnly.collect().map(r => (r.getLong(1), r.getDouble(2))).toSet ==
      byG("a").map(r => (r.getLong(1), r.getDouble(2))).toSet)
  }

  test("piiScrub masks urls, emails, and long digit runs; normalize canonicalizes") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L,
      "Mail a.b+c@x-mail.example.org or see https://ex.org/a?b=1 code 123456789 but keep 42 and a@b short"))
      .toDF("id", "text")
    val got = TextOps.piiScrub(df, "text").select("text_scrubbed").head().getString(0)
    assert(got == "Mail <EMAIL> or see <URL> code <ID> but keep 42 and a@b short")
    val norm = TextOps.textNormalize(
      Seq((1L, "  A\t\tB   c\nD  ")).toDF("id", "text"), "text")
      .select("text_norm").head().getString(0)
    assert(norm == "a b c d")
  }
}

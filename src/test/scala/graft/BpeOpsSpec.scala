package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.BpeOps

/** BPE train/encode against hand-computed merge sequences (the classic
  * Sennrich worked example shape) plus the greedy-scan edge cases. */
class BpeOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-bpe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("merge sequence matches the hand-computed BPE on a planted corpus") {
    val sp = spark
    import sp.implicits._
    // word counts: ab x6, abc x4, bc x3  ->
    // pair counts r1: (a,b)=10, (b,c)=7  -> merge ab
    // r2: (ab,c)=4, (b,c)=3             -> merge abc
    // r3: (b,c)=3                       -> merge bc
    val corpus = (Seq.fill(6)("ab") ++ Seq.fill(4)("abc") ++ Seq.fill(3)("bc"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val merges = BpeOps.bpeTrain(corpus, "text", numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.merged, m.pair_count)) == Seq(
      ("a", "b", "ab", 10L), ("ab", "c", "abc", 4L), ("b", "c", "bc", 3L)),
      s"got $merges")
  }

  test("count ties break by pair string ascending, deterministically") {
    val sp = spark
    import sp.implicits._
    // "xy" x2 and "pq" x2: pairs (p,q)=2 and (x,y)=2 tie -> (p,q) first
    val corpus = Seq((1L, "xy pq"), (2L, "pq xy")).toDF("id", "text")
    val m = BpeOps.bpeTrain(corpus, "text", numMerges = 1)
    assert(m.head.merged == "pq", s"got $m")
  }

  test("greedy merge fires on adjacent chain sites and stops below minPairFreq") {
    val sp = spark
    import sp.implicits._
    // "aaaa" x3: pairs (a,a)=9 -> merge aa; "aaaa" -> [aa, aa];
    // then (aa,aa)=3 -> merge aaaa; then no pair has count >= 2
    val corpus = Seq.tabulate(3)(i => (i.toLong, "aaaa")).toDF("id", "text")
    val merges = BpeOps.bpeTrain(corpus, "text", numMerges = 10)
    assert(merges.map(_.merged) == Seq("aa", "aaaa"), s"got $merges")
    val enc = BpeOps.bpeEncode(corpus, "text", merges)
      .select("bpe_tokens").head.getSeq[String](0)
    assert(enc == Seq("aaaa"), s"got $enc")
  }

  test("encode applies merges in rank order and counts subwords per doc") {
    val sp = spark
    import sp.implicits._
    val train = (Seq.fill(6)("ab") ++ Seq.fill(4)("abc") ++ Seq.fill(3)("bc"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val merges = BpeOps.bpeTrain(train, "text", numMerges = 3)
    val docs = Seq((1L, "abc ab bc"), (2L, "cab"), (3L, "")).toDF("id", "text")
    val rows = BpeOps.bpeEncode(docs, "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](2).toList, r.getLong(3))).toMap
    assert(rows(1L) == ((List("abc", "ab", "bc"), 3L)), s"got ${rows(1L)}")
    // "cab": c + ab (merge 1 applies inside the word)
    assert(rows(2L) == ((List("c", "ab"), 2L)), s"got ${rows(2L)}")
    assert(rows(3L) == ((Nil, 0L)), s"got ${rows(3L)}")
  }

  test("BPE is SQL-callable as table macros (registry route)") {
    val sp = spark
    import sp.implicits._
    graft.sql.Register.registerAll(sp)
    (Seq.fill(6)("ab") ++ Seq.fill(4)("abc") ++ Seq.fill(3)("bc"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
      .createOrReplaceTempView("bpedocs")
    val merges = sp.sql("SELECT merged FROM bpe_train('bpedocs', 'text', 5)")
      .collect().map(_.getString(0)).toSeq
    assert(merges == Seq("ab", "abc", "bc"), s"got $merges")
    val counts = sp.sql(
      "SELECT id, bpe_tokens_count FROM bpe_self_encode('bpedocs', 'text', 3)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 1L), s"every train word is one token, got $counts")
  }

  test("bpeTrainLocal equals the SQL-loop bpeTrain, including ties and multi-byte symbols") {
    val sp = spark
    import sp.implicits._
    // mixes the hand-computed example, a count tie, a greedy chain, and a
    // multi-byte (2- and 3-byte UTF-8) word whose tie-break exercises the
    // binary-byte order the SQL loop sorts in
    val corpus = (Seq.fill(6)("ab") ++ Seq.fill(4)("abc") ++ Seq.fill(3)("bc") ++
      Seq.fill(3)("aaaa") ++ Seq.fill(2)("xy pq") ++ Seq.fill(2)("héllo") ++
      Seq.fill(2)("日本語"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    for (k <- Seq(1, 3, 8)) {
      val sql = BpeOps.bpeTrain(corpus, "text", numMerges = k)
      val local = BpeOps.bpeTrainLocal(corpus, "text", numMerges = k)
      assert(local == sql, s"numMerges=$k: local $local vs sql $sql")
    }
    // minPairFreq early stop agrees too
    assert(BpeOps.bpeTrainLocal(corpus, "text", 20, minPairFreq = 4L) ==
      BpeOps.bpeTrain(corpus, "text", 20, minPairFreq = 4L))
  }

  test("bpeTrainLocal trains 1000+ merges in seconds (one Spark job total)") {
    val sp = spark
    import sp.implicits._
    // vocabulary-rich synthetic corpus: enough distinct pairs to sustain
    // >1000 merges above minPairFreq (deterministic word soup)
    val words = (0 until 3000).map { i =>
      val syll = Seq("ka", "to", "ri", "mu", "se", "lo", "ba", "ne", "di", "fu")
      val w = syll(i % 10) + syll((i / 10) % 10) + syll((i / 100) % 10) + (i % 7)
      (i.toLong, Seq.fill(2 + i % 3)(w).mkString(" "))
    }
    val corpus = words.toDF("id", "text")
    val t0 = System.nanoTime()
    val merges = BpeOps.bpeTrainLocal(corpus, "text", numMerges = 1200,
      minPairFreq = 1L)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length >= 1000, s"expected >= 1000 merges, got ${merges.length}")
    assert(secs < 60.0, s"driver-side loop must run in seconds, took $secs s")
    // ranks are sequential and merges well-formed
    assert(merges.map(_.rank) == (1 to merges.length))
    assert(merges.forall(m => m.merged == m.left + m.right))
  }

  test("bpeTrainLocal sustains a 30k-merge production vocabulary on a heavy-tail corpus") {
    val sp = spark
    import sp.implicits._
    // heavy-tail word soup: ~47k types over 4 syllable alphabets with
    // Zipf-ish repetition — enough distinct adjacent pairs to sustain tens
    // of thousands of merges (the production vocab size the lazy-heap
    // argmax exists for; the old full-map scan was O(#pairs × merges))
    val syll = Seq("ka", "to", "ri", "mu", "se", "lo", "ba", "ne", "di", "fu",
      "pa", "go", "zu", "we", "chi", "ro", "ta", "mi", "ho", "ju")
    val docs = (0 until 30000).map { i =>
      val w1 = syll(i % 20) + syll((i / 20) % 20) + syll((i / 400) % 20)
      val w2 = syll((i * 7) % 20) + syll((i * 13 + 5) % 20) + (i % 997) + syll((i * 3) % 20)
      val w3 = syll((i * 11 + 3) % 20) + (i % 89) + syll((i * 17 + 7) % 20)
      val reps = 1 + (i % 5)
      (i.toLong, (Seq.fill(reps)(w1) ++ Seq(w2, w3)).mkString(" "))
    }
    val corpus = docs.toDF("id", "text")
    val t0 = System.nanoTime()
    val merges = BpeOps.bpeTrainLocal(corpus, "text", numMerges = 30000,
      minPairFreq = 1L)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length >= 25000, s"expected >= 25000 merges, got ${merges.length}")
    assert(secs < 120.0, s"30k merges must be driver-loop fast, took $secs s")
    assert(merges.map(_.rank) == (1 to merges.length))
    // greedy invariant: equal-count runs tie-break by wrapped key, so the
    // count sequence is non-increasing only per merge's own snapshot — but
    // every merge must have been above the floor
    assert(merges.forall(_.pair_count >= 1L))
  }

  test("lazy-heap argmax equals the SQL loop on seeded random corpora (tie-heavy)") {
    val sp = spark
    import sp.implicits._
    // small alphabets force frequent count ties, the case the heap's
    // (count, wrapped-key-utf8) ordering must get exactly right
    for (seed <- Seq(101, 202, 303)) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcd" + "éя日"  // multi-byte ties included
      val docs = (0 until 60).map { i =>
        val words = (0 to rnd.nextInt(4)).map { _ =>
          (0 to 1 + rnd.nextInt(4)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        }
        (i.toLong, words.mkString(" "))
      }.toDF("id", "text")
      val fast = BpeOps.bpeTrainLocal(docs, "text", numMerges = 25, minPairFreq = 1L)
      val slow = BpeOps.bpeTrain(docs, "text", numMerges = 25, minPairFreq = 1L)
      assert(fast == slow, s"seed=$seed")
    }
  }

  test("minWordFreq / maxTypes bound the driver collect, defaults stay exact") {
    val sp = spark
    import sp.implicits._
    // hapax-heavy fixture: 3 frequent types + a long tail of singletons
    val frequent = Seq.fill(20)("alpha beta").map(s => s) ++ Seq.fill(15)("beta gamma")
    val hapax = (0 until 200).map(i => s"junk${i}x$i")
    val docs = (frequent ++ hapax).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // defaults == the exact SQL loop (the existing equality pin's contract)
    val exact = BpeOps.bpeTrainLocal(docs, "text", numMerges = 10)
    assert(exact == BpeOps.bpeTrain(docs, "text", numMerges = 10))
    // a freq floor of 2 removes every hapax type from the driver state; the
    // surviving statistics are exactly the frequent types' — equal to
    // training on the frequent subset alone
    val floored = BpeOps.bpeTrainLocal(docs, "text", numMerges = 10, minWordFreq = 2L)
    val frequentOnly = BpeOps.bpeTrainLocal(
      frequent.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      "text", numMerges = 10)
    assert(floored == frequentOnly)
    // maxTypes keeps the top-N types by (freq desc, word asc) — with N=3
    // only alpha/beta/gamma survive, same result as the frequent subset
    val capped = BpeOps.bpeTrainLocal(docs, "text", numMerges = 10, maxTypes = 3)
    assert(capped == frequentOnly)
  }

  test("bpeEncodeFast equals the stacked-replace bpeEncode") {
    val sp = spark
    import sp.implicits._
    val train = (Seq.fill(6)("ab") ++ Seq.fill(4)("abc") ++ Seq.fill(3)("bc") ++
      Seq.fill(3)("aaaa") ++ Seq.fill(2)("héllo héllo") ++ Seq.fill(2)("日本 日本"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val merges = BpeOps.bpeTrain(train, "text", numMerges = 8)
    val docs = Seq((1L, "abc ab bc"), (2L, "cab"), (3L, ""), (4L, "aaaa aaa"),
      (5L, "héllo world 日本 text"), (6L, "AB aB x\u0001y")).toDF("id", "text")
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "bpe_tokens", "bpe_tokens_count")
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1).toList, r.getLong(2)))
      .toMap
    val slow = snap(BpeOps.bpeEncode(docs, "text", merges))
    val fast = snap(BpeOps.bpeEncodeFast(docs, "text", merges))
    assert(fast == slow, s"fast $fast vs replay $slow")
  }

  test("bpeEncodeFast handles a 1200-merge vocabulary in one map pass") {
    val sp = spark
    import sp.implicits._
    val words = (0 until 3000).map { i =>
      val syll = Seq("ka", "to", "ri", "mu", "se", "lo", "ba", "ne", "di", "fu")
      val w = syll(i % 10) + syll((i / 10) % 10) + syll((i / 100) % 10) + (i % 7)
      (i.toLong, Seq.fill(2 + i % 3)(w).mkString(" "))
    }
    val corpus = words.toDF("id", "text")
    val merges = BpeOps.bpeTrainLocal(corpus, "text", numMerges = 1200,
      minPairFreq = 1L)
    assert(merges.length >= 1000)
    val t0 = System.nanoTime()
    val out = BpeOps.bpeEncodeFast(corpus, "text", merges)
      .agg(org.apache.spark.sql.functions.sum("bpe_tokens_count")).collect()(0).getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out > 0)
    assert(secs < 30.0, s"encode with 1200 merges must be map-pass cheap, took $secs s")
    // heavily-merged corpus: most words collapse into few subwords
    val counts = BpeOps.bpeEncodeFast(corpus, "text", merges)
      .select("bpe_tokens_count").collect().map(_.getLong(0))
    val nWords = words.map(_._2.split(" ").length.toLong)
    assert(counts.sum < nWords.sum * 4, "merges must compress well below char count")
  }

  test("training is partition-invariant") {
    val sp = spark
    import sp.implicits._
    val corpus = (Seq.fill(5)("hello") ++ Seq.fill(4)("help") ++ Seq.fill(2)("yelp"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val a = BpeOps.bpeTrain(corpus.repartition(1), "text", 4)
    val b = BpeOps.bpeTrain(corpus.repartition(7), "text", 4)
    assert(a == b)
  }
}

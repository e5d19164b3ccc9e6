package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{QuantileOps, SimilarityOps, TextOps}

/** Round-10 operator properties: trigram stupid-backoff LM vs an
  * independently-coded reference scorer (the randomized-reference pattern
  * that caught the MMR negative-max bug), the KLL percentile gate's two
  * regimes, quality-aware canonical keep, and semantic decontamination's
  * exhaustive-probe == brute-force identity. */
class Round10OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-round10-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---------------------------------------------------- trigram reference

  /** Independent plain-Scala stupid-backoff scorer (maps + loops): same
    * cuts (count desc, gram ascending), same tier rules, same
    * rounded-scaled-long accumulation. */
  private def refTrigramScores(docs: Seq[(Long, String)], v: Int, b: Int,
                               t: Int, alpha: Double, bo: Double): Map[Long, (Long, Double)] = {
    def toks(s: String): Seq[String] =
      s.trim.split("[ \t\n\r\f]+").filter(_.nonEmpty).toSeq
    val all = docs.flatMap(d => toks(d._2))
    val counts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.size.toLong
    val vocab = counts.toSeq.sortBy { case (tk, c) => (-c, tk) }.take(v).toMap
    val big0 = docs.flatMap(d => toks(d._2).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case ((b1, _), _) => vocab.contains(b1) }
    val bigrams = big0.sortBy { case ((b1, b2), c) => (-c, b1, b2) }.take(b).toMap
    val tri0 = docs.flatMap(d => toks(d._2).sliding(3).filter(_.size == 3)
        .map(p => (p(0), p(1), p(2))))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case ((t1, t2, _), _) => bigrams.contains((t1, t2)) }
    val trigrams = tri0.sortBy { case ((t1, t2, t3), c) => (-c, t1, t2, t3) }
      .take(t).toMap
    val denom = n + alpha * (v + 1)
    docs.map { case (id, text) =>
      val ts = toks(text)
      var s = 0L
      var i = 0
      while (i < ts.length) {
        val w = ts(i)
        val puni = (vocab.getOrElse(w, 0L) + alpha) / denom
        val lp =
          if (i == 0) math.log(puni)
          else {
            val wp = ts(i - 1)
            val s2 = (bigrams.get((wp, w)), vocab.get(wp)) match {
              case (Some(c2), Some(c1)) => c2.toDouble / c1.toDouble
              case _ => bo * puni
            }
            if (i == 1) math.log(s2)
            else {
              val wpp = ts(i - 2)
              val s3 = trigrams.get((wpp, ts(i - 1), w)) match {
                case Some(c3) => c3.toDouble / bigrams((wpp, ts(i - 1))).toDouble
                case None => bo * s2
              }
              math.log(s3)
            }
          }
        s += java.math.BigDecimal.valueOf(lp)
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact()
        i += 1
      }
      id -> (ts.length.toLong,
        new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 6).doubleValue())
    }.toMap
  }

  test("trigram LM: exact parity with the independent reference on random corpora") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(59)
    val words = Vector("a", "b", "c", "dd", "ee", "fff", "gg")
    for (trial <- 0 until 6) {
      val docs = (1L to 20L).map { id =>
        val len = 1 + rnd.nextInt(12)
        (id, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val (v, b, t) = (4 + rnd.nextInt(4), 6 + rnd.nextInt(8), 8 + rnd.nextInt(10))
      val got = TextOps.trigramPerplexity(docs.toDF("id", "text"), "id", "text",
          vocabSize = v, bigramVocabSize = b, trigramVocabSize = t)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val want = refTrigramScores(docs, v, b, t, 0.5, 0.4)
      assert(got === want, s"trial $trial (v=$v b=$b t=$t)")
    }
  }

  test("trigram LM: more context never hurts templated text; partition invariance; round trip") {
    val sp = spark; import sp.implicits._
    // heavily templated corpus: the trigram tier assigns near-1 ratios the
    // bigram tier cannot represent ("a b" continues to c or d equally, but
    // "x a b" always continues to c)
    val docs = (1L to 30L).map { id =>
      val tail = if (id % 2 == 0) "x a b c" else "y a b d"
      (id, (tail + " ") * 5)
    }
    val df = docs.toDF("id", "text")
    val tri = TextOps.trigramPerplexity(df, "id", "text",
        vocabSize = 64, bigramVocabSize = 256, trigramVocabSize = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap // mean_logp
    val bi = TextOps.bigramPerplexity(df, "id", "text",
        vocabSize = 64, bigramVocabSize = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // on this fixture the trigram mean log-probability must beat bigram's
    val (mTri, mBi) = (tri.values.sum / tri.size, bi.values.sum / bi.size)
    assert(mTri > mBi, s"trigram mean_logp $mTri must exceed bigram $mBi")

    val a = TextOps.trigramPerplexity(df.repartition(7), "id", "text",
        vocabSize = 64, bigramVocabSize = 256, trigramVocabSize = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = TextOps.trigramPerplexity(df, "id", "text",
        vocabSize = 64, bigramVocabSize = 256, trigramVocabSize = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b, "sum_logp must be partition-invariant")

    val model = TextOps.trainTrigramLm(df, "text", vocabSize = 64,
      bigramVocabSize = 256, trigramVocabSize = 1024)
    val dir = java.nio.file.Files.createTempDirectory("tri-rt").toString
    TextOps.writeTrigramLm(model, dir)
    val direct = TextOps.trigramScoreWithModel(df, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val loaded = TextOps.trigramScoreWithModel(df, "id", "text",
        TextOps.loadTrigramLm(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(direct === loaded, "persisted round trip must score identically")
  }

  // ------------------------------------------------- percentile-from-sketch

  test("percentile gate: exact regime == cume_dist; null/NaN score null; approx bound holds") {
    val sp = spark; import sp.implicits._
    val scored = (1 to 400).map(i => (i.toLong, (i * 13 % 127) * 0.25))
      .toDF("id", "sc")
    val summary = QuantileOps.sketchSummary(scored, "sc", capacity = 4096)
    val got = QuantileOps.percentileFromSummary(scored, "sc", summary)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // independent cume_dist on the rounded score
    val vals = scored.collect().map(r => r.getLong(0) ->
      BigDecimal(r.getDouble(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).toMap
    val sorted = vals.values.toSeq.sorted
    vals.foreach { case (id, v) =>
      val c = sorted.count(_ <= v)
      val want = BigDecimal(c.toDouble / 400)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === want, s"id $id")
    }
    // null / NaN scores emit null
    val edge = Seq((1L, Some(1.0)), (2L, None), (3L, Some(Double.NaN)))
      .toDF("id", "sc")
    val e = QuantileOps.percentileFromSummary(edge, "sc", summary)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(e(2L).isEmpty && e(3L).isEmpty && e(1L).nonEmpty)

    // approximate regime: |est - true| * n <= err
    val big = (1 to 30000).map(i => (i.toLong, math.log(i.toDouble))).toDF("id", "sc")
    val sk = QuantileOps.sketchSummary(big, "sc", capacity = 128)
    val skRow = sk.collect()(0)
    val err = skRow.getLong(skRow.fieldIndex("err"))
    assert(err > 0)
    val sample = QuantileOps.percentileFromSummary(
        big.filter(col("id") % 997 === 0), "sc", sk)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    sample.foreach { case (id, est) =>
      val truePct = id.toDouble / 30000 // log is monotone; rank == id
      assert(math.abs(est - truePct) * 30000 <= err + 1,
        s"id $id: est $est vs true $truePct exceeds err $err")
    }
  }

  // --------------------------------------------------------- keep-by-best

  test("dedupKeepBest: chains keep one best; NaN loses; all-null cluster keeps min id") {
    val sp = spark; import sp.implicits._
    val rows = Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, 9.0), (3L, 9.0),      // chain 1-2-3: tie 9.0 → id 2
      (4L, Double.NaN), (5L, 1.0),          // 4-5: NaN loses to 1.0
      (6L, null), (7L, null),               // 6-7: all null → min id 6
      (8L, 0.5))                            // singleton
    val df = rows.toDF("id", "sc")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L)).toDF("id_a", "id_b")
    val kept = TextOps.dedupKeepBest(df, "id", "sc", pairs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 5L, 6L, 8L))
    // partition invariance
    val kept2 = TextOps.dedupKeepBest(df.repartition(5), "id", "sc",
        pairs.repartition(3))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
  }

  // ------------------------------------------------- semantic decontamination

  test("semanticDecontaminate: exhaustive probing == brute-force threshold relation") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(73)
    val dim = 8
    val corpus = (0L until 120L).map(i =>
      (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val bench = corpus.filter(_._1 % 17 == 0)
      .map { case (i, v) => (i + 1000L, v.map(x => x + rnd.nextDouble() * 0.01)) }
    val cdf = corpus.toDF("id", "v")
    val bdf = bench.toDF("id", "v")
    val cents = SimilarityOps.ivfTrain(cdf, "id", "v", nLists = 4, iters = 1)
    val tau = 0.9
    val surv = SimilarityOps.semanticDecontaminate(cdf, "id", "v", bdf, cents,
        minSim = tau, nProbe = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val bruteBad = corpus.filter { case (_, v) =>
      bench.exists { case (_, bv) =>
        BigDecimal(cos(v, bv)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble >= tau
      }
    }.map(_._1).toSet
    assert(surv == corpus.map(_._1).toSet -- bruteBad)
    // every planted near-copy's source is removed
    assert(bench.forall { case (bid, _) => !surv.contains(bid - 1000L) })
  }
}

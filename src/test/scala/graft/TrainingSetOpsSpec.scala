package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{SampleOps, SimilarityOps}

/** Round-9 training-SET construction ops: the leakage-safe split contract
  * (no near-dup pair ever straddles the split; singletons bit-match the
  * plain split), hard-negative mining exclusion semantics, and
  * cluster-balanced sampling (composition correctness + flattening
  * direction + determinism). */
class TrainingSetOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-training-set-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val W = Seq("train" -> 0.8, "eval" -> 0.2)

  test("leakage-safe split: no pair straddles; chains land on one side; singletons bit-match assignSplit") {
    val sp = spark
    import sp.implicits._
    // 1000 singleton docs + a 3-chain (10-11, 11-12) + a pair (20, 21):
    // transitivity must put 10,11,12 on ONE side even though (10,12) is
    // not an input pair
    val ids = ((0L until 1000L) ++ Seq(1000010L, 1000011L, 1000012L, 1000020L, 1000021L))
    val df = ids.toDF("doc_id")
    val pairs = Seq((1000010L, 1000011L), (1000011L, 1000012L), (1000020L, 1000021L))
      .toDF("id_a", "id_b")
    val out = SampleOps.assignSplitLeakageSafe(df, "doc_id", pairs, W, seed = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === ids.size, "assignment must be total")
    assert(Set(out(1000010L), out(1000011L), out(1000012L)).size === 1,
      "the 3-chain must land on one side (transitive closure)")
    assert(out(1000020L) === out(1000021L), "the pair must land on one side")
    // singletons: identical to the plain per-id draw
    val plain = SampleOps.assignSplit(df, "doc_id", W, seed = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 1000L).foreach(i => assert(out(i) === plain(i),
      s"singleton $i reshuffled by unrelated pairs"))
    // both labels actually occur among singletons at these weights
    assert((0L until 1000L).map(out).toSet === Set("train", "eval"))
  }

  test("leakage-safe split: adversarial pair crossing the plain-split boundary is repaired") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 2000L).toDF("doc_id")
    val plain = SampleOps.assignSplit(df, "doc_id", W, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // build pairs that straddle under the PLAIN split: first train id with
    // each of 5 eval ids
    val trainIds = (0L until 2000L).filter(plain(_) == "train")
    val evalIds = (0L until 2000L).filter(plain(_) == "eval").take(5)
    assert(trainIds.nonEmpty && evalIds.size == 5, "fixture needs both sides")
    val pairs = evalIds.map(e => (trainIds.head, e)).toDF("id_a", "id_b")
    val out = SampleOps.assignSplitLeakageSafe(df, "doc_id", pairs, W, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val comp = trainIds.head +: evalIds
    assert(comp.map(out).toSet.size === 1, "component must collapse to one side")
    // and that side is the component-minimum's own draw
    assert(out(comp.min) === plain(comp.min))
  }

  test("mineHardNegatives: positives and self excluded BEFORE top-k; list stays full") {
    val sp = spark
    import sp.implicits._
    // corpus on a line: vec i = (1, i*eps) — similarity to query 0 decreases
    // with i, so the true order is 1, 2, 3, ...
    val corpus = (0 until 12).map(i => (i.toLong, Seq(1.0, i * 0.01))).toDF("vid", "v")
    val queries = corpus.filter(col("vid") === 0L)
    val positives = Seq((0L, 1L), (0L, 2L)).toDF("qid", "vid")
    val got = SimilarityOps.mineHardNegatives(corpus, queries, positives,
        "vid", "v", k = 3)
      .orderBy(desc("sim"), col("vid")).collect()
    // self (0) and positives (1, 2) are gone; the next-best 3 fill the list
    assert(got.map(_.getLong(1)).toSeq === Seq(3L, 4L, 5L))
    assert(got.length === 3, "exclusion must not shorten the list")
    // sims strictly descending (distinct by construction)
    val sims = got.map(_.getDouble(2)).toSeq
    assert(sims === sims.sorted.reverse)
  }

  test("mineHardNegatives: excludeSelf=false keeps the self match; empty positives = bruteForce minus self") {
    val sp = spark
    import sp.implicits._
    val corpus = (0 until 8).map(i => (i.toLong, Seq(1.0, i * 0.01))).toDF("vid", "v")
    val queries = corpus.filter(col("vid") < 2L)
    val none = Seq.empty[(Long, Long)].toDF("qid", "vid")
    val withSelf = SimilarityOps.mineHardNegatives(corpus, queries, none,
      "vid", "v", k = 1, excludeSelf = false).collect()
    assert(withSelf.forall(r => r.getLong(0) == r.getLong(1)),
      "self is the 1.0-cosine best match when not excluded")
    val brute = SimilarityOps.bruteForceTopK(corpus, queries, "vid", "v", k = 4)
      .filter(col("qid") =!= col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mined = SimilarityOps.mineHardNegatives(corpus, queries, none, "vid", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mined.subsetOf(brute), "no-positives mining ⊆ brute-force-minus-self")
    assert(mined.size === 6, "k per query")
  }

  test("clusterBalancedSample: flattening direction, determinism, zero-norm stratum") {
    val sp = spark
    import sp.implicits._
    // two orthogonal clusters, 400 vs 20 members, + 3 zero vectors
    val big = (0 until 400).map(i => (i.toLong, Seq(1.0, i * 1e-4, 0.0)))
    val small = (0 until 20).map(i => (1000L + i, Seq(0.0, i * 1e-4, 1.0)))
    val zeros = (0 until 3).map(i => (2000L + i, Seq(0.0, 0.0, 0.0)))
    val df = (big ++ small ++ zeros).toDF("vec_id", "embedding")
    val cents = SimilarityOps.ivfTrain(
      df.filter(col("vec_id").isin(0L, 1000L)), "vec_id", "embedding", 2, iters = 0)
    val out = SimilarityOps.clusterBalancedSample(df, "vec_id", "embedding",
      cents, targetTotal = 100, tau = 2.0, seed = 11L)
    val byC = out.groupBy("centroid_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // proportional would give the small cluster ~100*20/423 ≈ 5; sqrt
    // weighting gives ~100*sqrt(20)/(sqrt(400)+sqrt(20)+sqrt(3)) ≈ 17 —
    // assert the flattened share, loosely
    val smallShare = byC.getOrElse(2, 0L).toDouble
    assert(smallShare >= 8, s"small cluster under-sampled: $byC")
    // deterministic: same seed = same rows, regardless of partitioning
    val again = SimilarityOps.clusterBalancedSample(df.repartition(7),
        "vec_id", "embedding", cents, targetTotal = 100, tau = 2.0, seed = 11L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("vec_id").collect().map(_.getLong(0)).toSet)
    // zero-norm rows live in stratum 0 and may be sampled (never crash)
    val strata = out.select("centroid_id").distinct().collect().map(_.getInt(0)).toSet
    assert(strata.subsetOf(Set(0, 1, 2)))
  }

  test("mmrRerank: diversity demotes the near-duplicate; hand-verified pick sequence") {
    val sp = spark
    import sp.implicits._
    // doc 2 is a near-dup of doc 1 (cos ≈ 0.99995); doc 3 is orthogonal
    // with decent relevance. Pure relevance ranks 1, 2, 3; MMR (λ=0.7)
    // must pick the diverse doc 3 at rank 2 and push the near-dup to 3.
    val cands = Seq((100L, 1L, 1.00), (100L, 2L, 0.95), (100L, 3L, 0.80),
      (100L, 4L, 0.70)).toDF("qid", "vid", "rel")
    val vecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.99, 0.01)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.5, 0.5))).toDF("id", "v")
    val out = graft.llm.SimilarityOps.mmrRerank(cands, vecs, "qid", "vid",
        "rel", "id", "v", k = 3, lambda = 0.7)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // rank-3 score: 0.7·0.95 − 0.3·round(cos((1,0),(0.99,0.01)), 6)
    //             = 0.665 − 0.3·0.999949 = 0.365015 (on the rounded grid)
    assert(out.toSeq == Seq((1, 1L, 0.7), (2, 3L, 0.56), (3, 2L, 0.365015)))

    // k > candidates returns all; zero-norm candidate is dropped
    val withZero = cands.unionByName(Seq((100L, 9L, 0.99)).toDF("qid", "vid", "rel"))
    val vz = vecs.unionByName(Seq((9L, Seq(0.0, 0.0))).toDF("id", "v"))
    val all = graft.llm.SimilarityOps.mmrRerank(withZero, vz, "qid", "vid",
      "rel", "id", "v", k = 10, lambda = 0.7).collect()
    assert(all.length == 4 && !all.map(_.getLong(2)).contains(9L))

    // partition invariance
    val again = graft.llm.SimilarityOps.mmrRerank(cands.repartition(5),
        vecs.repartition(3), "qid", "vid", "rel", "id", "v", k = 3, lambda = 0.7)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(again.toSeq == out.toSeq)

    // λ=1 is pure relevance order (rank by rel, id tiebreak)
    val pure = graft.llm.SimilarityOps.mmrRerank(cands, vecs, "qid", "vid",
        "rel", "id", "v", k = 4, lambda = 1.0)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(pure.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("property: mmrGreedy matches an independently-coded quadratic greedy on random inputs") {
    val rnd = new scala.util.Random(23)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (trial <- 0 until 20) {
      val n = 2 + rnd.nextInt(12)
      val dim = 2 + rnd.nextInt(4)
      val ids = (0 until n).map(i => (i * 7 + 1).toLong)
      val rels = Seq.fill(n)(r6(rnd.nextDouble()))
      val vecs = Seq.fill(n)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
      val lam = Seq(0.0, 0.3, 0.7, 1.0)(trial % 4)
      val k = 1 + rnd.nextInt(n)
      val got = graft.llm.SimilarityOps.mmrGreedy(ids, rels, vecs, k, lam)
      // naive reference: recompute every pairwise rounded cosine from
      // scratch each step, pick via explicit (score, id) ordering
      def cos(a: Seq[Double], b: Seq[Double]) = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      var selected = Vector.empty[Int]
      val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      while (want.length < k) {
        val candScores = (0 until n).filterNot(selected.contains).map { i =>
          val ms = if (selected.isEmpty) 0.0
            else selected.map(s => r6(cos(vecs(i), vecs(s)))).max
          (i, r6(lam * rels(i) - (1.0 - lam) * ms))
        }
        val pick = candScores.minBy { case (i, s) => (-s, ids(i)) }
        selected :+= pick._1
        want += ((ids(pick._1), pick._2))
      }
      assert(got == want.toSeq, s"trial $trial n=$n k=$k lam=$lam")
    }
  }
}

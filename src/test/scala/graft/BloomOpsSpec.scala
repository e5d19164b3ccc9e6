package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{BloomOps, SampleOps}
import graft.llm.BloomOps.BloomModel

/** Round-9: the Bloom-filter cross-corpus exact-dedup gate.
  *
  * Pins, in order: the plain-Scala mixer twin against the Column form that
  * the oracles replay; position parity across all three forms (Scala spec,
  * Column arithmetic, scoring expression); the no-false-negative guarantee;
  * planted-duplicate gating; build partition invariance; shard-union ≡
  * union-build; the persisted round trip incl. fail-fast on version
  * mismatch; fpp sanity; and batch ≡ streaming scoring. */
class BloomOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-bloom-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def randomLongs(seed: Long, n: Int): Seq[Long] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(rng.nextLong())
  }

  test("Scala mix twin equals SampleOps.hashBucket on randomized inputs incl. negatives") {
    val sp = spark
    import sp.implicits._
    val ids = randomLongs(41, 500) ++ Seq(0L, -1L, Long.MinValue, Long.MaxValue,
      SampleOps.P, -SampleOps.P, BloomOps.P2, -BloomOps.P2)
    val viaColumn = ids.toDF("id")
      .select(col("id"), SampleOps.hashBucket(col("id"), 77L).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(BloomOps.mix(id, 77L) === viaColumn(id), s"mix mismatch for $id")
    }
  }

  test("positions: Scala spec == Column form == scoring expression's walk") {
    val sp = spark
    import sp.implicits._
    val mBits = 4096L
    val k = 5
    val seed = 13L
    val ids = randomLongs(42, 400) ++ Seq(0L, -1L, Long.MinValue, Long.MaxValue)
    val viaColumn = ids.toDF("fp")
      .select(col("fp"), BloomOps.positionsCol(col("fp"), mBits, k, seed).as("pos"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    ids.foreach { fp =>
      val scalaPos = BloomOps.positions(fp, mBits, k, seed).toSeq
      assert(viaColumn(fp) === scalaPos, s"position mismatch for $fp")
      assert(scalaPos.forall(p => p >= 0 && p < mBits))
    }
    // the expression agrees: a filter whose bits are EXACTLY one
    // fingerprint's positions contains that fingerprint and (with high
    // probability) not an unrelated one
    val words = new Array[Long](((mBits + 63) / 64).toInt)
    val probe = ids.head
    BloomOps.positions(probe, mBits, k, seed).foreach { p =>
      words((p >>> 6).toInt) |= (1L << (p & 63L))
    }
    val m = BloomModel(words, mBits, k, seed, 1L)
    assert(m.mightContain(probe))
  }

  test("no false negatives: every inserted fingerprint reports maybe_dup") {
    val sp = spark
    import sp.implicits._
    val fps = randomLongs(7, 2000)
    val model = BloomOps.buildBloom(fps.toDF("fp"), col("fp"), mBits = 1 << 16,
      k = 4, seed = 3L)
    assert(model.nItems === 2000L)
    fps.foreach(fp => assert(model.mightContain(fp), s"false negative for $fp"))
    // and through the scoring column
    val flagged = BloomOps.dedupAgainstBloom(fps.toDF("fp"), model, col("fp"))
    assert(flagged.filter(!col("maybe_dup")).count() === 0L)
  }

  test("planted duplicates are gated; fresh docs mostly pass; fpp is sane") {
    val sp = spark
    import sp.implicits._
    val corpus = randomLongs(11, 3000)
    val fresh = randomLongs(99, 3000)
    val model = BloomOps.buildBloom(corpus.toDF("fp"), col("fp"),
      mBits = 1 << 17, k = 5, seed = 1L)
    assert(model.expectedFpp < 0.01, s"expected fpp ${model.expectedFpp}")
    val dupsCaught = corpus.count(model.mightContain)
    assert(dupsCaught === corpus.size)
    val freshSet = fresh.filterNot(corpus.toSet)
    val fp = freshSet.count(model.mightContain)
    assert(fp.toDouble / freshSet.size < 0.02,
      s"$fp false positives out of ${freshSet.size}")
    val kept = BloomOps.filterAgainstBloom(freshSet.toDF("fp"), model, col("fp")).count()
    assert(kept === (freshSet.size - fp).toLong)
  }

  test("build is partition-invariant and shard-union equals union-build") {
    val sp = spark
    import sp.implicits._
    val a = randomLongs(21, 800)
    val b = randomLongs(22, 700)
    val p1 = BloomOps.buildBloom((a ++ b).toDF("fp").repartition(1), col("fp"),
      mBits = 8192, k = 3, seed = 5L)
    val p7 = BloomOps.buildBloom((a ++ b).toDF("fp").repartition(7), col("fp"),
      mBits = 8192, k = 3, seed = 5L)
    assert(p1.words.toSeq === p7.words.toSeq)
    val sa = BloomOps.buildBloom(a.toDF("fp"), col("fp"), 8192, 3, 5L)
    val sb = BloomOps.buildBloom(b.toDF("fp"), col("fp"), 8192, 3, 5L)
    val merged = sa.union(sb)
    assert(merged.words.toSeq === p1.words.toSeq)
    assert(merged.nItems === 1500L)
    intercept[IllegalArgumentException] {
      sa.union(BloomOps.buildBloom(b.toDF("fp"), col("fp"), 8192, 4, 5L))
    }
  }

  test("persisted round trip is exact; version mismatch fails fast") {
    val sp = spark
    import sp.implicits._
    val fps = randomLongs(31, 1000)
    val model = BloomOps.buildBloom(fps.toDF("fp"), col("fp"), 1 << 14, 4, 9L)
    val dir = java.nio.file.Files.createTempDirectory("bloom-model").toString
    BloomOps.writeBloomModel(spark, model, dir)
    val back = BloomOps.loadBloomModel(spark, dir)
    assert(back.words.toSeq === model.words.toSeq)
    assert(back.mBits === model.mBits && back.k === model.k &&
      back.seed === model.seed && back.nItems === model.nItems)
    // corrupt the version stamp
    Seq((model.mBits, model.k, model.seed, model.nItems, 999))
      .toDF("m_bits", "k", "seed", "n_items", "format_version")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] { BloomOps.loadBloomModel(spark, dir) }
    assert(e.getMessage.contains("format_version"))
  }

  test("replayable fingerprint: equal text => equal fp; distinct text separates") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "  THE   quick  Brown fox "), // normalizes to a DIFFERENT token stream? no: lower+trim, split collapses runs
      (3L, "the quick brown fox"),
      (4L, "an entirely different document"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val fps = docs.select(col("id"),
      BloomOps.replayableFingerprint(col("text"), 17L).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(3L))
    assert(fps(1L) === fps(2L), "whitespace/case normalization must collapse")
    assert(fps(1L) !== fps(4L))
    assert(fps(5L) === ((17L % SampleOps.P) + SampleOps.P) % SampleOps.P,
      "null text folds to the seed init")
  }

  test("null fingerprints: flag mode emits null, filter mode KEEPS the row") {
    val sp = spark
    import sp.implicits._
    val model = BloomOps.buildBloom(Seq(1L, 2L, 3L).toDF("fp"), col("fp"),
      mBits = 4096, k = 3, seed = 5L)
    val probe = Seq(Some(1L), None, Some(99L)).toDF("fp")
    val flagged = BloomOps.dedupAgainstBloom(probe, model, col("fp"))
      .collect().map(r => Option(r.get(0)) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
    assert(flagged.collect { case (Some(1L), v) => v }.head === Some(true))
    assert(flagged.collect { case (None, v) => v }.head === None,
      "unknown content must flag as NULL, not guessed")
    val kept = BloomOps.filterAgainstBloom(probe, model, col("fp"))
      .collect().map(r => Option(r.get(0))).toSet
    assert(kept === Set(None, Some(99L)),
      "a null fingerprint must be KEPT by the filter, never silently dropped")
  }

  test("batch == streaming scoring (stateless broadcast-model gate)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val corpus = randomLongs(51, 500)
    val model = BloomOps.buildBloom(corpus.toDF("fp"), col("fp"), 1 << 14, 4, 2L)
    val probe = corpus.take(50) ++ randomLongs(52, 50)
    val batch = BloomOps.dedupAgainstBloom(probe.toDF("fp"), model, col("fp"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val stream = MemoryStream[Long]
    stream.addData(probe: _*)
    val q = BloomOps.dedupAgainstBloom(stream.toDF().withColumnRenamed("value", "fp"),
        model, col("fp"))
      .writeStream.format("memory").queryName("bloom_stream").outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("bloom_stream")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(streamed === batch)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.MultimodalOps

/** Resize plumbing contracts: deterministic strided downsample, metadata
  * rewrite, size arithmetic, and corrupt-payload isolation — the Spark-side
  * shape a real codec slots into.
  */
class MultimodalResizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-mm-resize")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("1x1 downsample keeps exactly the first byte; metadata rewritten") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "hello world"), (2L, "zebra")).toDF("doc_id", "text")
    val media = MultimodalOps.demoMediaTable(docs, "doc_id", "text")
    val out = MultimodalOps.resizeImages(media, "payload", 1, 1)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Array[Byte]]("payload").toSeq == Seq('h'.toByte))
    assert(out(1).getAs[Array[Byte]]("payload").toSeq == Seq('z'.toByte))
    val meta = out(0).getStruct(out(0).fieldIndex("media_meta"))
    assert(meta.getInt(2) == 1 && meta.getInt(3) == 1) // width, height
    assert(meta.getLong(5) == 1L) // size_bytes
  }

  test("upscale past the source caps at the input size (identity sample)") {
    val payload = Array.tabulate(100)(_.toByte)
    val resized = MultimodalOps.StubCodec.resizeImage(payload, 4096, 4096)
    assert(resized.toSeq == payload.toSeq)
  }

  test("output size follows the pixel-count ratio exactly") {
    val payload = Array.tabulate(1000)(_.toByte)
    val (w, h, _) = MultimodalOps.StubCodec.decodeImage(payload)
    val resized = MultimodalOps.StubCodec.resizeImage(payload, w / 2, h)
    val expected = math.round(1000.0 * ((w / 2).toLong * h) / (w.toLong * h)).toInt
    assert(resized.length == expected, s"${resized.length} vs $expected (w=$w h=$h)")
    // the strided sample reads source positions in increasing order
    val positions = resized.indices.map(i => (i.toLong * 1000) / resized.length)
    assert(positions == positions.sorted)
  }

  test("null and empty payloads become empty outputs, not task failures") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val media = MultimodalOps.demoMediaTable(docs, "doc_id", "text")
    val out = MultimodalOps.resizeImages(media, "payload", 8, 8).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getAs[Array[Byte]]("payload").isEmpty)
  }

  test("dHash56: deterministic, single-byte edit moves at most one gradient bit") {
    import MultimodalOps.StubCodec.dHash56
    val rng = new scala.util.Random(7)
    val base = Array.fill(512)((rng.nextInt(256) - 128).toByte)
    assert(dHash56(base) === dHash56(base.clone()))
    assert(dHash56(Array.emptyByteArray) === 0L)
    assert(dHash56(null) === 0L)
    assert((dHash56(base) >>> 56) === 0L, "all bits below the sign byte")
    // replace one byte IN PLACE (same length => same block bounds): only
    // the containing cell moves, which touches at most 2 gradient bits
    // (its left and right comparisons)
    for (pos <- Seq(0, 100, 511)) {
      val edited = base.clone()
      edited(pos) = (edited(pos) + 90).toByte
      val d = java.lang.Long.bitCount(dHash56(base) ^ dHash56(edited))
      assert(d <= 2, s"edit at $pos moved $d bits")
    }
  }

  test("native DHash56 expression is bit-exact with the StubCodec spec (randomized sweep)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(41)
    val payloads: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      Array[Byte](0),
      Array.fill(3)(rng.nextInt(256).toByte),
      Array.fill(63)(rng.nextInt(256).toByte), // fewer bytes than cells
      Array.fill(64)(rng.nextInt(256).toByte)
    ) ++ (0 until 40).map(_ => Array.fill(1 + rng.nextInt(2000))(rng.nextInt(256).toByte))
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("doc_id", "payload")
    val got = MultimodalOps.imageDHash(df, "payload")
      .orderBy("doc_id").select("dhash").collect().map(_.getLong(0))
    val want = payloads.map(MultimodalOps.StubCodec.dHash56)
    assert(got.toSeq === want.toSeq, "native expression diverged from the spec")
    // null payload keeps the legacy hash-to-0 behavior
    val withNull = Seq((0L, "x"), (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast(org.apache.spark.sql.types.BinaryType).as("payload"))
    val nh = MultimodalOps.imageDHash(withNull, "payload")
      .orderBy("doc_id").select("dhash").collect().map(_.getLong(0))
    assert(nh(1) === 0L, "null payload must hash to 0")
  }

  test("nearDupImages: plants found with exact hamming; banding is complete for maxDist < bands") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "A" * 100 + "B" * 100 + "C" * 100),
      (2L, "Z" + "A" * 99 + "B" * 100 + "C" * 100), // 1-byte edit of 1
      (3L, "A" * 100 + "B" * 100 + "C" * 100), // exact copy of 1
      (4L, ("x" :: List.tabulate(299)(i => ((i * 37) % 26 + 97).toChar.toString)).mkString)
    ).toDF("doc_id", "text")
    val media = MultimodalOps.demoMediaTable(docs, "doc_id", "text")
    val pairs = MultimodalOps.nearDupImages(media, "doc_id", "payload",
      maxDist = 3, bands = 4, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) === 0,
      "exact copies must pair at hamming 0")
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 2,
      "the one-byte edit must pair as a near-dup")
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "the unrelated doc must not pair")
    // validation: the pigeonhole precondition is enforced
    intercept[IllegalArgumentException] {
      MultimodalOps.nearDupImages(media, "doc_id", "payload",
        maxDist = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.nearDupImages(media, "doc_id", "payload", bands = 5)
    }
    // scale shape: payload bytes die map-side — no binary column crosses
    // an exchange
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shuffles = MultimodalOps.nearDupImages(media, "doc_id", "payload")
      .queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.forall(!_.child.output.exists(
      _.dataType == org.apache.spark.sql.types.BinaryType)),
      "payloads must never shuffle")
  }
}

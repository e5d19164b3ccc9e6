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
}

package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads travel as opaque `binary` columns with typed metadata structs;
  * decode / feature-extract / resize / frame-sample run as batched
  * per-partition transforms (the JVM analogue of `mapInPandas` — one
  * iterator pass per partition, bounded memory, no driver collection).
  *
  * The actual codecs are NOT available in this container, so the decode step
  * is a clearly-marked deterministic stub ([[StubCodec]]) — the Spark-side
  * contract (schemas, partition sizing, batch shape, null/corrupt handling)
  * is real and tested, and a production build swaps `StubCodec` for a JNI or
  * process-isolated codec without touching the plumbing.
  */
object MultimodalOps {

  /** Typed metadata carried next to every binary payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType), // image | audio | video
    StructField("format", StringType), // png, wav, mp4, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  /** STUB: deterministic stand-in for the real decoder. Derives pixel/sample
    * statistics from the payload bytes so the pipeline shape is exercised
    * end-to-end with reproducible values. A real deployment replaces exactly
    * this object. */
  object StubCodec {
    /** "Decode" an image payload to (width, height, meanLuma) — fake but
      * deterministic in the payload bytes. */
    def decodeImage(payload: Array[Byte]): (Int, Int, Double) = {
      if (payload == null || payload.isEmpty) return (0, 0, Double.NaN)
      val w = 16 + (math.abs(scala.util.hashing.MurmurHash3.bytesHash(payload, 1)) % 1024)
      val h = 16 + (math.abs(scala.util.hashing.MurmurHash3.bytesHash(payload, 2)) % 1024)
      var s = 0L
      var i = 0
      while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
      (w, h, s.toDouble / payload.length / 255.0)
    }

    /** "Extract" an embedding from a payload: payload-deterministic unit
      * vector from pure integer hash arithmetic — component j accumulates
      * `(byte_i + 1) · W(i, j)` with integer weights
      * `W(i, j) = ((i+1)·(j+7)) mod 97 − 48`, then float32-normalizes.
      * Every step (int64 sums, double norm, float32 rounding) is exactly
      * replayable in ANSI SQL, so the full embed→ANN pipeline is
      * oracle-checkable; a real encoder slots in behind the signature. */
    def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      if (payload == null || payload.isEmpty) return Array.fill(dim)(0f)
      val raw = new Array[Long](dim)
      var j = 0
      while (j < dim) {
        var s = 0L
        var i = 0
        while (i < payload.length) {
          s += ((payload(i) & 0xff) + 1).toLong * (((i + 1) * (j + 7)) % 97 - 48)
          i += 1
        }
        raw(j) = s
        j += 1
      }
      val norm = math.sqrt(raw.map(x => x.toDouble * x.toDouble).sum)
      if (norm == 0) Array.fill(dim)(0f) else raw.map(x => (x / norm).toFloat)
    }

    /** "Sample" `n` frame offsets from a video payload (uniform grid). */
    def sampleFrames(durationMs: Long, n: Int): Array[Long] =
      if (durationMs <= 0 || n <= 0) Array.empty
      else Array.tabulate(n)(i => durationMs * (2L * i + 1) / (2L * n))

    /** "Resize" an image payload to (targetW, targetH): deterministic
      * byte-arithmetic stand-in — the output payload is a strided sample of
      * the input scaled to the pixel-count ratio, so output size is exactly
      * `max(1, len·(tw·th)/(w·h))` bytes (capped at the input length) and a
      * real bilinear resizer slots in behind the same signature. */
    def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      if (payload == null || payload.isEmpty) return Array.emptyByteArray
      val (w, h, _) = decodeImage(payload)
      val ratio = (targetW.toLong * targetH).toDouble / (w.toLong * h).toDouble
      val outLen = math.max(1L, math.min(payload.length.toLong,
        math.round(payload.length * ratio))).toInt
      Array.tabulate(outLen)(i =>
        payload(((i.toLong * payload.length) / outLen).toInt))
    }
  }

  /** Wrap a raw binary column with typed metadata (size + caller-provided
    * type/format; dimensions filled by decode). */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String,
                    format: String, out: String = "media_meta"): DataFrame =
    df.withColumn(out, struct(
      lit(mediaType).as("media_type"), lit(format).as("format"),
      lit(null).cast(IntegerType).as("width"), lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"),
      length(col(binCol)).cast(LongType).as("size_bytes")))

  /** Batched image decode per partition: adds (width, height, mean_luma).
    * Corrupt/null payloads yield null stats instead of failing the task. */
  def decodeImages(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val out: Seq[Any] =
          try {
            val (w, h, luma) = StubCodec.decodeImage(payload)
            Seq[Any](w, h, luma)
          } catch { case _: Throwable => Seq(null, null, null) }
        Row.fromSeq(r.toSeq ++ out)
      }
    }(enc)
  }

  /** Batched embedding extraction: one pass per partition, fixed dim. */
  def extractEmbeddings(df: DataFrame, binCol: String, dim: Int = 64,
                        out: String = "embedding"): DataFrame = {
    val embUdf = udf((payload: Array[Byte]) => StubCodec.embed(payload, dim))
    df.withColumn(out, embUdf(col(binCol)))
  }

  /** Batched resize per partition: replaces the payload with the resized
    * bytes and rewrites the metadata struct's dimensions/size. Same
    * partition-iterator shape as decodeImages — bounded memory, corrupt
    * payloads become empty outputs instead of failing the task. */
  def resizeImages(df: DataFrame, binCol: String, targetW: Int, targetH: Int,
                   metaCol: String = "media_meta"): DataFrame = {
    val schema = df.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val binIdx = schema.fieldIndex(binCol)
    val metaIdx = if (schema.fieldNames.contains(metaCol)) schema.fieldIndex(metaCol) else -1
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val resized =
          try StubCodec.resizeImage(payload, targetW, targetH)
          catch { case _: Throwable => Array.emptyByteArray }
        val seq = r.toSeq.toArray
        seq(binIdx) = resized
        if (metaIdx >= 0 && !r.isNullAt(metaIdx)) {
          val m = r.getStruct(metaIdx)
          seq(metaIdx) = Row(m.get(0), m.get(1), targetW, targetH, m.get(4),
            resized.length.toLong)
        }
        Row.fromSeq(seq.toIndexedSeq)
      }
    }(enc)
  }

  /** Frame sampling for video payloads: explode n uniform frame offsets. */
  def sampleFrameOffsets(df: DataFrame, durationCol: String, n: Int,
                         out: String = "frame_offset_ms"): DataFrame = {
    val fUdf = udf((d: java.lang.Long) =>
      StubCodec.sampleFrames(if (d == null) 0L else d.longValue(), n))
    df.withColumn(out, explode(fUdf(col(durationCol))))
  }

  /** Build a demo media table from the documents corpus (payload = utf-8
    * bytes) — lets the pipeline run on the driver's testdata. */
  def demoMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withMediaMeta(
      docs.select(col(idCol), col(textCol).cast(BinaryType).as("payload")),
      "payload", "image", "png")
}

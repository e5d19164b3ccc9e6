package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.TextOps

/** Streaming deduplication for continuous ingestion pipelines — the
  * streaming counterpart of the batch dedup family (TextOps): a training
  * corpus that arrives as a stream must be deduplicated before it lands,
  * not in a nightly batch over 100 TB.
  *
  * Two shapes, both with BOUNDED state (the thing that decides whether a
  * streaming job survives month-long uptimes):
  *
  *  1. [[exactDedupStream]] — watermarked `dropDuplicates` on a content
  *     fingerprint: Spark's state store keeps one entry per distinct
  *     fingerprint inside the watermark horizon and evicts older state.
  *     Exact within the horizon, state ∝ distinct docs per horizon.
  *  2. [[simHashDedupStream]] — `flatMapGroupsWithState` keyed by SimHash
  *     band: near-duplicates collide on a band key and are suppressed if
  *     their full 64-bit SimHash is within `maxHammingDistance` of a
  *     signature already seen in that band bucket (bounded ring buffer per
  *     key, `maxPerBucket` signatures). The banding mirrors the batch LSH
  *     discipline: per-key state is capped exactly like the batch
  *     per-bucket population cap.
  */
object StreamingDedup {

  /** Exact streaming dedup on a text fingerprint. Emits first occurrences
    * only. `horizon` bounds the state store: duplicates farther apart than
    * the watermark are NOT suppressed (the batch job catches them). */
  def exactDedupStream(events: DataFrame, tsCol: String, textCol: String,
                       horizon: String = "1 hour"): DataFrame =
    events
      .withColumn("_fp", xxhash64(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicates("_fp")
      .drop("_fp")

  final case class DocIn(band: Long, sig: Long, docId: Long, tsMicros: Long)
  final case class BandState(sigs: Array[Long])
  final case class DocKeep(doc_id: Long, sig: Long)

  /** Near-dup suppression keyed by SimHash band. A doc is emitted iff no
    * already-kept signature in its band bucket is within
    * `maxHammingDistance`. State per key is a ring buffer of at most
    * `maxPerBucket` signatures — bounded regardless of stream length. */
  def simHashDedupStream(docs: org.apache.spark.sql.Dataset[DocIn],
                         maxHammingDistance: Int = 3,
                         maxPerBucket: Int = 256)
      : org.apache.spark.sql.Dataset[DocKeep] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.band)
      .flatMapGroupsWithState[BandState, DocKeep](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[DocIn], state: GroupState[BandState]) =>
          var sigs = state.getOption.map(_.sigs).getOrElse(Array.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer[DocKeep]()
          // deterministic per-batch order: state evolution must not depend
          // on shuffle arrival order
          rows.toSeq.sortBy(d => (d.tsMicros, d.docId)).foreach { d =>
            val dup = sigs.exists(s =>
              java.lang.Long.bitCount(s ^ d.sig) <= maxHammingDistance)
            if (!dup) {
              out += DocKeep(d.docId, d.sig)
              sigs = (if (sigs.length >= maxPerBucket) sigs.drop(1) else sigs) :+ d.sig
            }
          }
          state.update(BandState(sigs))
          out.iterator
      }
  }

  /** Band a batch/stream of documents for [[simHashDedupStream]]: one row
    * per (band, doc) with the full 64-bit SimHash carried alongside — the
    * same 4×16-bit banding a batch LSH pass would use. A doc suppressed in
    * ANY band is a near-duplicate; keep = docs emitted in ALL their bands
    * (callers typically groupBy doc_id and count). */
  def bandDocuments(df: DataFrame, idCol: String, textCol: String, tsCol: String): DataFrame = {
    TextOps.simHash(df, textCol, out = "_sig")
      .select(col(idCol).cast("long").as("docId"), col("_sig").as("sig"),
        unix_micros(col(tsCol)).as("tsMicros"))
      .select(col("docId"), col("sig"), col("tsMicros"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).cast("long").as("bandIdx"),
            (shiftrightunsigned(col("sig"), b * 16) % 65536).as("bandBits"))): _*)).as("_b"))
      .select((col("_b.bandIdx") * 65536 + col("_b.bandBits")).as("band"),
        col("sig"), col("docId"), col("tsMicros"))
  }
}

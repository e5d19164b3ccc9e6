package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{BloomOps, ClassifierOps, DsirOps, TextOps}

/** The composed streaming ingest pipeline: the standard crawl-to-corpus
  * curation chain (extract → normalize → heuristic gates → trained gates →
  * dedup), wired so the SAME code runs a batch backfill and a continuous
  * streaming ingest.
  *
  *   html_strip → text_normalize → C4 + Gopher heuristics →
  *   NB quality gate → DSIR target-likeness gate → bigram-LM perplexity
  *   gate → exact dedup
  *
  * Why this composes on a stream at all: every scoring stage is a
  * BROADCAST-MODEL map-side pass (the bounded model tables — NB bucket
  * LLRs, DSIR log-ratios, bigram LM counts — collect into broadcast lookup
  * structures and each row scores in place), so the gates are stateless
  * per micro-batch; only the final dedup carries state, and that state is
  * bounded by the watermark horizon ([[StreamingDedup.exactDedupStream]]).
  * The models are fit OFFLINE on a standing corpus (train once per corpus
  * refresh, persist via writeNbModel / DsirOps.writeModel / writeBigramLm,
  * load at stream start) — exactly the steady-state deployment the
  * persisted-model paths exist for.
  *
  * Batch≡stream: [[curateBatch]] is the batch twin of [[curateStream]] —
  * same gates, then first-occurrence-per-fingerprint in timestamp order
  * (what the streaming dedup emits when duplicates arrive inside the
  * horizon). IngestPipelineSpec pins equality of the kept rows AND their
  * scores on a shared fixture: the NB and bigram scores are bit-exact
  * (scaled-long in-row sums mirror the batch DECIMAL sums), DSIR to 1e-9
  * (documented double reassociation).
  *
  * Scale shape (100 TB backfill / sustained crawl): the gates are
  * map-only — they run at scan parallelism with zero exchanges; the batch
  * dedup's window partitions by the 64-bit content fingerprint, so every
  * sort partition is one duplicate clique (bounded by the corpus's dup
  * multiplicity, never the corpus).
  */
object IngestPipeline {

  /** The frozen, bounded models every gate scores against. `bloom`, when
    * set, is the historical-corpus exact-dedup gate ([[BloomOps]]): rows
    * whose CURATED text the standing corpus has already ingested are
    * dropped right after normalization, before any scoring compute — build
    * it with [[BloomOps.productionFingerprint]] over the standing corpus's
    * curated text so both sides fingerprint identically. Stateless
    * broadcast bit-test, so it composes into the stream unchanged. */
  final case class GateModels(nb: ClassifierOps.NbModel,
                              dsir: DsirOps.DsirModel, minLogw: Double,
                              bigram: TextOps.BigramLmModel, maxPerplexity: Double,
                              bloom: Option[BloomOps.BloomModel] = None)

  /** The stateless stages — identical for a batch DataFrame and a
    * streaming one. Returns the rows that pass EVERY gate, with the signal
    * columns retained (c4_keep, gopher_keep, nb_score/nb_pred,
    * n_feats/logw, sum_logp/perplexity) for data-card accounting. */
  def gate(df: DataFrame, textCol: String, models: GateModels): DataFrame = {
    val stripped = TextOps.htmlStrip(df, textCol, out = "_text_plain")
      .drop(textCol).withColumnRenamed("_text_plain", textCol)
    val norm = TextOps.textNormalize(stripped, textCol, out = textCol)
    // historical-corpus exact dedup FIRST: a known document must not
    // consume gate compute; map-only, so the gates stay zero-exchange
    val fresh = models.bloom.fold(norm)(b =>
      BloomOps.filterAgainstBloom(norm, b,
        BloomOps.productionFingerprint(col(textCol))))
    val heur = TextOps.gopherQualityFilter(
      TextOps.c4QualityFilter(fresh, textCol), textCol)
    val nb = ClassifierOps.nbScoreBroadcast(heur, textCol, models.nb.model,
      models.nb.numBuckets, models.nb.seed)
    val ds = DsirOps.scoreWithBroadcastModel(nb, textCol, models.dsir)
    val bg = TextOps.bigramScoreBroadcast(ds, textCol, models.bigram)
    bg.filter(col("c4_keep") && col("gopher_keep") && col("nb_pred") &&
      col("logw") >= models.minLogw &&
      col("perplexity") <= models.maxPerplexity)
  }

  /** Continuous ingest: gates + watermarked exact dedup (first occurrence
    * per content fingerprint inside `horizon` wins). */
  def curateStream(stream: DataFrame, tsCol: String, textCol: String,
                   models: GateModels, horizon: String = "1 hour"): DataFrame =
    StreamingDedup.exactDedupStream(gate(stream, textCol, models), tsCol,
      textCol, horizon)

  /** The batch twin: same gates, then first occurrence per content
    * fingerprint in `tsCol` order — what [[curateStream]] emits when every
    * duplicate arrives within the watermark horizon. */
  def curateBatch(df: DataFrame, tsCol: String, textCol: String,
                  models: GateModels): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(tsCol))
    gate(df, textCol, models)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}

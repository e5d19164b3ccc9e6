package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-frequency estimation over unbounded vocabularies: the Count-Min
  * sketch (Cormode & Muthukrishnan 2005). Completes the mergeable-sketch
  * suite — HLL answers distinct counts, KLL answers quantiles,
  * space-saving answers "which are the top-k" — with "how often does THIS
  * token occur", for ANY token, from `d·w` longs of state.
  *
  * Pipeline uses: blocklist-term frequency audits ("how common is this
  * slur / boilerplate marker per crawl?"), stopword-ratio calibration,
  * fast prevalence probes before an exact (expensive) vocabulary count,
  * per-shard persisted counters that merge exactly across crawl versions.
  *
  * Scale design (100 TB corpus): exact counts are a token-keyed groupBy
  * whose exchange carries the vocabulary (10⁸⁺ types on raw web text).
  * Here the text hashes map-side in ONE native pass per document
  * ([[graft.functions.NgramBucketHashes]] raw mode), each partition folds
  * its occurrences into the `d·w`-long counter buffer, and exactly one
  * buffer per partition crosses the one exchange
  * ([[graft.functions.CmRegisters]] is partial-aggregation capable) —
  * the HLL shuffle discipline applied to frequencies. Merging sharded
  * sketches is an elementwise sum, EXACTLY the single-pass sketch
  * (linearity; CmSketchSpec pins the identity).
  *
  * Determinism: the whole path is integer arithmetic — the 131-rolling
  * token hash and the 31-bit LCG row mixer both replay in BIGINT SQL, so
  * the driver oracle rebuilds every counter exactly. Estimates are exact
  * overcounts (`est ≥ true`, within `e/w·N` w.p. `1−e^(−d)`).
  */
object FrequencyOps {

  private val P = SampleOps.P
  private def B = org.apache.spark.sql.GraftExpressionBridge

  private def toks(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "[ \\t\\n\\r\\f]+"), t => length(t) > 0)

  /** Raw rolling token hashes of a whole text (one native pass; empties
    * dropped, normalization columnar outside the expression). */
  private def tokenHashes(textCol: Column, seed: Long): Column =
    B.column(graft.functions.NgramBucketHashes(
      B.expression(lower(trim(textCol))), numBuckets = 0, seed, bigrams = false))

  private def cmAgg(hashCol: Column, d: Int, w: Int, mixSeed: Long): Column =
    B.column(graft.functions.CmRegisters(B.expression(hashCol), d, w, mixSeed)
      .toAggregateExpression())

  private def cmMergeAgg(regsCol: Column, d: Int, w: Int): Column =
    B.column(graft.functions.CmMergeRegisters(B.expression(regsCol), d, w)
      .toAggregateExpression())

  /** Declarative counter index for sketch row `i` — the [[SampleOps
    * .hashBucket]] mixer over `hash·d + i` mod `w`, the exact arithmetic
    * [[graft.functions.CountMinSketch.bucketOf]] runs inside the
    * aggregate (parity pinned in CmSketchSpec). */
  private def bucketCol(th: Column, i: Column, d: Int, w: Int, mixSeed: Long): Column =
    pmod(SampleOps.hashBucket(th * lit(d.toLong) + i.cast(LongType), mixSeed),
      lit(w.toLong))

  /** Build one Count-Min sketch row over every token occurrence of
    * `textCol`. Output: a single row `(regs array<long>)` of length
    * `d·w` (row-major). Optional `groupCols` sketch per group. */
  def cmSketch(df: DataFrame, textCol: String, d: Int = 4, w: Int = 1024,
               hashSeed: Long = 7L, mixSeed: Long = 13L,
               groupCols: Seq[String] = Nil): DataFrame = {
    val hashed = df
      .select((groupCols.map(col) :+
        explode(tokenHashes(col(textCol), hashSeed)).as("_th")): _*)
    if (groupCols.isEmpty) hashed.agg(cmAgg(col("_th"), d, w, mixSeed).as("regs"))
    else hashed.groupBy(groupCols.map(col): _*)
      .agg(cmAgg(col("_th"), d, w, mixSeed).as("regs"))
  }

  /** Merge per-shard sketch rows (`groupCols..., regs`) to one row per
    * group — elementwise sum, exactly the single-pass sketch. */
  def cmMergeShards(shards: DataFrame, d: Int = 4, w: Int = 1024,
                    groupCols: Seq[String] = Nil): DataFrame =
    if (groupCols.isEmpty) shards.agg(cmMergeAgg(col("regs"), d, w).as("regs"))
    else shards.groupBy(groupCols.map(col): _*)
      .agg(cmMergeAgg(col("regs"), d, w).as("regs"))

  /** TF-IDF keyword extraction with sketch-approximated document
    * frequencies — per document, the top-k terms by
    * `tf · ln(N / df_est)` where `df_est` is the Count-Min estimate of
    * the term's DOCUMENT frequency (each (doc, term) incidence feeds the
    * sketch once). The classic keyword/salience op, runnable at corpus
    * scale because the IDF table is never materialized: exact document
    * frequencies are a vocabulary-keyed groupBy (the 10⁸-type exchange);
    * the sketch replaces it with d·w longs, and `df_est ≥ df` only ever
    * DAMPS a rare term's salience — never inflates it.
    *
    * Plan shape: two corpus passes (the sketch must complete before
    * scoring — inherent), both map-side off one native
    * [[graft.functions.TokenTfEntries]] pass per doc; the sketch and the
    * doc count broadcast; the only corpus exchange is the per-doc rank
    * window's id-keyed shuffle of slim (id, term, tf) rows — partitions
    * bounded by a document's distinct terms, text never moves.
    *
    * Determinism: score rounded to 6 decimals, ties break by term
    * (binary UTF-8 order in both engines); the oracle replays the
    * counters and the ln arithmetic exactly.
    *
    * @return (idCol, rank 1..k, term, tf, df_est, score)
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String, k: Int,
                    d: Int = 4, w: Int = 1024, hashSeed: Long = 7L,
                    mixSeed: Long = 13L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val entries = B.column(graft.functions.TokenTfEntries(
      B.expression(lower(trim(col(textCol))))))
    val docTerms = df.select(col(idCol).as("_id"), explode(entries).as("_e"))
      .select(col("_id"), col("_e.term").as("term"),
        col("_e.tf").cast(LongType).as("tf"))
      .withColumn("_th", element_at(tokenHashes(col("term"), hashSeed), 1))
    val sketch = docTerms.agg(cmAgg(col("_th"), d, w, mixSeed).as("regs"))
    val n = df.agg(count(lit(1)).as("_n"))
    val scored = docTerms
      .crossJoin(broadcast(sketch))
      .crossJoin(broadcast(n))
      .withColumn("df_est", array_min(transform(
        sequence(lit(0), lit(d - 1)),
        i => element_at(col("regs"),
          (i.cast(LongType) * lit(w.toLong) +
            bucketCol(col("_th"), i, d, w, mixSeed) + lit(1L)).cast("int")))))
      .withColumn("score",
        round(col("tf") * log(col("_n").cast("double") / col("df_est")), 6))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(wRank).cast("int"))
      .filter(col("rank") <= k)
      .select(col("_id").as(idCol), col("rank"), col("term"), col("tf"),
        col("df_est"), col("score"))
  }

  /** Persist counter rows (`[groupCols...,] regs`) — one tiny parquet per
    * corpus version/shard; [[cmMergeShards]] over a union of reads equals
    * the single-pass sketch exactly (linearity), so per-crawl counters
    * compose across versions without re-reading any corpus. */
  def writeCmSketch(sketch: DataFrame, path: String): Unit =
    sketch.write.mode("overwrite").parquet(path)

  def readCmSketch(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Estimate each probe term's corpus frequency from a one-row sketch:
    * `est = min_i regs[i·w + bucket_i(term)]` — the probe side hashes
    * through the SAME native expression as the build side (a single
    * token's hash array is `[hash]`), the sketch row broadcasts, and the
    * estimate is a bounded in-row fold. Probes with no token (empty /
    * whitespace terms) are dropped. */
  def cmEstimate(sketch: DataFrame, probes: DataFrame, termCol: String,
                 d: Int = 4, w: Int = 1024, hashSeed: Long = 7L,
                 mixSeed: Long = 13L): DataFrame = {
    val hashed = probes
      .withColumn("_ths", tokenHashes(col(termCol), hashSeed))
      .filter(size(col("_ths")) === 1)
      .withColumn("_th", element_at(col("_ths"), 1))
    hashed
      .crossJoin(broadcast(sketch.select(col("regs"))))
      .withColumn("est", array_min(transform(
        sequence(lit(0), lit(d - 1)),
        i => element_at(col("regs"),
          (i.cast(LongType) * lit(w.toLong) +
            bucketCol(col("_th"), i, d, w, mixSeed) + lit(1L)).cast("int")))))
      .select(col(termCol), col("est"))
  }
}

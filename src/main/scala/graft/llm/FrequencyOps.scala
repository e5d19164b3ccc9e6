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

package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic token-budget data mixing: select documents per mixture
  * component (domain/source/language) until each component's token budget is
  * met — the final assembly step of a training-data pipeline ("X% web, Y%
  * code, capped at N tokens total").
  *
  * Selection order within a component is the [[SampleOps.hashBucket]]
  * priority (then id) — reproducible across runs, cluster sizes and
  * incremental re-runs, and consistent with the sampling ops: a doc that
  * survives a budget cut keeps surviving when the budget grows.
  *
  * Scale design — the naive plan (cumulative sum over a Window partitioned
  * by component) funnels each component's ENTIRE corpus slice through one
  * partition: the fold_id straggler bomb at 100 TB scale. Instead the exact
  * prefix rule is computed in two phases:
  *
  *  1. a (component × coarse-bucket) token histogram — ≤ budgets.size ×
  *     `nCoarse` rows, aggregated with map-side partial combine. The
  *     running prefix over THAT is a window over a tiny table, and tells
  *     every coarse bucket whether it falls wholly inside the budget,
  *     wholly outside, or on the boundary;
  *  2. only the (at most one per component) boundary bucket's rows — an
  *     expected `1/nCoarse` slice of the component — go through an exact
  *     per-row cumulative sum. Everything else is a broadcast-joined
  *     codegen filter.
  *
  * A document is kept iff its inclusive prefix token sum ≤ the component
  * budget. Rows with non-positive token counts and rows in components
  * without a budget are dropped.
  */
object MixOps {

  private val P = SampleOps.P

  /** Per-component budgets from mixture weights: floor(weight · total). */
  def budgetsFromWeights(weights: Map[String, Double], totalBudget: Long): Map[String, Long] = {
    require(weights.values.forall(_ >= 0.0), "mixture weights must be non-negative")
    require(totalBudget >= 0, s"totalBudget must be non-negative, got $totalBudget")
    weights.map { case (k, w) => k -> math.floor(w * totalBudget).toLong }
  }

  /** Select rows to meet per-component token budgets (see object doc).
    * `budgets` is a driver-side map — mixture components are a bounded spec
    * (dozens of sources/languages), not an unbounded key space; for
    * unbounded per-web-domain CAPS use [[DomainOps.capPerDomain]].
    * Returns the surviving input rows, original columns unchanged. */
  def selectPerDomainBudget(df: DataFrame, idCol: String, domainCol: String,
                            tokenCol: String, budgets: Map[String, Long],
                            seed: Long, nCoarse: Int = 4096): DataFrame = {
    require(budgets.nonEmpty, "selectPerDomainBudget needs at least one (component, budget)")
    require(budgets.values.forall(_ >= 0L), "token budgets must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    selectWithBudgetDf(df, idCol, domainCol, tokenCol,
      budgets.toSeq.sortBy(_._1).toDF(domainCol, "_budget"), seed, nCoarse)
  }

  /** Core of [[selectPerDomainBudget]] with the budgets as a (component,
    * `_budget`) DataFrame — small by contract (one row per mixture
    * component), broadcast at every use. Lets data-derived allocations
    * ([[unimaxSelect]]) share the two-phase exact-prefix machinery. */
  private[llm] def selectWithBudgetDf(df: DataFrame, idCol: String, domainCol: String,
                                      tokenCol: String, budgetDf: DataFrame,
                                      seed: Long, nCoarse: Int): DataFrame = {
    require(nCoarse >= 1, s"nCoarse must be >= 1, got $nCoarse")
    val outCols = df.columns.toSeq.map(col)
    val width = P / nCoarse + 1 // coarse bucket = _b / width, order-compatible with _b
    val base = df
      .filter(col(tokenCol) > 0)
      .join(broadcast(budgetDf), Seq(domainCol)) // unbudgeted components drop here
      .withColumn("_b", SampleOps.hashBucket(col(idCol), seed))
      .withColumn("_coarse", (col("_b") / width).cast(LongType))
    // phase 1: tiny histogram + its running prefix (window over ≤
    // budgets.size × nCoarse rows — bounded, not corpus-sized)
    val hist = base.groupBy(col(domainCol), col("_coarse"))
      .agg(sum(col(tokenCol)).as("_t"))
    val wHist = Window.partitionBy(col(domainCol)).orderBy(col("_coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("_before", coalesce(sum(col("_t")).over(wHist), lit(0L)))
    // phase 2: classify each row's coarse bucket via broadcast join
    val tagged = base.join(broadcast(cum), Seq(domainCol, "_coarse"))
    val fullKeep = tagged.filter(col("_before") + col("_t") <= col("_budget"))
    val boundary = tagged.filter(
      col("_before") < col("_budget") && col("_before") + col("_t") > col("_budget"))
    // exact per-row prefix only on the boundary slice (one coarse bucket per
    // component — an expected 1/nCoarse of the component's rows)
    val wRow = Window.partitionBy(col(domainCol)).orderBy(col("_b"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKeep = boundary
      .withColumn("_cum", col("_before") + sum(col(tokenCol)).over(wRow))
      .filter(col("_cum") <= col("_budget"))
      .drop("_cum")
    fullKeep.unionByName(boundaryKeep).select(outCols: _*)
  }

  /** Single-budget convenience: select rows (hash-priority order) until the
    * corpus-wide token budget is met. */
  def selectToTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                          budget: Long, seed: Long, nCoarse: Int = 4096): DataFrame = {
    val tagged = df.withColumn("_dom", lit("_all"))
    selectPerDomainBudget(tagged, idCol, "_dom", tokenCol,
      Map("_all" -> budget), seed, nCoarse).drop("_dom")
  }

  /** Mixture convenience: weights + a total budget (see
    * [[budgetsFromWeights]]). */
  def mixToTokenBudget(df: DataFrame, idCol: String, domainCol: String,
                       tokenCol: String, weights: Map[String, Double],
                       totalBudget: Long, seed: Long,
                       nCoarse: Int = 4096): DataFrame =
    selectPerDomainBudget(df, idCol, domainCol, tokenCol,
      budgetsFromWeights(weights, totalBudget), seed, nCoarse)

  /** Deterministic training-order shuffle + sharding: assign every row a
    * shard (`shard_id` ∈ [0, nShards)) and a position within that shard
    * (`shard_pos`, 0-based), together defining a reproducible pseudo-random
    * permutation of the corpus — the global training order is
    * (shard_id, shard_pos), independent of input partitioning, cluster size,
    * and insertion order, so a re-run (or a resumed run on different
    * hardware) reads the examples in the SAME order.
    *
    * shard_id = [[SampleOps.hashBucket]](id, seed) mod nShards; within a
    * shard, rows order by (hashBucket(id, seed'), id) — a second,
    * independently-seeded draw, so the within-shard order does not correlate
    * with the shard assignment draw. The per-shard `row_number` Window is
    * the intended scale shape: `nShards` is chosen ∝ corpus size (a shard IS
    * a training file, bounded at a few GB), so each Window partition is
    * bounded by the shard-file contract, never by the corpus — choosing
    * nShards ~ corpus/shardBytes is the same discipline as sizing output
    * files. */
  /** UniMax budget allocation (Chung et al. 2022, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual Pretraining",
    * ICLR 2023): distribute a total token budget across strata (languages)
    * as uniformly as possible, capping every stratum at `maxEpochs` passes
    * over its data, and waterfilling the freed-up budget into the larger
    * strata.
    *
    * Closed form over the per-stratum totals (never a driver loop): sort
    * strata by capacity `cap_l = ⌊maxEpochs · n_l⌋` ascending; stratum i is
    * "capped" iff `cap_i · (L − i + 1) ≤ B − Σ_{j<i} cap_j` (for ascending
    * caps the greedy flags are prefix-closed — the waterfilling lemma);
    * capped strata get `cap_l`, the rest share the remainder equally
    * (`⌊·⌋`, with the ≤ L−m−1 leftover tokens given one-each to the first
    * strata in sort order, so `Σ budgets = min(B, Σ cap)` exactly).
    *
    * Scale: one groupBy(strata) over the corpus (map-side combined), then
    * window math over the ≤ |strata| allocation rows — bounded, not
    * corpus-sized.
    *
    * @return one row per stratum: (strataCol, `n_tokens`, `capacity`,
    *         `budget`)
    */
  def unimaxAllocations(df: DataFrame, strataCol: String, tokenCol: String,
                        totalBudget: Long, maxEpochs: Double): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be non-negative, got $totalBudget")
    require(maxEpochs > 0.0, s"maxEpochs must be > 0, got $maxEpochs")
    val totals = df.filter(col(tokenCol) > 0)
      .groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).cast(LongType).as("n_tokens"))
      .withColumn("capacity", floor(col("n_tokens") * lit(maxEpochs)).cast(LongType))
    // ≤ |strata| rows from here on: the single-partition windows are over a
    // bounded spec-sized table, not the corpus. Every window shares ONE
    // spec family — empty partition, (capacity, strata) order, frames
    // varying — so Catalyst plans exactly two WindowExecs (the second
    // consumes _capped, which the first materializes) with ONE sort and
    // no exchange between them; the former partitionBy(lit(1)) totals
    // forced a third window with its own distribution (r9 bench watch
    // item: unimax_select +20%).
    val wOrder = Window.orderBy(col("capacity"), col(strataCol))
    val wPrev = wOrder.rowsBetween(Window.unboundedPreceding, -1)
    val wFull = wOrder.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val L = count(lit(1)).over(wFull)
    val flagged = totals
      .withColumn("_i", row_number().over(wOrder))
      .withColumn("_pc_prev", coalesce(sum(col("capacity")).over(wPrev), lit(0L)))
      .withColumn("_capped",
        col("capacity") * (L - col("_i") + 1L) <= lit(totalBudget) - col("_pc_prev"))
    val m = sum(when(col("_capped"), 1L).otherwise(0L)).over(wFull)
    val pcM = sum(when(col("_capped"), col("capacity")).otherwise(0L)).over(wFull)
    val nUncapped = L - m
    val rem = lit(totalBudget) - pcM
    val share = when(nUncapped > 0L, floor(rem / nUncapped).cast(LongType)).otherwise(lit(0L))
    val leftover = when(nUncapped > 0L, rem - share * nUncapped).otherwise(lit(0L))
    flagged
      .withColumn("budget",
        when(col("_capped"), col("capacity"))
          .otherwise(share + when(col("_i") - m <= leftover, 1L).otherwise(0L)))
      .select(col(strataCol), col("n_tokens"), col("capacity"), col("budget"))
  }

  /** UniMax selection: compute [[unimaxAllocations]] and select each
    * stratum's documents to its allocated budget with the same
    * deterministic hash-priority, two-phase exact-prefix rule as
    * [[selectPerDomainBudget]]. Returns the surviving rows unchanged. */
  def unimaxSelect(df: DataFrame, idCol: String, strataCol: String, tokenCol: String,
                   totalBudget: Long, maxEpochs: Double, seed: Long,
                   nCoarse: Int = 4096): DataFrame = {
    val budgets = unimaxAllocations(df, strataCol, tokenCol, totalBudget, maxEpochs)
      .select(col(strataCol), col("budget").as("_budget"))
    selectWithBudgetDf(df, idCol, strataCol, tokenCol, budgets, seed, nCoarse)
  }

  def deterministicShard(df: DataFrame, idCol: String, nShards: Int,
                         seed: Long): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val shardDraw = SampleOps.hashBucket(col(idCol), seed)
    val orderDraw = SampleOps.hashBucket(col(idCol), seed + 1)
    df.withColumn("shard_id", pmod(shardDraw, lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard_id"))
          .orderBy(orderDraw, col(idCol))).cast(LongType) - 1L)
  }
}

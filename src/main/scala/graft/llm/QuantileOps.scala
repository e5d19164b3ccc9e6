package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact score-quantile selection at corpus scale: "keep the top X% of
  * documents by quality score" — the thresholding step behind every
  * classifier-based quality gate (CCNet perplexity terciles, fasttext
  * quality top-k, DSIR weight cuts).
  *
  * The naive plan is a global sort (or a corpus-wide window rank) — the
  * one-partition straggler at 100 TB. Instead the exact cutoff is found
  * with the same two-phase discipline as [[MixOps.selectPerDomainBudget]],
  * generalized from token prefix-sums to arbitrary DOUBLE scores via
  * [[graft.functions.SortableDoubleBits]]:
  *
  *  1. a 65,536-bucket histogram over the TOP 16 BITS of the
  *     order-preserving sortable-bits transform — bucket boundaries follow
  *     score order, so a running count over the (bounded) histogram
  *     locates the single bucket containing the k-th row;
  *  2. rows in wholly-kept buckets pass a broadcast-joined codegen filter;
  *     only the boundary bucket's rows (expected corpus/65,536) are ranked
  *     exactly, by (score, id).
  *
  * Determinism: ties at the cutoff break by id ascending, so the selected
  * set is unique and replayable (the oracle is a plain window rank).
  * Degenerate case: a huge mass of IDENTICAL scores lands in one boundary
  * bucket and its refinement ranks that mass in one partition — the same
  * caveat as any order statistic over a constant column; real quality
  * scores (perplexities, log-weights) don't mass on one double value.
  * Null and NaN scores are dropped (a NaN quality signal is a broken
  * signal, not a rankable one).
  */
object QuantileOps {

  private def sortableBits(c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.SortableDoubleBits(
        org.apache.spark.sql.GraftExpressionBridge.expression(c)))

  /** Keep the exact `k` best rows by `scoreCol` (ties → smaller id wins).
    * `k` is a Column so callers can derive it in-plan (see
    * [[filterTopFraction]]); it must be a single value per row
    * (a cross-joined broadcast scalar or a literal). */
  private def selectTopKByKey(df: DataFrame, idCol: String, scoreCol: String,
                              kCol: Column, highest: Boolean): DataFrame = {
    val outCols = df.columns.toSeq.map(col)
    // rank on the 6-decimal-rounded value with the id tiebreak — the repo's
    // cross-engine rank/selection convention (bm25TopK/dsirSelect do the
    // same), so an engine-drifting score (unrounded DSIR logw, a BM25 sum)
    // cannot pick a different cutoff set than the window-rank oracle at the
    // last ulp
    val score = round(col(scoreCol).cast("double"), 6)
    val bits = sortableBits(score)
    // ~bits reverses the total order with no overflow, so the selection is
    // always "smallest k by (_key, id)"
    val keyed = df
      .filter(score.isNotNull && !isnan(score))
      .withColumn("_key", if (highest) bitwise_not(bits) else bits)
      .withColumn("_k", kCol)
    // order-preserving coarse bucket: top 16 bits (signed shift keeps order)
    val bucketed = keyed.withColumn("_coarse", shiftright(col("_key"), 48))
    val hist = bucketed.groupBy(col("_coarse")).agg(count(lit(1)).as("_cnt"))
    val wHist = Window.orderBy(col("_coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("_before", coalesce(sum(col("_cnt")).over(wHist), lit(0L)))
    val tagged = bucketed.join(broadcast(cum), Seq("_coarse"))
    val fullKeep = tagged.filter(col("_before") + col("_cnt") <= col("_k"))
    val boundary = tagged.filter(
      col("_before") < col("_k") && col("_before") + col("_cnt") > col("_k"))
    // exact rank only inside the single boundary bucket
    val wRow = Window.orderBy(col("_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKeep = boundary
      .withColumn("_r", col("_before") + count(lit(1)).over(wRow))
      .filter(col("_r") <= col("_k"))
    fullKeep.select(outCols: _*).unionByName(boundaryKeep.select(outCols: _*))
  }

  /** Keep the exact `k` highest- (or lowest-) scoring rows. */
  def selectTopK(df: DataFrame, idCol: String, scoreCol: String, k: Long,
                 highest: Boolean = true): DataFrame = {
    require(k >= 0, s"k must be non-negative, got $k")
    selectTopKByKey(df, idCol, scoreCol, lit(k), highest)
  }

  /** Attach the exact global 1-based rank by (`scoreCol`, id) — WITHOUT a
    * single-partition window: the coarse histogram's running count gives
    * every bucket its global offset (broadcast), and the within-bucket
    * row_number runs in a window PARTITIONED by the coarse bucket, so every
    * sort partition is bounded by bucket occupancy (expected corpus/65,536)
    * instead of the corpus. Rows with null/NaN scores are dropped (rank is
    * undefined for them). `ascending=false` ranks best-first for
    * "higher is better" scores. */
  def withExactRank(df: DataFrame, idCol: String, scoreCol: String,
                    ascending: Boolean = true, out: String = "rank"): DataFrame = {
    // 6-decimal-rounded rank key + id tiebreak (see selectTopKByKey)
    val score = round(col(scoreCol).cast("double"), 6)
    val bits = sortableBits(score)
    val keyed = df
      .filter(score.isNotNull && !isnan(score))
      .withColumn("_key", if (ascending) bits else bitwise_not(bits))
      .withColumn("_coarse", shiftright(col("_key"), 48))
    val hist = keyed.groupBy(col("_coarse")).agg(count(lit(1)).as("_cnt"))
    val wHist = Window.orderBy(col("_coarse"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("_before", coalesce(sum(col("_cnt")).over(wHist), lit(0L)))
      .drop("_cnt")
    val wIn = Window.partitionBy(col("_coarse")).orderBy(col("_key"), col(idCol))
    keyed.join(broadcast(cum), Seq("_coarse"))
      .withColumn(out, col("_before") + row_number().over(wIn).cast(LongType))
      .drop("_coarse", "_key", "_before")
  }

  /** Per-group score percentile — `cume_dist` within the row's group:
    * `pct = |{rows in g with s' ≤ s}| / |g|` on the 6-decimal-rounded
    * score. The calibration step behind per-domain / per-dump quality
    * normalization (the FineWeb recipe: filter on each crawl dump's OWN
    * score distribution, because absolute classifier scores drift across
    * dumps) — compose as
    * `percentileByGroup(df, "dump", ...).filter(col("pct") >= 1 - frac)`.
    *
    * Scale design: the naive plan is a corpus-wide window partitioned by
    * group (one straggler partition per hot domain). Instead the corpus
    * aggregates to DISTINCT (group, rounded score) rows — bounded by the
    * score grid, not the corpus — the CDF windows run over that rollup,
    * and each row collects its percentile through an equi join on
    * (group, score) carrying only (id, group, score): full rows (and
    * text) never cross an exchange. Ties share one CDF row by
    * construction, so the result is deterministic and engine-independent
    * (cum/n is one IEEE division of two exact counts).
    *
    * Output: (idCol, groupCol, scoreCol — rounded, `out`). Null/NaN
    * scores are dropped (the [[withExactRank]] contract). */
  def percentileByGroup(df: DataFrame, groupCol: String, idCol: String,
                        scoreCol: String, out: String = "pct"): DataFrame = {
    val s = round(col(scoreCol).cast("double"), 6)
    val keyed = df.filter(s.isNotNull && !isnan(s))
      .select(col(idCol), col(groupCol), s.as("_s"))
    val hist = keyed.groupBy(col(groupCol), col("_s")).agg(count(lit(1)).as("_cnt"))
    val wCdf = Window.partitionBy(col(groupCol)).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cdf = hist
      .withColumn("_cum", sum(col("_cnt")).over(wCdf))
      .withColumn("_n", sum(col("_cnt")).over(wN))
      .select(col(groupCol), col("_s"),
        round(col("_cum").cast("double") / col("_n").cast("double"), 6).as(out))
    keyed.join(cdf, Seq(groupCol, "_s"))
      .select(col(idCol), col(groupCol), col("_s").as(scoreCol), col(out))
  }

  /** Keep each group's top `frac` by score — the per-dump quality gate:
    * rows whose within-group percentile exceeds `1 − frac`. Quantile-
    * THRESHOLD semantics: a tie group (same 6-decimal score) is kept or
    * dropped whole, so per-group kept counts are the largest tie-closed
    * set within the fraction, not an exact `⌊frac·n⌋` (use
    * [[filterTopFraction]] per group when exact-k matters more than
    * score-consistency). Same bounded-rollup plan as
    * [[percentileByGroup]]; the gate itself is a map-side filter. */
  def filterTopFractionByGroup(df: DataFrame, groupCol: String, idCol: String,
                               scoreCol: String, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0,1], got $frac")
    percentileByGroup(df, groupCol, idCol, scoreCol)
      .filter(col("pct") > lit(1.0 - frac))
      .drop("pct")
  }

  /** Exact quantile-bucket assignment: bucket `b ∈ [0, nBuckets)` with
    * `b = ⌊(rank − 1) · nBuckets / N⌋` over the ascending (score, id) rank —
    * the balanced-bucket rule (ntile), computed with [[withExactRank]]'s
    * bounded-partition machinery instead of a corpus-wide window. The
    * CCNet head/middle/tail perplexity split is `nBuckets = 3`. */
  def quantileBuckets(df: DataFrame, idCol: String, scoreCol: String,
                      nBuckets: Int, out: String = "bucket"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val score = col(scoreCol).cast("double")
    val n = df.filter(score.isNotNull && !isnan(score))
      .agg(count(lit(1)).as("_n"))
    withExactRank(df.crossJoin(broadcast(n)), idCol, scoreCol, ascending = true,
        out = "_rank")
      .withColumn(out,
        floor((col("_rank") - 1L) * lit(nBuckets.toLong) / col("_n")).cast(LongType))
      .drop("_rank", "_n")
  }

  /** Keep the exact top `frac` fraction of rows by score:
    * `k = ⌊frac · N⌋` where N counts the rankable rows (non-null,
    * non-NaN scores). N is derived IN-PLAN (a broadcast one-row aggregate),
    * so no driver-side count action runs. */
  def filterTopFraction(df: DataFrame, idCol: String, scoreCol: String,
                        frac: Double, highest: Boolean = true): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val score = col(scoreCol).cast("double")
    val n = df.filter(score.isNotNull && !isnan(score))
      .agg(count(lit(1)).as("_n"))
    val withK = df.crossJoin(broadcast(n))
    selectTopKByKey(withK, idCol, scoreCol,
      floor(col("_n") * lit(frac)).cast(LongType), highest)
      .drop("_n")
  }

  // ---------------------------------------- mergeable quantile sketch

  /** Walk the value-sorted summary once and return the first value whose
    * cumulative weight reaches `⌈q·n⌉` — the rank-`⌈q·n⌉` estimate (exact
    * order statistic when no compaction fired). A Scala UDF is the right
    * tool here, not a codegen expression or a window: it runs ONCE PER
    * (group, q) over a row whose payload is the bounded summary (never
    * the corpus), and unlike a window-function prefix sum it composes
    * with streaming complete mode, where window functions are
    * unsupported. Returns null on an empty summary (no rankable rows). */
  private val pickQuantile =
    udf((items: Seq[org.apache.spark.sql.Row], n: Long, q: Double) => {
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var i = 0
      var out: java.lang.Double = null
      while (i < items.length && out == null) {
        cum += items(i).getLong(1)
        if (cum >= target) out = items(i).getDouble(0)
        i += 1
      }
      out
    })

  /** Shared tail of the sketch quantile ops: one output row per requested
    * quantile, values picked from the bounded merged summary. */
  private def sketchQuantiles(summary: DataFrame, qs: Seq[Double],
                              keep: Seq[String]): DataFrame =
    summary.select(keep.map(col) ++ Seq(col("_sk.n").as("n"),
        col("_sk.err").as("max_rank_err"), col("_sk.items").as("_items")): _*)
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("value", pickQuantile(col("_items"), col("n"), col("q")))
      .filter(col("value").isNotNull)

  /** Corpus score quantiles via a mergeable rank sketch
    * ([[graft.functions.KllQuantileSketch]]) — the streaming/monitoring
    * complement to the exact two-phase machinery above. Scale shape: the
    * exact path's histogram needs a full batch pass per question; here
    * each partition folds its scores map-side into one bounded compactor
    * summary, ONE serialized buffer per partition crosses the single
    * exchange, and every requested quantile is answered from the merged
    * summary at once — shuffle volume independent of corpus size, and the
    * same aggregate runs over an unbounded ingest stream in complete mode
    * (the typed buffer round-trips the state store; KllSketchSpec pins
    * batch ≡ stream). Scores follow the house cross-engine convention
    * (6-decimal round; null/NaN dropped).
    *
    * Exactness contract: with `capacity` ≥ the rankable row count no
    * compaction fires, `max_rank_err` = 0, and each returned value IS the
    * exact order statistic at rank `⌈q·n⌉` (ranked on the ROUNDED score)
    * — the regime the driver row hash-gates against a row_number oracle.
    * Below that, the estimate's rank is within the REPORTED
    * `max_rank_err` of `⌈q·n⌉` — like any mergeable sketch the estimate
    * depends on partition layout, the bound does not (KllSketchSpec
    * checks it against true ranks on a skewed corpus).
    *
    * Output: (q, value, n, max_rank_err) — one row per requested q. */
  def scoreQuantilesSketch(df: DataFrame, scoreCol: String, qs: Seq[Double],
                           capacity: Int = 16384): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    qs.foreach(q => require(q > 0.0 && q <= 1.0, s"each q must be in (0,1], got $q"))
    val summary = rankable(df, scoreCol)
      .agg(sketchAgg(capacity))
    sketchQuantiles(summary, qs, Seq.empty)
      .select(col("q"), col("value"), col("n"), col("max_rank_err"))
  }

  /** Rankable rows with the house cross-engine score key: 6-decimal
    * round, null/NaN dropped. */
  private def rankable(df: DataFrame, scoreCol: String): DataFrame = {
    val score = round(col(scoreCol).cast("double"), 6)
    df.withColumn("_v", score).filter(col("_v").isNotNull && !isnan(col("_v")))
  }

  private def sketchAgg(capacity: Int): Column = {
    val B = org.apache.spark.sql.GraftExpressionBridge
    B.column(graft.functions.KllQuantileSketch(
      B.expression(col("_v")), capacity).toAggregateExpression()).as("_sk")
  }

  /** Per-group [[scoreQuantilesSketch]] (per-domain / per-language score
    * distributions): same sketch, same exactness contract per group; the
    * exchange is keyed on the GROUP (bounded: domains, languages),
    * carrying one bounded sketch buffer per (partition, group) — row
    * cardinality still never shuffles. Output:
    * (group, q, value, n, max_rank_err). */
  def scoreQuantilesSketchBy(df: DataFrame, groupCol: String, scoreCol: String,
                             qs: Seq[Double], capacity: Int = 16384): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    qs.foreach(q => require(q > 0.0 && q <= 1.0, s"each q must be in (0,1], got $q"))
    val summary = rankable(
        df.select(col(groupCol).as("group"), col(scoreCol)), scoreCol)
      .groupBy(col("group"))
      .agg(sketchAgg(capacity))
    sketchQuantiles(summary, qs, Seq("group"))
      .select(col("group"), col("q"), col("value"), col("n"), col("max_rank_err"))
  }

  // ------------------------------------- persisted sketch (restartable)

  /** The bounded sketch SUMMARY itself — (`n`, `err`, `items`) flattened
    * from one pass over the scores, the persistable/composable unit (one
    * row; the per-crawl artifact a restartable ingest pipeline keeps). */
  def sketchSummary(df: DataFrame, scoreCol: String,
                    capacity: Int = 16384): DataFrame =
    rankable(df, scoreCol).agg(sketchAgg(capacity))
      .select(col("_sk.n").as("n"), col("_sk.err").as("err"),
        col("_sk.items").as("items"))

  /** Per-group [[sketchSummary]]: (`group`, `n`, `err`, `items`). */
  def sketchSummaryBy(df: DataFrame, groupCol: String, scoreCol: String,
                      capacity: Int = 16384): DataFrame =
    rankable(df.select(col(groupCol).as("group"), col(scoreCol)), scoreCol)
      .groupBy(col("group")).agg(sketchAgg(capacity))
      .select(col("group"), col("_sk.n").as("n"), col("_sk.err").as("err"),
        col("_sk.items").as("items"))

  /** Persist summary rows (`[group,] n, err, items`) — one tiny parquet
    * per corpus version/shard, the writeCmSketch/writeHllSketch
    * discipline applied to the score CDF: a restartable ingest pipeline
    * re-reads the fitted distribution instead of re-scanning any corpus. */
  def writeKllSketch(summary: DataFrame, path: String): Unit =
    summary.write.mode("overwrite").parquet(path)

  def readKllSketch(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private def mergeAgg(capacity: Int): Column = {
    val B = org.apache.spark.sql.GraftExpressionBridge
    B.column(graft.functions.KllMergeSummaries(
      B.expression(struct(col("n"), col("err"), col("items"))), capacity)
      .toAggregateExpression()).as("_sk")
  }

  /** Merge persisted summary rows back to one summary per group set
    * (pass `Seq.empty` for a global merge): items of weight `2^h`
    * re-enter the compactor hierarchy at level `h`, so in the exact
    * regime (no compaction anywhere) the merge IS the single-pass sketch,
    * and in the approximate regime the summed `err` bound holds — shards
    * compose across corpus versions without re-reading anything. */
  def mergeKllSummaries(summaries: DataFrame, groupCols: Seq[String],
                        capacity: Int = 16384): DataFrame = {
    val merged =
      if (groupCols.isEmpty) summaries.agg(mergeAgg(capacity))
      else summaries.groupBy(groupCols.map(col): _*).agg(mergeAgg(capacity))
    merged.select((groupCols.map(col) :+ col("_sk.n").as("n") :+
      col("_sk.err").as("err") :+ col("_sk.items").as("items")): _*)
  }

  /** Score → percentile gate from a (possibly read-back, possibly merged)
    * summary: each row gets the estimated CDF value of its score —
    * `P(X ≤ x) = cumulative weight of summary items ≤ x, over n` — the
    * FineWeb-style "filter on the crawl's own score distribution" knob in
    * its STREAMING form. The exact path ([[percentileByGroup]]) needs the
    * batch; here the standing summary collects ONCE into broadcast sorted
    * arrays (bounded: O(capacity · log(n/capacity)) items) and every row
    * scores in place with one binary search — no join, no aggregation,
    * fully stateless, so the same call gates a micro-batch unchanged (the
    * trained-gate broadcast-scorer discipline).
    *
    * Exactness contract: scores round to 6 decimals (the summary's
    * `rankable` convention) before the lookup, and in the exact regime
    * (err = 0) the result IS the batch `cume_dist` on the rounded score —
    * hash-gateable; in the approximate regime the estimate's rank error
    * is bounded by the summary's `err / n`. Null/NaN scores emit a null
    * percentile. Output: input columns + `out` (the estimated CDF in
    * (0, 1], one IEEE division, rounded to 6). */
  def percentileFromSummary(df: DataFrame, scoreCol: String,
                            summary: DataFrame,
                            out: String = "score_pct"): DataFrame = {
    val row = summary.select(col("n"), col("items")).collect()(0)
    val n = row.getLong(0)
    require(n > 0L, "summary is empty — fit it on at least one rankable row")
    val items = row.getSeq[org.apache.spark.sql.Row](1)
    val vs = new Array[Double](items.length)
    val cum = new Array[Long](items.length)
    var acc = 0L
    var i = 0
    while (i < items.length) {
      vs(i) = items(i).getDouble(0)
      acc += items(i).getLong(1)
      cum(i) = acc
      i += 1
    }
    val spark = df.sparkSession
    val bcV = spark.sparkContext.broadcast(vs)
    val bcC = spark.sparkContext.broadcast(cum)
    val nn = n
    val pctUdf = udf((x: java.lang.Double) => {
      if (x == null || x.isNaN) null
      else {
        // last index with value <= x (items sorted ascending)
        val v = bcV.value
        var lo = 0; var hi = v.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (v(mid) <= x) { ans = mid; lo = mid + 1 } else hi = mid - 1
        }
        val c = if (ans < 0) 0L else bcC.value(ans)
        java.lang.Double.valueOf(
          BigDecimal(c.toDouble / nn).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
    })
    df.withColumn(out, pctUdf(round(col(scoreCol).cast("double"), 6)))
  }

  /** Answer quantiles from a (possibly read-back, possibly merged)
    * summary — the query side of the persisted path; same output shape
    * as [[scoreQuantilesSketch]] (+ the carried group columns). */
  def quantilesFromSummary(summary: DataFrame, qs: Seq[Double],
                           groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    qs.foreach(q => require(q > 0.0 && q <= 1.0, s"each q must be in (0,1], got $q"))
    val sk = summary.select((groupCols.map(col) :+
      struct(col("n"), col("err"), col("items")).as("_sk")): _*)
    sketchQuantiles(sk, qs, groupCols)
      .select((groupCols.map(col) ++ Seq(col("q"), col("value"), col("n"),
        col("max_rank_err"))): _*)
  }
}

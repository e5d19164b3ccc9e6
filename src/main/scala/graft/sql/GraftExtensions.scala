package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, CreateMap, CreateNamedStruct, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL-string table-macro surface, matching the reference's primary UX
  * (src/macros/ts_macros.cpp:2131-2166 table-macro expansion):
  *
  * {{{
  * SELECT * FROM ts_forecast_by('sales', product_id, date, qty, 'AutoETS', 12, '1d')
  * }}}
  *
  * Two equivalent registration routes, both expanding to the same logical
  * plans the Scala API builds (macro expansion at analysis time, exactly how
  * the reference's table macros splice a parsed SELECT body in at bind time):
  *
  *  1. [[Register.registerAll]] puts the macros in the session's
  *     table-function registry — works on any already-running session, but
  *     Spark resolves registry-TVF arguments eagerly, so column names must
  *     be passed as STRING LITERALS there (`ts_stats_by('t','g','ds','y','1d')`).
  *  2. `spark.sql.extensions=graft.sql.GraftExtensions` (or
  *     `SparkSession.builder.withExtensions(new GraftExtensions)`) injects a
  *     resolution rule that expands the macro BEFORE argument resolution —
  *     bare identifiers work exactly like the reference
  *     (`ts_stats_by('t', g, ds, y, '1d')`). The standard deployment
  *     mechanism for clusters where the platform builds the session.
  *
  * Supported macros (positional args; the trailing params map is optional):
  *  - `ts_forecast_by(source, group_col, date_col, target_col, method, horizon, frequency[, params])`
  *    (ts_macros.cpp:575 — params via Spark `map('k','v', …)` syntax)
  *  - `ts_stats_by(source, group_col, date_col, value_col, frequency)` (ts_macros.cpp:1602)
  *  - `ts_fill_gaps_by(source, group_col, date_col, value_col, frequency)` (ts_macros.cpp:348)
  *  - `ts_backtest_auto_by(source, group_col, date_col, target_col, horizon, folds,
  *    frequency[, params[, features[, metric]]])` (ts_backtest_native.cpp:975-1002;
  *    features must be NULL — exogenous backtesting goes through the Scala API)
  *  - `ts_forecast(source, date_col, target_col, method, horizon[, params])`
  *    single series (ts_macros.cpp:539)
  *  - `ts_cv_folds_by(source, group_col, date_col, target_col, n_folds, horizon[, params])`
  *    (ts_macros.cpp:1364)
  *  - `ts_data_quality_by(source, unique_id_col, date_col, value_col[, n_short[, frequency]])`
  *    (ts_macros.cpp:1616)
  *  - `ts_features_by(source, group_col, date_col, value_col)` (ts_macros.cpp:1776)
  *  - `ts_forecast_inspect_by(source, group_col, date_col, target_col, method[, params])`
  *    and `ts_forecast_explain_by(…, method, horizon[, params])`
  *    (ts_macros.cpp:605, :687)
  *  - `ts_conformal_by(backtest_results, group_col, actual_col, forecast_col,
  *    point_forecast_col[, params])` — params keys alpha / method
  *    (ts_macros.cpp:1453)
  *  - prep family: `ts_drop_constant_by(source, group_col, value_col)`,
  *    `ts_drop_short_by(source, group_col, min_length)`,
  *    `ts_fill_nulls_const_by(source, group_col, date_col, value_col, fill_value)`,
  *    `ts_fill_nulls_forward_by` / `ts_fill_nulls_backward_by(source, group_col,
  *    date_col, value_col)`, `ts_diff_by(…, diff_order)` (ts_macros.cpp:174-341)
  *  - hierarchy natives: `ts_combine_keys(source[, params])` /
  *    `ts_aggregate_hierarchy(source[, params])` (input columns positional:
  *    date, value, ids…), `ts_split_keys(source[, params])` (input:
  *    unique_id, date, value; params keys separator/columns),
  *    `ts_validate_separator(source[, params])`
  *  - metric family: `ts_{mae,mse,rmse,mape,smape,r2,bias}_by(source,
  *    date_col, actual_col, forecast_col)`,
  *    `ts_mase_by(…, baseline_col)`, `ts_rmae_by(…, pred1_col, pred2_col)`,
  *    `ts_coverage_by(…, lower_col, upper_col)`,
  *    `ts_quantile_loss_by(…, quantile)` — group columns = every other
  *    input column, output column named after the metric
  *    (ts_macros.cpp:2017-2127)
  *  - detection family: `ts_detrend_by(…, method)`,
  *    `ts_detect_changepoints_by(…[, params])` (hazard_lambda,
  *    include_probabilities), `ts_mstl_decomposition_by(…[, params])`
  *    (periods CSV, insufficient_data), `ts_detect_periods_by(…[, params])`
  *    (method, max_period, min_confidence) (ts_macros.cpp:419-526, :1858)
  *  - `ts_forecast_exog_by(source, group_col, date_col, target_col,
  *    array('x1', …), future_source, future_date_col, array('x1', …),
  *    frequency[, method[, horizon[, params]]])` and the group-less
  *    `ts_forecast_exog(source, date_col, target_col, xregs, future_source,
  *    future_date_col, future_xregs[, method[, horizon[, params]]])`
  *    (ts_macros.cpp:756, :830)
  *  - domain curation: `extract_domain(source, url_col)`,
  *    `domain_filter(source, id_col, domain_col, array('d1', …)[, mode])`
  *    (mode block|allow, default block),
  *    `cap_per_domain(source, id_col, domain_col, cap, seed)`
  *  - span dedup: `dedup_spans(source, id_col, text_col, gram_len)`
  *    (cross-document duplicated-span removal, Lee et al. 2022)
  *  - cross-corpus dedup: `dedup_against(source, reference, id_col,
  *    text_col[, threshold])` (keep source rows with no near-dup in the
  *    reference corpus)
  *  - quality filters: `c4_quality_filter(source, text_col)` /
  *    `gopher_quality_filter(source, text_col)` (Raffel et al. 2020 §2.2;
  *    Rae et al. 2021 Table A1)
  *  - training order: `shard_deterministic(source, id_col, n_shards, seed)`
  *  - LM quality signal: `lm_perplexity(source, id_col, text_col[,
  *    vocab_size[, alpha]])` (CCNet-style unigram self-perplexity) and
  *    `lm_bigram_perplexity(source, id_col, text_col[, vocab_size[,
  *    bigram_vocab_size[, alpha[, lambda]]]])` (Jelinek-Mercer interpolated
  *    bigram tier)
  *  - mixture/order: `sample_temperature(source, id_col, strata_col,
  *    target_total[, tau[, seed]])`, `shard_deterministic(source, id_col,
  *    n_shards, seed)`
  *  - featurization: `hash_embed(source, id_col, text_col[, dim[, seed]])`
  *  - eval hygiene: `contamination_report(source, benchmarks, corpus_id_col,
  *    bench_id_col, text_col[, n])`
  *  - semantic + assembly: `semdedup(source, id_col, vec_col, n_lists,
  *    min_sim[, iters[, max_cluster_size]])`, `knn_graph(source, id_col,
  *    vec_col, k, n_lists, n_probe[, iters])`, `strip_boilerplate(source,
  *    id_col, text_col, max_docs)`, `top_tokens(source, text_col, k)`,
  *    `mix_token_budget(source, id_col, domain_col, token_col,
  *    map('dom', budget, …), seed)`, `select_token_budget(source, id_col,
  *    token_col, budget, seed)`
  *  - target-aware selection + retrieval: `dsir_weights(source, target,
  *    id_col, text_col[, num_buckets[, seed[, alpha]]])` / `dsir_select(…,
  *    k[, num_buckets[, seed[, alpha[, noise_seed]]]])` (Xie et al. 2023),
  *    `bm25_topk(corpus, queries, doc_id, text, qid, qtext, k[, k1[, b]])`
  *    (Robertson & Zaragoza 2009), `unimax_allocations(source, strata_col,
  *    token_col, total_budget, max_epochs)` / `unimax_select(source, id,
  *    strata, token_col, total_budget, max_epochs, seed)` (Chung et al.
  *    2022)
  *  - exact score-quantile gates: `filter_top_fraction(source, id, score,
  *    frac[, mode])` / `select_top_k(source, id, score, k[, mode])` (mode
  *    highest|lowest), `exact_rank(source, id, score[, order])` (order
  *    ascending|descending), `quantile_buckets(source, id, score, n_buckets)`
  *  - corpus accounting: `blocklist_filter(source, id, text,
  *    array('t1', …)[, mode])` (mode block|flag — the C4 bad-words step),
  *    `corpus_report(source, text_col, strata_col)` (per-stratum data card)
  *  - `ts_fill_gaps_operator(source, group_col, date_col, value_col, frequency)`
  *    and `ts_fill_forward_operator(source, group_col, date_col, value_col,
  *    target_date, frequency)` — the reference's all-string operator forms
  *    (ts_gaps.cpp:13, ts_fill_forward_operator.cpp:22); target_date takes a
  *    string or TIMESTAMP literal
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the rule handles bare-identifier column args (it runs on the still-
    // unresolved TVF node, before argument resolution can fail) …
    ext.injectResolutionRule(session => new TableMacroRule(session))
    // … while the injected table functions handle all-literal calls, which
    // Spark's builtin ResolveFunctions would otherwise reject with
    // UNRESOLVABLE_TABLE_VALUED_FUNCTION before the rule gets to run
    GraftExtensions.injectFns(ext)
  }
}

object GraftExtensions {
  private[graft] def injectFns(ext: SparkSessionExtensions): Unit =
    TableMacros.allNames.foreach { n =>
      ext.injectTableFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(n),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.sql.TableMacros", n),
        (exprs: Seq[Expression]) =>
          TableMacros.expand(SparkSession.active, TableMacros.canonical(n), exprs)))
    }
}

/** Expands graft table-macro calls during analysis (route 2 above).
  *
  * Pruned on the UNRESOLVED_TABLE_VALUED_FUNCTION tree pattern: the analyzer
  * runs every resolution rule to fixed point on every query, so an unguarded
  * full-tree traversal taxes large plans (e.g. a many-way-union cached
  * corpus) on EVERY analysis pass even when no macro call is present. With
  * the pattern guard the rule is a constant-time bitmap check for the
  * overwhelmingly common macro-free plan. */
class TableMacroRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.trees.TreePattern.UNRESOLVED_TABLE_VALUED_FUNCTION
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUpWithPruning(_.containsPattern(UNRESOLVED_TABLE_VALUED_FUNCTION)) {
      case u: UnresolvedTableValuedFunction
          if u.name.length == 1 && TableMacros.allNames.contains(u.name.head.toLowerCase) =>
        TableMacros.expand(spark,
          TableMacros.canonical(u.name.head.toLowerCase), u.functionArgs)
    }
}

/** The macro catalog and its expansion. The source argument is a table/view
  * name string, resolved through the session catalog — the same contract as
  * the reference's `query_table(source::VARCHAR)`. */
object TableMacros {

  val names: Set[String] = Set(
    "ts_forecast_by", "ts_stats_by", "ts_fill_gaps_by", "ts_backtest_auto_by",
    "ts_forecast", "ts_cv_folds_by", "ts_data_quality_by", "ts_features_by",
    "ts_forecast_inspect_by", "ts_forecast_explain_by",
    "ts_forecast_exog", "ts_forecast_exog_by", "ts_conformal_by",
    "ts_drop_constant_by", "ts_drop_short_by", "ts_fill_nulls_const_by",
    "ts_fill_nulls_forward_by", "ts_fill_nulls_backward_by", "ts_diff_by",
    "ts_detrend_by", "ts_detect_changepoints_by", "ts_mstl_decomposition_by",
    "ts_detect_periods_by",
    "ts_mae_by", "ts_mse_by", "ts_rmse_by", "ts_mape_by", "ts_smape_by",
    "ts_r2_by", "ts_bias_by", "ts_mase_by", "ts_rmae_by", "ts_coverage_by",
    "ts_quantile_loss_by",
    "ts_combine_keys", "ts_split_keys", "ts_aggregate_hierarchy",
    "ts_validate_separator",
    "ts_analyze_seasonality_by", "ts_classify_seasonality_by",
    // all-string operator forms (ts_gaps.cpp:13, ts_fill_forward_operator.cpp:22)
    "ts_fill_gaps_operator", "ts_fill_forward_operator",
    // corpus-curation surface (beyond the reference — the LLM pipeline ops)
    "sample_bernoulli", "sample_stratified", "assign_split",
    "text_normalize", "pii_scrub", "chunk_by_tokens",
    "text_stats", "text_quality_score", "token_count", "language_id",
    "dedup_exact", "dedup_spans", "dedup_paragraphs", "lm_perplexity", "pack_sequences",
    "decontaminate", "decontaminate_spans", "containment_verify", "text_repetition",
    // round 6: cross-corpus dedup, heuristic quality filters, training shard
    // (round 9 adds the exact Bloom gate twin)
    "dedup_against", "dedup_against_bloom", "corpus_diff",
    // round-9 event-timeline surface
    "asof_join", "sessionize", "session_stats", "interval_join",
    // round-9 cardinality sketch surface
    "hll_count", "hll_overlap",
    // round-9 point-frequency sketch surface
    "cm_sketch", "cm_estimate", "tfidf_keywords",
    // round-9 write-layout surface
    "zorder_values",
    // round-9 weighted reservoir sampling
    "sample_weighted_k",
    // round-9 edit-distance record linkage
    "fuzzy_self_join",
    // round-10 additions: quality-aware canonical keep, embedding-space
    // decontamination, trigram stupid-backoff LM, sketch percentile gate
    "dedup_keep_best", "semantic_decontaminate", "semantic_contamination_flags",
    "lm_trigram_perplexity", "percentile_from_sketch",
    "cdc_chunks", "cdc_shared_chunks",
    // round-9 event-analytics rollups
    "funnel", "funnel_counts", "retention",
    "c4_quality_filter", "gopher_quality_filter",
    "shard_deterministic", "hash_embed", "canonicalize_url",
    "contamination_report", "lm_bigram_perplexity", "sample_temperature",
    "extract_domain", "domain_filter", "cap_per_domain",
    // semantic + assembly surface (round 5 batch 16)
    "semdedup", "similarity_join", "knn_graph", "pagerank", "pq_topk",
    "strip_boilerplate", "top_tokens",
    "top_tokens_sketch", "top_tokens_sketch_by",
    "score_quantiles_sketch", "score_quantiles_sketch_by",
    "percentile_by_group", "top_fraction_by_group",
    "assign_split_leakage_safe", "mine_hard_negatives", "cluster_balanced_sample",
    "mmr_rerank",
    "mix_token_budget", "select_token_budget",
    // round 6 batch 19: linear quality gate, partial-overlap decontamination,
    // markup extraction
    "nb_quality_filter", "decontaminate_jaccard", "html_strip",
    "near_dup_images",
    "bpe_train", "bpe_self_encode",
    // round 6 batch 21: target-aware selection + lexical retrieval
    "dsir_weights", "dsir_select", "bm25_topk", "hybrid_topk",
    "unimax_allocations", "unimax_select",
    // round 6 batch 22: exact score-quantile gates + distributed ranking
    "filter_top_fraction", "select_top_k", "exact_rank", "quantile_buckets",
    // round 6 batch 23: corpus accounting
    "blocklist_filter", "corpus_report",
    // round 6: the remaining reference macro names (ts_macros.cpp:2131-2166)
    "ts_stats", "ts_stats_summary", "ts_quality_report",
    "ts_data_quality", "ts_data_quality_summary",
    "ts_drop_zeros_by", "ts_drop_leading_zeros_by", "ts_drop_trailing_zeros_by",
    "ts_drop_edge_zeros_by", "ts_drop_gappy_by",
    "ts_fill_nulls_mean_by", "ts_fill_forward_by",
    "ts_mark_unknown_by", "ts_fill_unknown_by",
    "ts_validate_timestamps_by", "ts_validate_timestamps_summary_by",
    "ts_cv_forecast_by", "ts_cv_split_by", "ts_cv_split_folds_by",
    "ts_cv_split_index_by", "ts_cv_hydrate_by", "ts_check_leakage",
    "ts_conformal_calibrate", "ts_conformal_apply_by", "ts_interval_width_by",
    "ts_detect_peaks_by", "ts_detect_peaks",
    "ts_analyze_peak_timing_by", "ts_analyze_peak_timing",
    "ts_classify_seasonality", "ts_detect_changepoints", "ts_detect_periods",
    "ts_features_table",
    // round 8: reference catalog table functions (ts_features.cpp:160-246,
    // :257-310) — no-arg TVFs over the built-in feature catalog
    "ts_features_list", "ts_features_config_template")

  /** `anofox_fcst_` aliases for every reference macro name — the reference
    * registers each table macro twice (ts_macros.cpp:2186-2196:
    * `anofox_fcst_` + name); the curation/semantic surface is beyond the
    * reference so it gets no alias. */
  val aliases: Set[String] = names.filter(_.startsWith("ts_")).map("anofox_fcst_" + _)
  val allNames: Set[String] = names ++ aliases
  def canonical(n: String): String =
    if (aliases.contains(n)) n.stripPrefix("anofox_fcst_") else n

  def expand(spark: SparkSession, name: String, args: Seq[Expression]): LogicalPlan = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$name: $msg")
    def str(e: Expression, what: String): String = e match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => fail(s"$what must be a string literal, got $other")
    }
    // two-valued mode arguments raise on anything else — a typo'd mode must
    // not silently select the opposite end of a ranking (the foldMetric
    // discipline; mirrors ReportOps.blocklistFilter's require)
    def enumArg(v: String, what: String, first: String, second: String): Boolean =
      if (v == first) true
      else if (v == second) false
      else fail(s"$what must be '$first' or '$second', got '$v'")
    def ident(e: Expression, what: String): String = e match {
      case a: UnresolvedAttribute => a.nameParts.last
      case Literal(s: UTF8String, StringType) => s.toString
      case other => fail(s"$what must be a column identifier, got $other")
    }
    def int(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => fail(s"$what must be an integer literal, got $other")
    }
    def lng(e: Expression, what: String): Long = e match {
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case other => fail(s"$what must be an integer literal, got $other")
    }
    def bool(e: Expression, what: String): Boolean = e match {
      case Literal(v: Boolean, _) => v
      case other => fail(s"$what must be a boolean literal, got $other")
    }
    def dbl(e: Expression, what: String): Double = e match {
      case Literal(v: Double, _) => v
      case Literal(v: Float, _) => v.toDouble
      case Literal(v: Int, _) => v.toDouble
      case Literal(v: Long, _) => v.toDouble
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => fail(s"$what must be a numeric literal, got $other")
    }
    def paramsMap(e: Expression): Map[String, String] = {
      // typed STRUCT param values stringify to the same forms the MAP
      // surface's downstream parsers expect ("7", "0.95", "true")
      def valueStr(v: Expression, what: String): String = v match {
        // struct(7 AS k) reaches here as named_struct('k', 7 AS k) — the
        // analyzer's CreateStruct rewrite keeps the alias on the value
        case a: Alias => valueStr(a.child, what)
        case Literal(s: UTF8String, StringType) => s.toString
        case Literal(i: Int, _) => i.toString
        case Literal(l: Long, _) => l.toString
        case Literal(d: Double, _) => d.toString
        case Literal(f: Float, _) => f.toDouble.toString
        case Literal(b: Boolean, _) => b.toString
        case Literal(dec: org.apache.spark.sql.types.Decimal, _) =>
          dec.toBigDecimal.bigDecimal.toPlainString
        case other => fail(s"$what must be a string/numeric/boolean literal, got $other")
      }
      def entries(kvs: Seq[Expression]): Map[String, String] =
        kvs.grouped(2).map {
          case Seq(k, v) => str(k, "params key") -> valueStr(v, "params value")
          case _ => fail("params map must have an even number of key/value items")
        }.toMap
      // the reference accepts typed STRUCT param objects alongside MAP
      // (ts_forecast_native.cpp:122-264, API_REFERENCE.md:66-78):
      // named_struct('seasonal_period', 7, …) or struct(7 AS seasonal_period)
      def structEntries(args: Seq[Expression]): Map[String, String] =
        args.map {
          case a: Alias => a.name -> valueStr(a.child, s"params field '${a.name}'")
          case other => fail("struct params fields must be aliased " +
            s"(struct(7 AS seasonal_period, …)), got $other")
        }.toMap
      e match {
        case Literal(null, _) => Map.empty
        case f: UnresolvedFunction if f.nameParts.map(_.toLowerCase) == Seq("map") =>
          entries(f.arguments)
        case CreateMap(kvs, _) => entries(kvs)
        case f: UnresolvedFunction
            if f.nameParts.map(_.toLowerCase) == Seq("named_struct") =>
          entries(f.arguments)
        case f: UnresolvedFunction
            if f.nameParts.map(_.toLowerCase) == Seq("struct") =>
          structEntries(f.arguments)
        case ns: CreateNamedStruct => entries(ns.children)
        case other => fail("params must be map('k','v', …), " +
          s"named_struct('k', v, …), or struct(v AS k, …), got $other")
      }
    }
    // map('k', 0.5, …) with numeric values, order-preserving for splits
    def ratesSeq(e: Expression): Seq[(String, Double)] = {
      def entries(kvs: Seq[Expression]): Seq[(String, Double)] =
        kvs.grouped(2).map {
          case Seq(k, v) => str(k, "rates key") -> dbl(v, "rates value")
          case _ => fail("rates map must have an even number of key/value items")
        }.toSeq
      e match {
        case f: UnresolvedFunction if f.nameParts.map(_.toLowerCase) == Seq("map") =>
          entries(f.arguments)
        case CreateMap(kvs, _) => entries(kvs)
        case other => fail(s"rates must be map('k', rate, …), got $other")
      }
    }
    def ratesMap(e: Expression): Map[String, Double] = ratesSeq(e).toMap
    def source(e: Expression) = spark.table(str(e, "source"))
    def strList(e: Expression, what: String): Seq[String] = e match {
      case f: UnresolvedFunction if f.nameParts.map(_.toLowerCase) == Seq("array") =>
        f.arguments.map(a => ident(a, what))
      case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
        items.map(a => ident(a, what))
      case Literal(null, _) => Seq.empty
      case other => fail(s"$what must be array('col', …), got $other")
    }
    def dblList(e: Expression, what: String): Seq[Double] = e match {
      case f: UnresolvedFunction if f.nameParts.map(_.toLowerCase) == Seq("array") =>
        f.arguments.map(a => dbl(a, what))
      case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
        items.map(a => dbl(a, what))
      case other => fail(s"$what must be array(0.5, …), got $other")
    }
    // a timestamp literal: TIMESTAMP '…' (already a TimestampType literal),
    // or a '2024-01-01[ 00:00:00]' string
    def toTs(e: Expression, what: String): java.sql.Timestamp = e match {
      case Literal(micros: Long, _: org.apache.spark.sql.types.TimestampType) =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(micros)
      case Literal(s: UTF8String, StringType) =>
        val raw = s.toString
        java.sql.Timestamp.valueOf(if (raw.length == 10) raw + " 00:00:00" else raw)
      case other => fail(s"$what must be a timestamp or date-string literal, got $other")
    }
    def tsList(e: Expression, what: String): Seq[java.sql.Timestamp] = e match {
      case f: UnresolvedFunction if f.nameParts.map(_.toLowerCase) == Seq("array") =>
        f.arguments.map(toTs(_, what))
      case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
        items.map(toTs(_, what))
      case other => fail(s"$what must be array(timestamp, …), got $other")
    }
    // a date-or-timestamp literal rendered as the string the Scala APIs take
    def dateStr(e: Expression, what: String): String = e match {
      case Literal(micros: Long, _: org.apache.spark.sql.types.TimestampType) =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC).toString
      case Literal(days: Int, _: org.apache.spark.sql.types.DateType) =>
        java.time.LocalDate.ofEpochDay(days.toLong).toString
      case other => str(other, what)
    }
    // the reference's single-series (no group column) macro forms run the
    // grouped operator over one synthetic group and drop it again
    def singleSeries(t: DataFrame)(f: (DataFrame, String) => DataFrame): DataFrame =
      f(t.withColumn("_g", org.apache.spark.sql.functions.lit(1)), "_g").drop("_g")

    val df = (name, args) match {
      case ("ts_forecast_by", Seq(src, g, ds, y, method, horizon, freq, rest @ _*)) =>
        val params = rest match {
          case Seq() => Map.empty[String, String]
          case Seq(p) => paramsMap(p)
          case _ => fail("at most one params map after frequency")
        }
        graft.ops.TsForecastOp.forecastBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "target_col"), str(method, "method"),
          int(horizon, "horizon"), str(freq, "frequency"), params)
      case ("ts_stats_by", Seq(src, g, ds, y, freq)) =>
        graft.ops.TsStatsOp.statsBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"), str(freq, "frequency"))
      // ts_forecast: single-series, no group column (ts_macros.cpp:539)
      case ("ts_forecast", Seq(src, ds, y, method, horizon, rest @ _*)) =>
        val params = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        if (rest.length > 1) fail("too many arguments")
        graft.ops.TsForecastOp.forecastSingle(source(src), ident(ds, "date_col"),
          ident(y, "target_col"), str(method, "method"), int(horizon, "horizon"), params)
      case ("ts_cv_folds_by", Seq(src, g, ds, y, nFolds, horizon, rest @ _*)) =>
        val params = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        if (rest.length > 1) fail("too many arguments")
        graft.ops.TsCvOp.cvFoldsBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "target_col"), int(nFolds, "n_folds"),
          int(horizon, "horizon"), params)
      // n_short and frequency are accepted for signature parity with
      // ts_macros.cpp:1616; the quality kernel derives both from the data
      case ("ts_data_quality_by", Seq(src, g, ds, y, rest @ _*)) if rest.length <= 2 =>
        graft.ops.TsStatsOp.dataQualityBy(source(src), ident(g, "unique_id_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_features_by", Seq(src, g, ds, y)) =>
        graft.ops.TsFeaturesOp.featuresBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_forecast_inspect_by", Seq(src, g, ds, y, method, rest @ _*)) =>
        val params = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        if (rest.length > 1) fail("too many arguments")
        graft.ops.TsForecastOp.forecastInspectBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "target_col"), str(method, "method"), params)
      // hierarchy natives (ts_combine_keys.cpp:213, ts_split_keys.cpp:403,
      // ts_aggregate_hierarchy.cpp:437, ts_validate_separator.cpp:268):
      // columns are POSITIONAL in the input table — (date, value, ids…) for
      // combine/aggregate, (unique_id, date, value) for split — with the
      // separator (and split's columns list) in the params map
      case ("ts_combine_keys", Seq(src, rest @ _*)) if rest.length <= 1 =>
        val t = source(src)
        if (t.columns.length < 3) fail("input needs (date, value, id…) columns")
        val sep = rest.headOption.map(paramsMap).getOrElse(Map.empty)
          .getOrElse("separator", "|")
        graft.ops.Hierarchy.combineKeys(t, t.columns(0), t.columns(1),
          t.columns.drop(2).toSeq, sep)
      case ("ts_aggregate_hierarchy", Seq(src, rest @ _*)) if rest.length <= 1 =>
        val t = source(src)
        if (t.columns.length < 3) fail("input needs (date, value, id…) columns")
        val sep = rest.headOption.map(paramsMap).getOrElse(Map.empty)
          .getOrElse("separator", "|")
        graft.ops.Hierarchy.aggregateHierarchy(t, t.columns(0), t.columns(1),
          t.columns.drop(2).toSeq, sep)
      case ("ts_split_keys", Seq(src, rest @ _*)) if rest.length <= 1 =>
        val t = source(src)
        if (t.columns.length != 3) fail("input must be (unique_id, date, value)")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty)
        val sep = p.getOrElse("separator", "|")
        val names = p.get("columns").map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)
        val nParts = if (names.nonEmpty) names.length else {
          // like the native: count parts in the first non-null unique_id
          val probe = t.select(t.columns(0))
            .filter(org.apache.spark.sql.functions.col(t.columns(0)).isNotNull)
            .limit(1).collect()
          if (probe.isEmpty) 1
          else probe(0).getString(0).split(java.util.regex.Pattern.quote(sep), -1).length
        }
        graft.ops.Hierarchy.splitKeys(t, t.columns(0), nParts, sep, names)
      case ("ts_validate_separator", Seq(src, rest @ _*)) if rest.length <= 1 =>
        val t = source(src)
        val sep = rest.headOption.map(paramsMap).getOrElse(Map.empty)
          .getOrElse("separator", "|")
        graft.ops.Hierarchy.validateSeparator(t, t.columns.toSeq, sep)
      // metric macros (ts_macros.cpp:2017-2127): group cols = everything
      // except the date/value columns; output column named after the metric
      case (m, Seq(src, ds, actual, fc))
          if Set("ts_mae_by", "ts_mse_by", "ts_rmse_by", "ts_mape_by",
            "ts_smape_by", "ts_r2_by", "ts_bias_by").contains(m) =>
        graft.ops.TsMetricsOp.metricBy(source(src), ident(ds, "date_col"),
          ident(actual, "actual_col"), ident(fc, "forecast_col"),
          m.stripPrefix("ts_").stripSuffix("_by"))
      case ("ts_mase_by", Seq(src, ds, actual, fc, baseline)) =>
        graft.ops.TsMetricsOp.maseBy(source(src), ident(ds, "date_col"),
          ident(actual, "actual_col"), ident(fc, "forecast_col"),
          ident(baseline, "baseline_col"))
      case ("ts_rmae_by", Seq(src, ds, actual, p1, p2)) =>
        graft.ops.TsMetricsOp.rmaeBy(source(src), ident(ds, "date_col"),
          ident(actual, "actual_col"), ident(p1, "pred1_col"), ident(p2, "pred2_col"))
      case ("ts_coverage_by", Seq(src, ds, actual, lo, hi)) =>
        graft.ops.TsMetricsOp.coverageBy(source(src), ident(ds, "date_col"),
          ident(actual, "actual_col"), ident(lo, "lower_col"), ident(hi, "upper_col"))
      case ("ts_quantile_loss_by", Seq(src, ds, actual, fc, q)) =>
        graft.ops.TsMetricsOp.quantileLossBy(source(src), ident(ds, "date_col"),
          ident(actual, "actual_col"), ident(fc, "forecast_col"), dbl(q, "quantile"))
      // data-preparation macros (ts_macros.cpp:174-341)
      case ("ts_drop_constant_by", Seq(src, g, y)) =>
        graft.ops.TsPrep.dropConstantBy(source(src), ident(g, "group_col"),
          ident(y, "value_col"))
      case ("ts_drop_short_by", Seq(src, g, minLen)) =>
        graft.ops.TsPrep.dropShortBy(source(src), ident(g, "group_col"),
          int(minLen, "min_length").toLong)
      case ("ts_fill_nulls_const_by", Seq(src, g, ds, y, fill)) =>
        graft.ops.TsPrep.fillNullsConstBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"), dbl(fill, "fill_value"))
      case ("ts_fill_nulls_forward_by", Seq(src, g, ds, y)) =>
        graft.ops.TsPrep.fillNullsForwardBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_fill_nulls_backward_by", Seq(src, g, ds, y)) =>
        graft.ops.TsPrep.fillNullsBackwardBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_diff_by", Seq(src, g, ds, y, order)) =>
        graft.ops.TsPrep.diffBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"), int(order, "diff_order"))
      // decomposition / detection macros (ts_macros.cpp:419-526, :1858)
      case ("ts_detrend_by", Seq(src, g, ds, y, method)) =>
        graft.ops.TsDecompositionOp.detrendBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"), str(method, "method"))
      case ("ts_detect_changepoints_by", Seq(src, g, ds, y, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        graft.ops.TsChangepointOp.detectChangepointsBy(source(src),
          ident(g, "group_col"), ident(ds, "date_col"), ident(y, "value_col"),
          p.get("hazard_lambda").map(_.toDouble).getOrElse(250.0),
          p.get("include_probabilities").forall(_.toBoolean))
      case ("ts_mstl_decomposition_by", Seq(src, g, ds, y, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        val periods = p.get("periods").map(_.split(',').map(_.trim.toInt).toSeq)
          .getOrElse(Seq(7))
        graft.ops.TsDecompositionOp.mstlDecompositionBy(source(src),
          ident(g, "group_col"), ident(ds, "date_col"), ident(y, "value_col"),
          periods, p.getOrElse("insufficient_data", "skip"))
      case ("ts_analyze_seasonality_by", Seq(src, g, ds, y, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        graft.ops.TsDecompositionOp.analyzeSeasonalityBy(source(src),
          ident(g, "group_col"), ident(ds, "date_col"), ident(y, "value_col"),
          p.get("max_period").map(_.toInt))
      case ("ts_classify_seasonality_by", Seq(src, g, ds, y, period)) =>
        graft.ops.TsDecompositionOp.classifySeasonalityBy(source(src),
          ident(g, "group_col"), ident(ds, "date_col"), ident(y, "value_col"),
          int(period, "period"))
      case ("ts_detect_periods_by", Seq(src, g, ds, y, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        graft.ops.TsDecompositionOp.detectPeriodsBy(source(src),
          ident(g, "group_col"), ident(ds, "date_col"), ident(y, "value_col"),
          p.getOrElse("method", "fft"), p.get("max_period").map(_.toInt),
          p.get("min_confidence").map(_.toDouble))
      // ts_conformal_by (ts_macros.cpp:1453): params carries alpha / method
      case ("ts_conformal_by", Seq(src, g, actual, fc, point, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        graft.ops.TsConformalOp.conformalBy(source(src), ident(g, "group_col"),
          ident(actual, "actual_col"), ident(fc, "forecast_col"),
          ident(point, "point_forecast_col"),
          p.get("alpha").map(_.toDouble).getOrElse(0.1),
          p.getOrElse("method", "symmetric"))
      // exog macros (ts_macros.cpp:756, :830): positional up to the
      // reference's named defaults method:='AutoARIMA', horizon:=12, params
      case ("ts_forecast_exog_by",
          Seq(src, g, ds, y, xregs, fsrc, fds, fxregs, freq, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        graft.ops.TsExogOp.forecastExogBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "target_col"), strList(xregs, "xreg_cols"),
          source(fsrc), ident(fds, "future_date_col"),
          strList(fxregs, "future_xreg_cols"),
          rest.headOption.map(str(_, "method")).getOrElse("AutoARIMA"),
          rest.lift(1).map(int(_, "horizon")).getOrElse(12),
          str(freq, "frequency"),
          rest.lift(2).map(paramsMap).getOrElse(Map.empty))
      case ("ts_forecast_exog", Seq(src, ds, y, xregs, fsrc, fds, fxregs, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        graft.ops.TsExogOp.forecastExog(source(src),
          ident(ds, "date_col"), ident(y, "target_col"), strList(xregs, "xreg_cols"),
          source(fsrc), ident(fds, "future_date_col"),
          strList(fxregs, "future_xreg_cols"),
          rest.headOption.map(str(_, "method")).getOrElse("AutoARIMA"),
          rest.lift(1).map(int(_, "horizon")).getOrElse(12),
          params = rest.lift(2).map(paramsMap).getOrElse(Map.empty))
      case ("ts_forecast_explain_by", Seq(src, g, ds, y, method, horizon, rest @ _*)) =>
        val params = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        if (rest.length > 1) fail("too many arguments")
        graft.ops.TsForecastOp.forecastExplainBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "target_col"), str(method, "method"),
          int(horizon, "horizon"), params)
      case ("ts_fill_gaps_by" | "ts_fill_gaps_operator", Seq(src, g, ds, y, freq)) =>
        graft.ops.TsPrep.fillGapsBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"), str(freq, "frequency"))
      case ("ts_fill_forward_operator", Seq(src, g, ds, y, target, freq)) =>
        val targetDate = target match {
          case Literal(micros: Long, _: org.apache.spark.sql.types.TimestampType) =>
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC).toString
          case other => str(other, "target_date")
        }
        graft.ops.TsPrep.fillForwardBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"), targetDate,
          str(freq, "frequency"))
      case ("ts_backtest_auto_by", Seq(src, g, ds, y, horizon, folds, freq, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        val params = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        rest.drop(1).headOption.foreach {
          case Literal(null, _) => ()
          case other => fail("features are not supported in the SQL surface " +
            s"(use the Scala exogenous API), got $other")
        }
        val metric = rest.drop(2).headOption.map(str(_, "metric")).getOrElse("rmse")
        graft.ops.TsCvOp.backtestAutoBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "target_col"), int(horizon, "horizon"),
          int(folds, "folds"), str(freq, "frequency"), params, metric)
      // ---------------- round 6: remaining reference macro names ----------
      // stats / quality (ts_macros.cpp:31, :90, :106, :124, :151)
      case ("ts_stats", Seq(src, g, ds, y, freq)) =>
        graft.ops.TsStatsOp.statsBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"), str(freq, "frequency"))
      case ("ts_stats_summary", Seq(src)) =>
        graft.ops.TsStatsOp.statsSummary(source(src))
      case ("ts_quality_report", Seq(src, minLen)) =>
        graft.ops.TsStatsOp.qualityReport(source(src), int(minLen, "min_length").toLong)
      // n_short and frequency accepted for signature parity (quality kernel
      // derives both from the data), same as ts_data_quality_by
      case ("ts_data_quality", Seq(src, g, ds, y, rest @ _*)) if rest.length <= 2 =>
        graft.ops.TsStatsOp.dataQualityBy(source(src), ident(g, "unique_id_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_data_quality_summary", Seq(src, g, ds, y, rest @ _*)) if rest.length <= 1 =>
        graft.ops.TsStatsOp.dataQualitySummary(source(src), ident(g, "unique_id_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      // drop family (ts_macros.cpp:208-400)
      case ("ts_drop_zeros_by", Seq(src, g, y)) =>
        graft.ops.TsPrep.dropZerosBy(source(src), ident(g, "group_col"),
          ident(y, "value_col"))
      case ("ts_drop_leading_zeros_by", Seq(src, g, ds, y)) =>
        graft.ops.TsPrep.dropLeadingZerosBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_drop_trailing_zeros_by", Seq(src, g, ds, y)) =>
        graft.ops.TsPrep.dropTrailingZerosBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_drop_edge_zeros_by", Seq(src, g, ds, y)) =>
        graft.ops.TsPrep.dropEdgeZerosBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_drop_gappy_by", Seq(src, g, y, ratio)) =>
        graft.ops.TsPrep.dropGappyBy(source(src), ident(g, "group_col"),
          ident(y, "value_col"), dbl(ratio, "max_gap_ratio"))
      // fills / unknown-horizon (ts_macros.cpp:306, :369, :944, :979)
      case ("ts_fill_nulls_mean_by", Seq(src, g, ds, y)) =>
        graft.ops.TsPrep.fillNullsMeanBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"))
      case ("ts_fill_forward_by", Seq(src, g, ds, y, target, freq)) =>
        graft.ops.TsPrep.fillForwardBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"),
          dateStr(target, "target_date"), str(freq, "frequency"))
      case ("ts_mark_unknown_by", Seq(src, g, ds, cutoff)) =>
        graft.ops.TsPrep.markUnknownBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), dateStr(cutoff, "cutoff_date"))
      case ("ts_fill_unknown_by", Seq(src, g, ds, y, cutoff, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        graft.ops.TsPrep.fillUnknownBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"), dateStr(cutoff, "cutoff_date"),
          p.getOrElse("strategy", "last_value"),
          p.get("fill_value").map(_.toDouble).getOrElse(0.0))
      case ("ts_validate_timestamps_by", Seq(src, g, ds, expected)) =>
        graft.ops.TsPrep.validateTimestampsBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), tsList(expected, "expected_timestamps"))
      case ("ts_validate_timestamps_summary_by", Seq(src, g, ds, expected)) =>
        graft.ops.TsPrep.validateTimestampsSummaryBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), tsList(expected, "expected_timestamps"))
      // cv family (ts_macros.cpp:731, :1121, :1203, :1223, :1319, :1409)
      case ("ts_cv_forecast_by", Seq(src, g, ds, y, method, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.TsCvOp.cvForecastBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "target_col"), str(method, "method"),
          rest.headOption.map(paramsMap).getOrElse(Map.empty))
      case ("ts_cv_split_by", Seq(src, g, ds, y, ends, horizon, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.TsCvOp.cvSplitBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "target_col"),
          tsList(ends, "training_end_times"), int(horizon, "horizon"),
          rest.headOption.map(paramsMap).getOrElse(Map.empty))
      // frequency accepted for signature parity (position-based fold
      // arithmetic needs no calendar)
      case ("ts_cv_split_folds_by", Seq(src, g, ds, ends, horizon, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        val t = source(src).withColumn("_y",
          org.apache.spark.sql.functions.lit(0))
        graft.ops.TsCvOp.cvSplitFoldsBy(t, ident(g, "group_col"),
          ident(ds, "date_col"), "_y", tsList(ends, "training_end_times"),
          int(horizon, "horizon"),
          rest.lift(1).map(paramsMap).getOrElse(Map.empty))
      case ("ts_cv_split_index_by", Seq(src, g, ds, ends, horizon, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.ops.TsCvOp.cvSplitIndexBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), tsList(ends, "training_end_times"),
          int(horizon, "horizon"),
          rest.lift(1).map(paramsMap).getOrElse(Map.empty))
      case ("ts_cv_hydrate_by", Seq(folds, src, g, ds, unknown, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.TsCvOp.cvHydrateBy(source(folds), source(src),
          ident(g, "group_col"), ident(ds, "date_col"),
          strList(unknown, "unknown_features"))
      case ("ts_check_leakage", Seq(src, isTest, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        graft.ops.TsCvOp.checkLeakage(source(src),
          p.getOrElse("group_col", "unique_id"), p.getOrElse("date_col", "date"),
          ident(isTest, "is_test_col"))
      // conformal helpers (ts_macros.cpp:1516, :1543, :1569)
      case ("ts_conformal_calibrate", Seq(src, actual, fc, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        graft.ops.TsConformalOp.conformalCalibrate(source(src),
          ident(actual, "actual_col"), ident(fc, "forecast_col"),
          p.get("alpha").map(_.toDouble).getOrElse(0.1))
      case ("ts_conformal_apply_by", Seq(src, g, fc, score)) =>
        graft.ops.TsConformalOp.conformalApplyBy(source(src), ident(g, "group_col"),
          ident(fc, "forecast_col"), dbl(score, "conformity_score"))
      case ("ts_interval_width_by", Seq(src, g, lo, hi)) =>
        graft.ops.TsConformalOp.intervalWidthBy(source(src), ident(g, "group_col"),
          ident(lo, "lower_col"), ident(hi, "upper_col"))
      // peaks (ts_macros.cpp:1890-1973)
      case ("ts_detect_peaks_by", Seq(src, g, ds, y, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        graft.ops.TsDecompositionOp.detectPeaksBy(source(src), ident(g, "group_col"),
          ident(ds, "date_col"), ident(y, "value_col"),
          p.get("min_distance").map(_.toDouble), p.get("min_prominence").map(_.toDouble))
      case ("ts_detect_peaks", Seq(src, ds, y, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        singleSeries(source(src))((t, gc) =>
          graft.ops.TsDecompositionOp.detectPeaksBy(t, gc, ident(ds, "date_col"),
            ident(y, "value_col"), p.get("min_distance").map(_.toDouble),
            p.get("min_prominence").map(_.toDouble)))
      case ("ts_analyze_peak_timing_by", Seq(src, g, ds, y, period, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.TsDecompositionOp.analyzePeakTimingBy(source(src),
          ident(g, "group_col"), ident(ds, "date_col"), ident(y, "value_col"),
          dbl(period, "period"))
      case ("ts_analyze_peak_timing", Seq(src, ds, y, period, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        singleSeries(source(src))((t, gc) =>
          graft.ops.TsDecompositionOp.analyzePeakTimingBy(t, gc,
            ident(ds, "date_col"), ident(y, "value_col"), dbl(period, "period")))
      // single-series forms of grouped detectors (ts_macros.cpp:489, :1644,
      // :1790, :1824)
      case ("ts_classify_seasonality", Seq(src, ds, y, period)) =>
        singleSeries(source(src))((t, gc) =>
          graft.ops.TsDecompositionOp.classifySeasonalityBy(t, gc,
            ident(ds, "date_col"), ident(y, "value_col"), int(period, "period")))
      case ("ts_detect_changepoints", Seq(src, ds, y, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        singleSeries(source(src))((t, gc) =>
          graft.ops.TsChangepointOp.detectChangepointsBy(t, gc,
            ident(ds, "date_col"), ident(y, "value_col"),
            p.get("hazard_lambda").map(_.toDouble).getOrElse(250.0),
            p.get("include_probabilities").forall(_.toBoolean)))
      case ("ts_detect_periods", Seq(src, ds, y, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(paramsMap).getOrElse(Map.empty[String, String])
        singleSeries(source(src))((t, gc) =>
          graft.ops.TsDecompositionOp.detectPeriodsBy(t, gc, ident(ds, "date_col"),
            ident(y, "value_col"), p.getOrElse("method", "fft"),
            p.get("max_period").map(_.toInt), p.get("min_confidence").map(_.toDouble)))
      case ("ts_features_table", Seq(src, ds, y)) =>
        singleSeries(source(src))((t, gc) =>
          graft.ops.TsFeaturesOp.featuresBy(t, gc, ident(ds, "date_col"),
            ident(y, "value_col")))
      case ("ts_features_list", Seq()) =>
        graft.ops.TsFeaturesOp.featuresList(spark)
      case ("ts_features_config_template", Seq()) =>
        graft.ops.TsFeaturesOp.configTemplate(spark)
      // ------------------------------------------ corpus-curation macros
      case ("sample_bernoulli", Seq(src, id, rate, seed)) =>
        graft.llm.SampleOps.sampleBernoulli(source(src), ident(id, "id_col"),
          dbl(rate, "rate"), dbl(seed, "seed").toLong)
      case ("sample_stratified", Seq(src, id, strata, rates, defRate, seed)) =>
        graft.llm.SampleOps.sampleStratified(source(src), ident(id, "id_col"),
          ident(strata, "strata_col"), ratesMap(rates), dbl(defRate, "default_rate"),
          dbl(seed, "seed").toLong)
      case ("assign_split", Seq(src, id, weights, seed)) =>
        graft.llm.SampleOps.assignSplit(source(src), ident(id, "id_col"),
          ratesSeq(weights), dbl(seed, "seed").toLong)
      case ("text_normalize", Seq(src, text)) =>
        graft.llm.TextOps.textNormalize(source(src), ident(text, "text_col"))
      case ("pii_scrub", Seq(src, text)) =>
        graft.llm.TextOps.piiScrub(source(src), ident(text, "text_col"))
      case ("chunk_by_tokens", Seq(src, id, text, maxTok, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.chunkByTokens(source(src), ident(id, "id_col"),
          ident(text, "text_col"), int(maxTok, "max_tokens"),
          rest.headOption.map(int(_, "overlap")).getOrElse(0))
      case ("text_stats", Seq(src, text)) =>
        graft.llm.TextOps.textStats(source(src), ident(text, "text_col"))
      case ("text_quality_score", Seq(src, text)) =>
        graft.llm.TextOps.qualityScore(source(src), ident(text, "text_col"))
      case ("token_count", Seq(src, text)) =>
        graft.llm.TextOps.tokenCount(source(src), ident(text, "text_col"))
      case ("language_id", Seq(src, text)) =>
        graft.llm.TextOps.languageId(source(src), ident(text, "text_col"))
      case ("dedup_exact", Seq(src, id, keys)) =>
        graft.llm.TextOps.dedupExact(source(src), strList(keys, "key_cols"),
          ident(id, "id_col"))
      case ("dedup_spans", Seq(src, id, text, gramLen)) =>
        graft.llm.TextOps.removeDuplicatedSpans(source(src), ident(id, "id_col"),
          ident(text, "text_col"), int(gramLen, "gram_len"))
      case ("dedup_paragraphs", Seq(src, id, text, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.dedupParagraphs(source(src), ident(id, "id_col"),
          ident(text, "text_col"),
          rest.headOption.map(int(_, "min_chars")).getOrElse(1))
      case ("lm_perplexity", Seq(src, id, text, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.TextOps.lmPerplexity(source(src), ident(id, "id_col"),
          ident(text, "text_col"),
          rest.headOption.map(int(_, "vocab_size")).getOrElse(65536),
          rest.lift(1).map(dbl(_, "alpha")).getOrElse(0.5))
      case ("text_repetition", Seq(src, text)) =>
        graft.llm.TextOps.repetitionStats(source(src), ident(text, "text_col"))
      case ("near_dup_images", Seq(src, id, bin, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        graft.llm.MultimodalOps.nearDupImages(source(src), ident(id, "id_col"),
          ident(bin, "bin_col"),
          rest.headOption.map(int(_, "max_dist")).getOrElse(3),
          rest.lift(1).map(int(_, "bands")).getOrElse(4),
          rest.lift(2).map(int(_, "max_bucket_size")).getOrElse(1000))
      case ("funnel", Seq(src, key, ts, step, stepsArg, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.CohortOps.funnel(source(src), Seq(ident(key, "key_col")),
          ident(ts, "ts_col"), ident(step, "step_col"),
          strList(stepsArg, "steps"),
          rest.headOption.map(lng(_, "window_us")))
      case ("funnel_counts", Seq(src, key, ts, step, stepsArg, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.CohortOps.funnelCounts(source(src), Seq(ident(key, "key_col")),
          ident(ts, "ts_col"), ident(step, "step_col"),
          strList(stepsArg, "steps"),
          rest.headOption.map(lng(_, "window_us")))
      case ("retention", Seq(src, key, ts, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.CohortOps.retention(source(src), Seq(ident(key, "key_col")),
          ident(ts, "ts_col"),
          rest.headOption.map(int(_, "max_offset_days")).getOrElse(30))
      case ("fuzzy_self_join", Seq(src, id, s, dArg, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.FuzzyJoinOps.fuzzySelfJoin(source(src), ident(id, "id_col"),
          ident(s, "str_col"), int(dArg, "max_dist"),
          rest.headOption.map(int(_, "q")).getOrElse(3))
      case ("sample_weighted_k", Seq(src, id, w, kArg, seedArg, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.SampleOps.weightedSampleK(source(src), ident(id, "id_col"),
          ident(w, "weight_col"), int(kArg, "k"), lng(seedArg, "seed"),
          rest.headOption.map(ident(_, "group_col")).toSeq)
      case ("hll_overlap", Seq(srcA, srcB, v, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val p = rest.headOption.map(int(_, "p")).getOrElse(12)
        val vc = ident(v, "value_col")
        def sk(e: Expression) = graft.llm.CardinalityOps
          .hllCountBy(source(e), Seq.empty, vc, p).select("regs")
        graft.llm.CardinalityOps.overlapEstimate(sk(srcA), sk(srcB), Seq.empty, p)
      case ("hll_count", Seq(src, g, v, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.CardinalityOps.hllCountBy(source(src),
          Seq(ident(g, "group_col")), ident(v, "value_col"),
          rest.headOption.map(int(_, "p")).getOrElse(12))
          .drop("regs")
      case ("tfidf_keywords", Seq(src, id, text, k, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.FrequencyOps.tfidfKeywords(source(src), ident(id, "id_col"),
          ident(text, "text_col"), int(k, "k"),
          d = rest.headOption.map(int(_, "d")).getOrElse(4),
          w = rest.lift(1).map(int(_, "w")).getOrElse(1024))
      case ("zorder_values", Seq(src, c1, c2, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.LayoutOps.zorderValue(source(src),
          Seq(ident(c1, "col1"), ident(c2, "col2")),
          bits = rest.headOption.map(int(_, "bits")).getOrElse(8))
      case ("cm_sketch", Seq(src, text, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.FrequencyOps.cmSketch(source(src), ident(text, "text_col"),
          d = rest.headOption.map(int(_, "d")).getOrElse(4),
          w = rest.lift(1).map(int(_, "w")).getOrElse(1024))
      case ("cm_estimate", Seq(ssrc, psrc, term, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.FrequencyOps.cmEstimate(source(ssrc), source(psrc),
          ident(term, "term_col"),
          d = rest.headOption.map(int(_, "d")).getOrElse(4),
          w = rest.lift(1).map(int(_, "w")).getOrElse(1024))
      case ("interval_join", Seq(p, iv, key, pts, sCol, eCol, bArg)) =>
        graft.ops.IntervalJoinOp.intervalJoin(source(p), source(iv),
          Seq(ident(key, "key_col")), ident(pts, "point_ts_col"),
          ident(sCol, "start_col"), ident(eCol, "end_col"),
          lng(bArg, "bucket_us"))
      case ("asof_join", Seq(l, r, key, lts, rts, v, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        graft.ops.AsofJoinOp.asofJoin(source(l), source(r),
          Seq(ident(key, "key_col")),
          ident(lts, "left_ts_col"), ident(rts, "right_ts_col"),
          Seq(ident(v, "value_col")),
          direction = rest.headOption.map(str(_, "direction")).getOrElse("backward"),
          strict = rest.lift(1).exists(bool(_, "strict")),
          toleranceMicros = rest.lift(2).map(lng(_, "tolerance_us")))
      case ("sessionize", Seq(src, key, ts, gap)) =>
        graft.ops.SessionOps.sessionize(source(src), Seq(ident(key, "key_col")),
          ident(ts, "ts_col"), lng(gap, "gap_us"))
      case ("session_stats", Seq(src, key, ts, gap, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.SessionOps.sessionStats(source(src), Seq(ident(key, "key_col")),
          ident(ts, "ts_col"), lng(gap, "gap_us"),
          rest.headOption.map(ident(_, "value_col")))
      case ("corpus_diff", Seq(oldSrc, newSrc, id, text, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.ReportOps.corpusDiff(source(oldSrc), source(newSrc),
          ident(id, "id_col"), ident(text, "text_col"),
          includeUnchanged = rest.headOption.exists(bool(_, "include_unchanged")))
      case ("dedup_against_bloom", Seq(src, ref, id, text, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        graft.llm.BloomOps.dedupAgainstCorpusExact(source(src), source(ref),
          ident(id, "id_col"), ident(text, "text_col"),
          rest.headOption.map(int(_, "m_bits")).getOrElse(1 << 24).toLong,
          rest.lift(1).map(int(_, "k")).getOrElse(7),
          rest.lift(2).map(int(_, "seed")).getOrElse(0).toLong)
      case ("dedup_against", Seq(src, ref, id, text, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.dedupAgainstCorpus(source(src), source(ref),
          ident(id, "id_col"), ident(text, "text_col"),
          threshold = rest.headOption.map(dbl(_, "threshold")).getOrElse(0.8))
      case ("c4_quality_filter", Seq(src, text)) =>
        graft.llm.TextOps.c4QualityFilter(source(src), ident(text, "text_col"))
      case ("gopher_quality_filter", Seq(src, text)) =>
        graft.llm.TextOps.gopherQualityFilter(source(src), ident(text, "text_col"))
      case ("shard_deterministic", Seq(src, id, nShards, seed)) =>
        graft.llm.MixOps.deterministicShard(source(src), ident(id, "id_col"),
          int(nShards, "n_shards"), int(seed, "seed").toLong)
      case ("hash_embed", Seq(src, id, text, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.TextOps.hashEmbed(source(src), ident(id, "id_col"),
          ident(text, "text_col"),
          rest.headOption.map(int(_, "dim")).getOrElse(64),
          rest.lift(1).map(int(_, "seed")).getOrElse(0).toLong)
      case ("canonicalize_url", Seq(src, url)) =>
        graft.llm.DomainOps.canonicalizeUrl(source(src), ident(url, "url_col"))
      case ("sample_temperature", Seq(src, id, strata, target, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.SampleOps.temperatureSample(source(src), ident(id, "id_col"),
          ident(strata, "strata_col"), int(target, "target_total").toLong,
          rest.headOption.map(dbl(_, "tau")).getOrElse(2.0),
          rest.lift(1).map(int(_, "seed")).getOrElse(0).toLong)
      case ("lm_bigram_perplexity", Seq(src, id, text, rest @ _*)) =>
        if (rest.length > 4) fail("too many arguments")
        graft.llm.TextOps.bigramPerplexity(source(src), ident(id, "id_col"),
          ident(text, "text_col"),
          rest.headOption.map(int(_, "vocab_size")).getOrElse(65536),
          rest.lift(1).map(int(_, "bigram_vocab_size")).getOrElse(1 << 20),
          rest.lift(2).map(dbl(_, "alpha")).getOrElse(0.5),
          rest.lift(3).map(dbl(_, "lambda")).getOrElse(0.75))
      case ("contamination_report", Seq(src, bench, cid, bid, text, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.contaminationReport(source(src), source(bench),
          ident(cid, "corpus_id_col"), ident(bid, "bench_id_col"),
          ident(text, "text_col"),
          rest.headOption.map(int(_, "n")).getOrElse(13))
      case ("pack_sequences", Seq(src, id, ord, toks, budget, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.packSequences(source(src), ident(id, "id_col"),
          ident(ord, "order_col"), ident(toks, "tokens_col"), int(budget, "budget"),
          rest.headOption.map(int(_, "n_buckets")).getOrElse(1024))
      case ("decontaminate", Seq(src, bench, id, text, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.contaminatedIds(source(src), source(bench),
          ident(id, "id_col"), ident(text, "text_col"),
          rest.headOption.map(int(_, "n")).getOrElse(13))
      case ("containment_verify", Seq(psrc, dsrc, id, text, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.TextOps.containmentVerify(source(psrc), source(dsrc),
          ident(id, "id_col"), ident(text, "text_col"),
          rest.headOption.map(int(_, "shingle_size")).getOrElse(5),
          rest.lift(1).map(dbl(_, "threshold")).getOrElse(0.8))
      case ("decontaminate_spans", Seq(src, bench, id, text, btext, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.decontaminateSpans(source(src), source(bench),
          ident(id, "id_col"), ident(text, "text_col"),
          ident(btext, "bench_text_col"),
          rest.headOption.map(int(_, "n")).getOrElse(13))
      // domain-level curation (DomainOps)
      case ("extract_domain", Seq(src, url)) =>
        graft.llm.DomainOps.extractDomain(source(src), ident(url, "url_col"))
      case ("domain_filter", Seq(src, id, domain, list, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val entries = list match {
          case f: UnresolvedFunction if f.nameParts.map(_.toLowerCase) == Seq("array") =>
            f.arguments.map(a => str(a, "domain entry"))
          case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
            items.map(a => str(a, "domain entry"))
          case other => fail(s"domains must be array('d1', …), got $other")
        }
        val domains = spark.createDataset(entries)(
          org.apache.spark.sql.Encoders.STRING).toDF("domain")
        graft.llm.DomainOps.filterByDomainList(source(src), ident(id, "id_col"),
          ident(domain, "domain_col"), domains,
          rest.headOption.map(str(_, "mode")).getOrElse("block"))
      case ("cap_per_domain", Seq(src, id, domain, cap, seed)) =>
        graft.llm.DomainOps.capPerDomain(source(src), ident(id, "id_col"),
          ident(domain, "domain_col"), int(cap, "cap"), dbl(seed, "seed").toLong)
      // semantic + assembly surface (SimilarityOps / TextOps / MixOps)
      case ("semdedup", Seq(src, id, vec, nLists, minSim, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.SimilarityOps.semDedup(source(src), ident(id, "id_col"),
          ident(vec, "vec_col"), int(nLists, "n_lists"), dbl(minSim, "min_sim"),
          rest.headOption.map(int(_, "iters")).getOrElse(2),
          rest.lift(1).map(int(_, "max_cluster_size")).getOrElse(1000))
      case ("similarity_join", Seq(asrc, bsrc, id, vec, nLists, minSim, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.SimilarityOps.similarityJoin(source(asrc), source(bsrc),
          ident(id, "id_col"), ident(vec, "vec_col"),
          graft.llm.SimilarityOps.ivfTrain(source(asrc), ident(id, "id_col"),
            ident(vec, "vec_col"), int(nLists, "n_lists"),
            rest.lift(1).map(int(_, "iters")).getOrElse(2)),
          dbl(minSim, "min_sim"),
          nProbe = rest.headOption.map(int(_, "n_probe")).getOrElse(4))
      case ("pagerank", Seq(src, sArg, dArg, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.ops.GraphOps.pageRank(source(src), ident(sArg, "src_col"),
          ident(dArg, "dst_col"),
          iters = rest.headOption.map(int(_, "iters")).getOrElse(10))
      case ("knn_graph", Seq(src, id, vec, k, nLists, nProbe, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.SimilarityOps.knnGraph(source(src), ident(id, "id_col"),
          ident(vec, "vec_col"), int(k, "k"), int(nLists, "n_lists"),
          int(nProbe, "n_probe"), rest.headOption.map(int(_, "iters")).getOrElse(2))
      case ("pq_topk", Seq(src, qsrc, id, vec, m, nCodes, k, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val corpus = source(src)
        val pqModel = graft.llm.PqOps.pqTrain(corpus, ident(id, "id_col"),
          ident(vec, "vec_col"), int(m, "m"), int(nCodes, "n_codes"),
          rest.headOption.map(int(_, "iters")).getOrElse(2))
        graft.llm.PqOps.pqTopK(corpus, source(qsrc), pqModel,
          ident(id, "id_col"), ident(vec, "vec_col"), int(k, "k"))
      case ("strip_boilerplate", Seq(src, id, text, maxDocs)) =>
        graft.llm.TextOps.removeBoilerplateLines(source(src), ident(id, "id_col"),
          ident(text, "text_col"), int(maxDocs, "max_docs"))
      case ("top_tokens", Seq(src, text, k)) =>
        graft.llm.TextOps.topTokens(source(src), ident(text, "text_col"), int(k, "k"))
      case ("top_tokens_sketch", Seq(src, text, k, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.topTokensSketch(source(src), ident(text, "text_col"),
          int(k, "k"), rest.headOption.map(int(_, "capacity")).getOrElse(4096))
      case ("top_tokens_sketch_by", Seq(src, group, text, k, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.TextOps.topTokensSketchBy(source(src), ident(group, "group_col"),
          ident(text, "text_col"), int(k, "k"),
          rest.headOption.map(int(_, "capacity")).getOrElse(4096))
      case ("percentile_by_group", Seq(src, g, id, score)) =>
        graft.llm.QuantileOps.percentileByGroup(source(src),
          ident(g, "group_col"), ident(id, "id_col"), ident(score, "score_col"))
      case ("mmr_rerank", Seq(csrc, vsrc, qid, vid, rel, id, vec, k, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.SimilarityOps.mmrRerank(source(csrc), source(vsrc),
          ident(qid, "qid_col"), ident(vid, "vid_col"), ident(rel, "rel_col"),
          ident(id, "id_col"), ident(vec, "vec_col"), int(k, "k"),
          lambda = rest.headOption.map(dbl(_, "lambda")).getOrElse(0.7))
      case ("dedup_keep_best", Seq(src, pairs, id, score, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.TextOps.dedupKeepBest(source(src), ident(id, "id_col"),
          ident(score, "score_col"), source(pairs),
          idA = rest.headOption.map(ident(_, "id_a_col")).getOrElse("id_a"),
          idB = rest.lift(1).map(ident(_, "id_b_col")).getOrElse("id_b"))
      case ("semantic_decontaminate", Seq(csrc, bsrc, cents, id, vec, ms, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.SimilarityOps.semanticDecontaminate(source(csrc),
          ident(id, "id_col"), ident(vec, "vec_col"), source(bsrc),
          source(cents), dbl(ms, "min_sim"),
          rest.headOption.map(int(_, "n_probe")).getOrElse(4))
      case ("semantic_contamination_flags", Seq(csrc, bsrc, cents, id, vec, ms, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.SimilarityOps.semanticContaminationFlags(source(csrc),
          ident(id, "id_col"), ident(vec, "vec_col"), source(bsrc),
          source(cents), dbl(ms, "min_sim"),
          rest.headOption.map(int(_, "n_probe")).getOrElse(4))
      case ("lm_trigram_perplexity", Seq(src, id, text, rest @ _*)) =>
        if (rest.length > 5) fail("too many arguments")
        graft.llm.TextOps.trigramPerplexity(source(src), ident(id, "id_col"),
          ident(text, "text_col"),
          vocabSize = rest.headOption.map(int(_, "vocab_size")).getOrElse(65536),
          bigramVocabSize = rest.lift(1).map(int(_, "bigram_vocab_size")).getOrElse(1 << 20),
          trigramVocabSize = rest.lift(2).map(int(_, "trigram_vocab_size")).getOrElse(1 << 22),
          alpha = rest.lift(3).map(dbl(_, "alpha")).getOrElse(0.5),
          backoff = rest.lift(4).map(dbl(_, "backoff")).getOrElse(0.4))
      case ("percentile_from_sketch", Seq(src, sksrc, score)) =>
        graft.llm.QuantileOps.percentileFromSummary(source(src),
          ident(score, "score_col"), source(sksrc))
      case ("cdc_chunks", Seq(src, id, text, rest @ _*)) =>
        if (rest.length > 5) fail("too many arguments")
        graft.llm.TextOps.chunkContentDefined(source(src), ident(id, "id_col"),
          ident(text, "text_col"),
          window = rest.headOption.map(int(_, "window")).getOrElse(8),
          avgBits = rest.lift(1).map(int(_, "avg_bits")).getOrElse(8),
          minLen = rest.lift(2).map(int(_, "min_len")).getOrElse(32),
          maxLen = rest.lift(3).map(int(_, "max_len")).getOrElse(512),
          seed = rest.lift(4).map(lng(_, "seed")).getOrElse(7L))
      case ("cdc_shared_chunks", Seq(src, id, text, minDocs, rest @ _*)) =>
        if (rest.length > 5) fail("too many arguments")
        graft.llm.TextOps.cdcSharedChunks(source(src), ident(id, "id_col"),
          ident(text, "text_col"), int(minDocs, "min_docs"),
          window = rest.headOption.map(int(_, "window")).getOrElse(8),
          avgBits = rest.lift(1).map(int(_, "avg_bits")).getOrElse(8),
          minLen = rest.lift(2).map(int(_, "min_len")).getOrElse(32),
          maxLen = rest.lift(3).map(int(_, "max_len")).getOrElse(512),
          seed = rest.lift(4).map(lng(_, "seed")).getOrElse(7L))
      case ("top_fraction_by_group", Seq(src, g, id, score, frac)) =>
        graft.llm.QuantileOps.filterTopFractionByGroup(source(src),
          ident(g, "group_col"), ident(id, "id_col"), ident(score, "score_col"),
          dbl(frac, "frac"))
      case ("score_quantiles_sketch", Seq(src, score, qsE, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.QuantileOps.scoreQuantilesSketch(source(src),
          ident(score, "score_col"), dblList(qsE, "qs"),
          rest.headOption.map(int(_, "capacity")).getOrElse(16384))
      case ("score_quantiles_sketch_by", Seq(src, group, score, qsE, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.QuantileOps.scoreQuantilesSketchBy(source(src),
          ident(group, "group_col"), ident(score, "score_col"),
          dblList(qsE, "qs"),
          rest.headOption.map(int(_, "capacity")).getOrElse(16384))
      case ("assign_split_leakage_safe", Seq(src, pairs, id, weights, seed, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.SampleOps.assignSplitLeakageSafe(source(src),
          ident(id, "id_col"), source(pairs), ratesSeq(weights),
          dbl(seed, "seed").toLong,
          idA = rest.headOption.map(ident(_, "id_a_col")).getOrElse("id_a"),
          idB = rest.lift(1).map(ident(_, "id_b_col")).getOrElse("id_b"))
      case ("mine_hard_negatives", Seq(corpus, qsrc, psrc, id, vec, k, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        graft.llm.SimilarityOps.mineHardNegatives(source(corpus), source(qsrc),
          source(psrc), ident(id, "id_col"), ident(vec, "vec_col"), int(k, "k"),
          rest.headOption.map(ident(_, "qid_col")).getOrElse("qid"),
          rest.lift(1).map(ident(_, "vid_col")).getOrElse("vid"),
          rest.lift(2).forall(bool(_, "exclude_self")))
      case ("cluster_balanced_sample", Seq(src, cents, id, vec, target, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.SimilarityOps.clusterBalancedSample(source(src),
          ident(id, "id_col"), ident(vec, "vec_col"), source(cents),
          int(target, "target_total").toLong,
          rest.headOption.map(dbl(_, "tau")).getOrElse(2.0),
          rest.lift(1).map(int(_, "seed")).getOrElse(0).toLong)
      case ("mix_token_budget", Seq(src, id, domain, toks, budgets, seed)) =>
        graft.llm.MixOps.selectPerDomainBudget(source(src), ident(id, "id_col"),
          ident(domain, "domain_col"), ident(toks, "token_col"),
          ratesMap(budgets).map { case (k, v) => k -> v.toLong },
          dbl(seed, "seed").toLong)
      case ("select_token_budget", Seq(src, id, toks, budget, seed)) =>
        graft.llm.MixOps.selectToTokenBudget(source(src), ident(id, "id_col"),
          ident(toks, "token_col"), dbl(budget, "budget").toLong,
          dbl(seed, "seed").toLong)
      case ("nb_quality_filter", Seq(src, id, text, lab, labText, labCol, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        graft.llm.ClassifierOps.nbQualityFilter(source(src), ident(id, "id_col"),
          ident(text, "text_col"), source(lab), ident(labText, "labeled_text_col"),
          ident(labCol, "label_col"),
          rest.headOption.map(int(_, "num_buckets")).getOrElse(1 << 20),
          rest.lift(1).map(dbl(_, "alpha")).getOrElse(0.5),
          rest.lift(2).map(int(_, "seed")).getOrElse(0).toLong)
      case ("decontaminate_jaccard", Seq(src, bench, cid, bid, text, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.TextOps.jaccardContamination(source(src), source(bench),
          ident(cid, "corpus_id_col"), ident(bid, "bench_id_col"),
          ident(text, "text_col"),
          rest.headOption.map(int(_, "n")).getOrElse(13),
          rest.lift(1).map(dbl(_, "threshold")).getOrElse(0.8))
      case ("html_strip", Seq(src, text)) =>
        graft.llm.TextOps.htmlStrip(source(src), ident(text, "text_col"))
      case ("bpe_train", Seq(src, text, nMerges, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        // the production trainer (one Spark job; parity-pinned equal to the
        // SQL-replay loop), so SQL callers get real merge counts for free
        graft.llm.BpeOps.mergesToDf(spark,
          graft.llm.BpeOps.bpeTrainLocal(source(src), ident(text, "text_col"),
            int(nMerges, "num_merges"),
            rest.headOption.map(int(_, "min_pair_freq")).getOrElse(2).toLong))
      case ("dsir_weights", Seq(src, tgt, id, text, rest @ _*)) =>
        if (rest.length > 3) fail("too many arguments")
        graft.llm.DsirOps.dsirWeights(source(src), source(tgt),
          ident(id, "id_col"), ident(text, "text_col"),
          numBuckets = rest.headOption.map(int(_, "num_buckets")).getOrElse(65536),
          seed = rest.lift(1).map(int(_, "seed")).getOrElse(0).toLong,
          alpha = rest.lift(2).map(dbl(_, "alpha")).getOrElse(0.5))
      case ("dsir_select", Seq(src, tgt, id, text, k, rest @ _*)) =>
        if (rest.length > 4) fail("too many arguments")
        graft.llm.DsirOps.dsirSelect(source(src), source(tgt),
          ident(id, "id_col"), ident(text, "text_col"), int(k, "k"),
          numBuckets = rest.headOption.map(int(_, "num_buckets")).getOrElse(65536),
          seed = rest.lift(1).map(int(_, "seed")).getOrElse(0).toLong,
          alpha = rest.lift(2).map(dbl(_, "alpha")).getOrElse(0.5),
          noiseSeed = rest.lift(3).map(int(_, "noise_seed")).getOrElse(1).toLong)
      case ("bm25_topk", Seq(src, qsrc, id, text, qid, qtext, k, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.RetrievalOps.bm25TopK(source(src), ident(id, "doc_id_col"),
          ident(text, "text_col"), source(qsrc), ident(qid, "qid_col"),
          ident(qtext, "query_text_col"), int(k, "k"),
          k1 = rest.headOption.map(dbl(_, "k1")).getOrElse(1.2),
          b = rest.lift(1).map(dbl(_, "b")).getOrElse(0.75))
      case ("hybrid_topk", Seq(src, qsrc, id, text, vec, qid, qtext, qvec, k, rest @ _*)) =>
        if (rest.length > 2) fail("too many arguments")
        graft.llm.RetrievalOps.hybridTopK(source(src), ident(id, "doc_id_col"),
          ident(text, "text_col"), ident(vec, "vec_col"), source(qsrc),
          ident(qid, "qid_col"), ident(qtext, "query_text_col"),
          ident(qvec, "query_vec_col"), int(k, "k"),
          kCand = rest.headOption.map(int(_, "k_cand")).getOrElse(50),
          rrfK = rest.lift(1).map(int(_, "rrf_k")).getOrElse(60))
      case ("filter_top_fraction", Seq(src, id, score, frac, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.QuantileOps.filterTopFraction(source(src), ident(id, "id_col"),
          ident(score, "score_col"), dbl(frac, "frac"),
          highest = rest.headOption.forall(e =>
            enumArg(str(e, "mode"), "mode", "highest", "lowest")))
      case ("select_top_k", Seq(src, id, score, k, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.QuantileOps.selectTopK(source(src), ident(id, "id_col"),
          ident(score, "score_col"), dbl(k, "k").toLong,
          highest = rest.headOption.forall(e =>
            enumArg(str(e, "mode"), "mode", "highest", "lowest")))
      case ("blocklist_filter", Seq(src, id, text, list, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        val entries = list match {
          case f: UnresolvedFunction if f.nameParts.map(_.toLowerCase) == Seq("array") =>
            f.arguments.map(a => str(a, "blocklist entry"))
          case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
            items.map(a => str(a, "blocklist entry"))
          case other => fail(s"terms must be array('t1', …), got $other")
        }
        val terms = spark.createDataset(entries)(
          org.apache.spark.sql.Encoders.STRING).toDF("term")
        graft.llm.ReportOps.blocklistFilter(source(src), ident(id, "id_col"),
          ident(text, "text_col"), terms,
          rest.headOption.map(str(_, "mode")).getOrElse("block"))
      case ("corpus_report", Seq(src, text, strata)) =>
        graft.llm.ReportOps.corpusReport(source(src), ident(text, "text_col"),
          ident(strata, "strata_col"))
      case ("exact_rank", Seq(src, id, score, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.QuantileOps.withExactRank(source(src), ident(id, "id_col"),
          ident(score, "score_col"),
          ascending = rest.headOption.forall(e =>
            enumArg(str(e, "order"), "order", "ascending", "descending")))
      case ("quantile_buckets", Seq(src, id, score, nb)) =>
        graft.llm.QuantileOps.quantileBuckets(source(src), ident(id, "id_col"),
          ident(score, "score_col"), int(nb, "n_buckets"))
      case ("unimax_allocations", Seq(src, strata, toks, budget, epochs)) =>
        graft.llm.MixOps.unimaxAllocations(source(src), ident(strata, "strata_col"),
          ident(toks, "token_col"), dbl(budget, "total_budget").toLong,
          dbl(epochs, "max_epochs"))
      case ("unimax_select", Seq(src, id, strata, toks, budget, epochs, seed)) =>
        graft.llm.MixOps.unimaxSelect(source(src), ident(id, "id_col"),
          ident(strata, "strata_col"), ident(toks, "token_col"),
          dbl(budget, "total_budget").toLong, dbl(epochs, "max_epochs"),
          dbl(seed, "seed").toLong)
      case ("bpe_self_encode", Seq(src, text, nMerges, rest @ _*)) =>
        if (rest.length > 1) fail("too many arguments")
        graft.llm.BpeOps.bpeSelfEncode(source(src), ident(text, "text_col"),
          int(nMerges, "num_merges"),
          rest.headOption.map(int(_, "min_pair_freq")).getOrElse(2).toLong)
      case _ =>
        fail(s"wrong number of arguments (${args.length}) — see GraftExtensions scaladoc")
    }
    df.queryExecution.analyzed
  }
}

package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Corpus accounting and list-based filtering — the bookkeeping ops every
  * curation pipeline runs before and after each stage.
  */
object ReportOps {

  private def toks(c: org.apache.spark.sql.Column) =
    filter(split(lower(trim(c)), "[ \\t\\n\\r\\f]+"), t => length(t) > 0)

  /** Token blocklist filter (the C4 "bad words" step, Raffel et al. 2020
    * §2.2: pages containing any blocklisted word are removed). Word-level
    * match: a document is flagged iff any of its lowercased whitespace
    * tokens equals a blocklist entry.
    *
    * Scale shape mirrors [[DomainOps.filterByDomainList]]: the blocklist
    * (bounded: a curated list, hundreds of entries) broadcasts, the corpus
    * explodes to tokens ONCE and a broadcast semi-join marks matching ids —
    * text never shuffles, and the match set is (matching ids) only.
    *
    * @param mode `"block"` keeps non-matching rows (the filter),
    *             `"flag"` returns every row with `has_blocked`
    */
  def blocklistFilter(df: DataFrame, idCol: String, textCol: String,
                      terms: DataFrame, mode: String = "block"): DataFrame = {
    require(mode == "block" || mode == "flag", s"mode must be block|flag, got '$mode'")
    val listCol = terms.columns.headOption.getOrElse(
      throw new IllegalArgumentException("blocklist needs one column"))
    val list = broadcast(terms.select(lower(col(listCol)).as("_bl_term")).distinct())
    val matchedIds = df
      .select(col(idCol), explode(toks(col(textCol))).as("_bl_tok"))
      .join(list, col("_bl_tok") === col("_bl_term"), "left_semi")
      .select(col(idCol)).distinct()
    if (mode == "block") df.join(matchedIds, Seq(idCol), "left_anti")
    else df.join(matchedIds.withColumn("_hit", lit(true)), Seq(idCol), "left")
      .withColumn("has_blocked", coalesce(col("_hit"), lit(false)))
      .drop("_hit")
  }

  /** Per-stratum corpus data card: document/token/char totals and doc-length
    * quartile-free summary (min/avg/max) — the numbers a training-data
    * report publishes per language/source slice. One groupBy with map-side
    * combine; never a corpus-wide sort. `avg_doc_tokens` is rounded to 6
    * decimals so the report replays across engines. */
  def corpusReport(df: DataFrame, textCol: String, strataCol: String): DataFrame = {
    val n = size(toks(col(textCol)))
    df.select(col(strataCol), n.as("_nt"), length(col(textCol)).as("_nc"))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_nt")).cast(LongType).as("n_tokens"),
        sum(col("_nc")).cast(LongType).as("n_chars"),
        min(col("_nt")).cast(LongType).as("min_doc_tokens"),
        max(col("_nt")).cast(LongType).as("max_doc_tokens"),
        round(avg(col("_nt").cast(DoubleType)), 6).as("avg_doc_tokens"))
  }

  /** Corpus snapshot diff: what changed between two versions of a corpus,
    * keyed by document id — `added` / `removed` / `changed` (and
    * `unchanged` when requested). The reproducibility/audit primitive of a
    * versioned training-data pipeline: "what exactly moved between
    * corpus v12 and v13?"
    *
    * Scale design: each side reduces MAP-SIDE to a slim
    * (id, is-null flag, 64-bit content hash) projection — document text
    * never crosses an exchange; the one necessary shuffle is the id-keyed
    * full-outer join of those slim tables. By default `unchanged` rows
    * (the overwhelming bulk at 100 TB — a diff output should be the small
    * delta) are filtered BEFORE leaving the join, so downstream stages see
    * only the delta. Content equality is xxhash64-based (the
    * [[TextOps.dedupExact]] discipline; a 64-bit collision mislabeling a
    * changed doc as unchanged is ~n²/2⁶⁴); null text is tracked as an
    * explicit flag so null ≠ empty-string. */
  def corpusDiff(oldCorpus: DataFrame, newCorpus: DataFrame, idCol: String,
                 textCol: String, includeUnchanged: Boolean = false): DataFrame = {
    def slim(df: DataFrame, pre: String): DataFrame =
      df.select(col(idCol).as("_cd_id"), lit(true).as(s"${pre}ex"),
        col(textCol).isNull.as(s"${pre}nul"),
        xxhash64(coalesce(col(textCol), lit(""))).as(s"${pre}fp"))
    val j = slim(oldCorpus, "_cdo").join(slim(newCorpus, "_cdn"),
      Seq("_cd_id"), "full_outer")
    val status =
      when(col("_cdoex").isNull, "added")
        .when(col("_cdnex").isNull, "removed")
        .when(col("_cdonul") === col("_cdnnul") && col("_cdofp") === col("_cdnfp"),
          "unchanged")
        .otherwise("changed")
    val out = j.withColumn("status", status)
      .select(col("_cd_id").as(idCol), col("status"))
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }

  /** One-row-per-status rollup of [[corpusDiff]] (always includes
    * `unchanged` — the audit total must reconcile with both versions'
    * counts). */
  def corpusDiffSummary(oldCorpus: DataFrame, newCorpus: DataFrame,
                        idCol: String, textCol: String): DataFrame =
    corpusDiff(oldCorpus, newCorpus, idCol, textCol, includeUnchanged = true)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}

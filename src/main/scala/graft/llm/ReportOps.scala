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
}

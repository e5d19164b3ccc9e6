package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thirtieth batch (round 9): cross-document paragraph dedup (the Dolma
  * pipeline's paragraph-granularity exact dedup — keep the FIRST
  * occurrence of every duplicated paragraph, remove later occurrences
  * from their documents; blank lines are structure and survive).
  *
  * Fixture: every document gets a planted `shared paragraph <doc_id % 7>`
  * line appended, so each of the 7 paragraph classes keeps exactly its
  * lowest-doc_id occurrence; any NATURAL duplicate lines in the corpus
  * dedup too and the oracle replays them identically (it groups by the
  * paragraph TEXT — the Spark side groups by xxhash64 of it, identical up
  * to 64-bit collisions). */
object SparkEntryV30 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_paragraphs" -> ((s, dir) => {
      val aug = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit("\nshared paragraph "),
          (col("doc_id") % 7).cast("string")).as("text_aug"))
      graft.llm.TextOps.dedupParagraphs(aug, "doc_id", "text_aug")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "dedup_paragraphs" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    text || chr(10) || 'shared paragraph ' || CAST(doc_id % 7 AS VARCHAR) AS t
         |  FROM documents),
         |ls AS (SELECT doc_id, string_split(t, chr(10)) AS lines FROM aug),
         |linepos AS (SELECT doc_id, unnest(lines) AS l,
         |    generate_subscripts(lines, 1) AS i FROM ls),
         |occ AS (SELECT doc_id, i, trim(l) AS pl FROM linepos
         |  WHERE len(trim(l)) >= 1),
         |r AS (SELECT doc_id, i,
         |    row_number() OVER (PARTITION BY pl ORDER BY doc_id, i) AS rk,
         |    count(*) OVER (PARTITION BY pl) AS cnt
         |  FROM occ),
         |dups AS (SELECT doc_id, i FROM r WHERE cnt >= 2 AND rk > 1),
         |kept AS (SELECT lp.doc_id, lp.l, lp.i FROM linepos lp
         |  WHERE NOT EXISTS (SELECT 1 FROM dups d
         |                    WHERE d.doc_id = lp.doc_id AND d.i = lp.i)),
         |agg AS (SELECT doc_id,
         |    array_to_string(list(l ORDER BY i), chr(10)) AS text_clean
         |  FROM kept GROUP BY doc_id),
         |dc AS (SELECT doc_id, count(*) AS nrem FROM dups GROUP BY 1)
         |SELECT x.doc_id, coalesce(a.text_clean, '') AS text_clean,
         |  CAST(coalesce(dc.nrem, 0) AS BIGINT) AS text_clean_paragraphs_removed
         |FROM aug x LEFT JOIN agg a USING (doc_id) LEFT JOIN dc USING (doc_id)""".stripMargin
  )
}

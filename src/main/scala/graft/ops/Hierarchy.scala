package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-key hierarchy operators (reference src/table_functions/
  * ts_combine_keys.cpp, ts_split_keys.cpp, ts_aggregate_hierarchy.cpp,
  * ts_validate_separator.cpp).
  */
object Hierarchy {

  /** ts_combine_keys (ts_combine_keys.cpp:134-141): join N id columns into a
    * single `unique_id` with a separator; output (unique_id, date, value). */
  def combineKeys(df: DataFrame, dsCol: String, yCol: String, idCols: Seq[String],
                  separator: String = "|"): DataFrame =
    df.select(concat_ws(separator, idCols.map(c => col(c).cast("string")): _*).as("unique_id"),
      col(dsCol), col(yCol))

  /** ts_split_keys (ts_split_keys.cpp:213-233): split `unique_id` back into
    * parts. Part columns named id_part_1..N (or the provided names). */
  def splitKeys(df: DataFrame, uniqueIdCol: String, nParts: Int,
                separator: String = "|", partNames: Seq[String] = Nil): DataFrame = {
    val names = if (partNames.nonEmpty) partNames else (1 to nParts).map(i => s"id_part_$i")
    require(names.length == nParts, "one name per part")
    val parts = split(col(uniqueIdCol), java.util.regex.Pattern.quote(separator))
    names.zipWithIndex.foldLeft(df) { case (d, (n, i)) => d.withColumn(n, parts.getItem(i)) }
  }

  /** ts_aggregate_hierarchy (ts_aggregate_hierarchy.cpp:15-30): N id columns
    * → N+1 prefix-aggregation levels per date. Level 0 = grand total with all
    * parts 'AGGREGATED'; level k keeps the first k ids. Values summed.
    * Implemented as Spark `rollup` (exactly the prefix hierarchy) with
    * AGGREGATED fill — one shuffle, no N-fold union. */
  def aggregateHierarchy(df: DataFrame, dsCol: String, yCol: String,
                         idCols: Seq[String], separator: String = "|"): DataFrame = {
    // grouping() bits distinguish rollup subtotal NULLs from genuine NULL id
    // values, so real-NULL keys aren't silently merged into subtotals
    val gCols = idCols.map(c => grouping(col(c)).as(s"_g_$c")) :+
      grouping(col(dsCol)).as("_g_ds")
    val rolled = df.rollup(col(dsCol) +: idCols.map(col): _*)
      .agg(sum(col(yCol)).as(yCol), gCols: _*)
      .filter(col("_g_ds") === 0) // drop only the all-rolled grand-total row
    val level = idCols.map(c => lit(1) - col(s"_g_$c")).reduce(_ + _)
    val filled = idCols.map(c =>
      when(col(s"_g_$c") === 1, lit("AGGREGATED"))
        .otherwise(coalesce(col(c).cast("string"), lit(""))))
    rolled.select(
      level.as("level"),
      concat_ws(separator, filled: _*).as("unique_id"),
      col(dsCol), col(yCol))
  }

  /** ts_validate_separator (ts_validate_separator.cpp:19, :92-255): reports
    * whether any DISTINCT key value contains the separator. Output mirrors
    * the reference's five columns (separator, is_valid, n_conflicts over
    * distinct values, conflicting_values, message with alternative-separator
    * suggestions) plus the row-level n_invalid_rows/n_total diagnostics. */
  def validateSeparator(df: DataFrame, idCols: Seq[String], separator: String = "|"): DataFrame = {
    val offending: Column = idCols.map(c =>
      when(col(c).cast("string").contains(separator), 1).otherwise(0)).reduce(_ + _)
    val valsArr = array(idCols.map(c => col(c).cast("string")): _*)
    // alternative suggestions, as in the reference: a candidate qualifies
    // unless the requested separator already contains it
    val suggestions = Seq("-", ".", "::", "__", "#")
      .filter(c => separator != c && !separator.contains(c))
      .map(c => s"'$c'").mkString(", ")
    df.agg(
        sum(when(offending > 0, 1).otherwise(0)).cast("long").as("n_invalid_rows"),
        count(lit(1)).as("n_total"),
        array_sort(array_distinct(flatten(collect_list(
          filter(valsArr, v => v.contains(separator)))))).as("conflicting_values"))
      .withColumn("separator", lit(separator))
      .withColumn("n_conflicts", size(col("conflicting_values")))
      .withColumn("is_valid", col("n_conflicts") === 0)
      .withColumn("message",
        when(col("is_valid"), lit("Separator is safe to use"))
          .otherwise(concat(
            lit(s"Separator '$separator' found in "), col("n_conflicts"),
            lit(s" value(s). Try: $suggestions"))))
      .select(col("separator"), col("is_valid"), col("n_conflicts"),
        col("conflicting_values"), col("message"),
        col("n_invalid_rows"), col("n_total"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Write-side layout for multi-dimensional data skipping: Z-order (Morton)
  * clustering (Morton 1966; the Delta/Iceberg OPTIMIZE ZORDER recipe).
  *
  * Columnar scans prune on per-row-group min/max statistics, but a table
  * sorted on ONE column has useless stats on every other: a predicate on
  * `(price BETWEEN …) AND (quantity BETWEEN …)` reads everything. The
  * Morton value interleaves the bits of each column's range-bucketed
  * level, so rows close in EVERY dimension land close in the write order —
  * row-group min/max becomes a coarse k-d index and multi-column
  * predicates skip most of a 100 TB table at the scan, before any
  * operator in this library runs.
  *
  * Scale design: the z-value is a map-side codegen projection (bit
  * arithmetic over `d·bits` terms) plus ONE broadcast one-row min/max
  * aggregate — no window, no sort, no driver action. The write path adds
  * the one shuffle the layout IS: `repartitionByRange(zvalue)` (sampled
  * range exchange) + `sortWithinPartitions`, producing files whose
  * z-ranges don't overlap (LayoutOpsSpec pins disjointness end-to-end).
  *
  * Determinism: levels are `⌊(c − min)/(max − min)·2^bits⌋` clamped to
  * `[0, 2^bits)` — IEEE subtraction/division/multiplication in a fixed
  * order, then integer bit interleave, so any engine replays every
  * z-value exactly (nulls and constant columns level to 0; the driver
  * oracle rebuilds the values bit-for-bit in BIGINT SQL).
  */
object LayoutOps {

  /** Morton interleave of pre-bucketed levels: bit `b` of level `j` lands
    * at output bit `b·d + j`. `d·bits` must fit a LONG (≤ 63). */
  private def interleave(levels: Seq[Column], bits: Int): Column = {
    val d = levels.length
    var z: Column = lit(0L)
    for (b <- 0 until bits; j <- 0 until d)
      z = z + shiftleft(shiftright(levels(j), b).bitwiseAND(lit(1L)), b * d + j)
    z
  }

  /** Add `out` = the Morton value of `cols`, each range-bucketed into
    * `2^bits` levels by its own global min/max (computed in-plan, one
    * broadcast row). Null values and constant columns level to 0. */
  def zorderValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
                  out: String = "zvalue"): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bits >= 1 && cols.length * bits <= 63,
      s"need 1 <= bits and d*bits <= 63, got d=${cols.length} bits=$bits")
    val levels = lit((1L << bits) - 1L)
    val aggs = cols.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(col(c).cast("double")).as(s"_min$j"),
        max(col(c).cast("double")).as(s"_max$j"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withStats = df.crossJoin(broadcast(stats))
    val lvls = cols.zipWithIndex.map { case (c, j) =>
      val v = col(c).cast("double")
      val lo = col(s"_min$j"); val hi = col(s"_max$j")
      when(v.isNull || lo.isNull || (hi === lo), lit(0L))
        .otherwise(least(
          floor((v - lo) / (hi - lo) * lit((1L << bits).toDouble)).cast(LongType),
          levels))
    }
    withStats
      .withColumn(out, interleave(lvls, bits))
      .drop(cols.indices.flatMap(j => Seq(s"_min$j", s"_max$j")): _*)
  }

  /** Write `df` parquet z-clustered on `cols`: the range exchange on the
    * Morton value + an in-partition sort IS the layout — each output file
    * covers a disjoint z-range, so its per-column min/max row-group stats
    * prune multi-dimensional predicates. */
  def writeZordered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, bits: Int = 8): Unit =
    zorderValue(df, cols, bits)
      .repartitionByRange(nFiles, col("zvalue"))
      .sortWithinPartitions("zvalue")
      .write.mode("overwrite").parquet(path)
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HllMergeRegisters, HllRegisters}

/** Distinct-cardinality reporting over a corpus — HyperLogLog sketches as
  * first-class, PERSISTABLE data ("how many unique users per event type /
  * unique tokens per source / unique URLs per snapshot?").
  *
  * Why not `count(distinct x)` / `approx_count_distinct`: exact distinct
  * shuffles every unique key (the exchange cardinality IS the answer —
  * the 100 TB anti-pattern), and Spark's built-in HLL++ returns only the
  * final number — the SKETCH itself is gone, so it can neither be saved
  * per shard/day and merged later, nor diffed between corpus versions.
  * Here the register array is the value: `array<int>` of length `2^p`,
  * written to parquet like any column, merged exactly (elementwise max —
  * the merge of any sharding is register-identical to the single-pass
  * sketch), estimated on read. Build is ONE partial-agg-capable
  * aggregation whose map-side output is `2^p` bytes per (partition,
  * group); the estimate is a bounded fold over one register row per
  * group — no corpus-sized shuffle anywhere (PlanGuardSpec pins the
  * shape).
  *
  * Estimator (Flajolet et al. 2007): `E = alpha_m · m² / Σ 2^(-M_j)`,
  * computed as one double division of exact integers (`K / S` with
  * `S = Σ 2^(rhoMax - M_j)` — every term a power of two, so `S` is exact
  * in 64-bit float space at the register widths used here), with the
  * linear-counting small-range correction `E = m·ln(m/V)` when
  * `E ≤ 2.5m` and zero registers remain. Standard error `1.04/√m`
  * (~1.6% at the default p=12).
  *
  * Hash paths: [[hllCountBy]] hashes with `xxhash64` (64-bit, the
  * production default); the `Prehashed` variants take any uniform
  * integer-hash column plus its bit width — the driver rows feed the
  * 31-bit LCG mixer ([[SampleOps.hashBucket]]) so DuckDB replays every
  * register, zero count, scaled sum and estimate bit-for-bit. */
object CardinalityOps {

  private val B = org.apache.spark.sql.GraftExpressionBridge

  /** Aggregate column: HLL registers (`array<int>`, length `2^p`) of a
    * uniform `hashBits`-wide integer hash column. */
  def hllAgg(hashCol: Column, p: Int, hashBits: Int = 64): Column =
    B.column(HllRegisters(B.expression(hashCol), p, hashBits)
      .toAggregateExpression())

  /** Aggregate column merging persisted register arrays (elementwise max). */
  def hllMergeAgg(regsCol: Column, p: Int): Column =
    B.column(HllMergeRegisters(B.expression(regsCol), p)
      .toAggregateExpression())

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Count of zero registers — the linear-counting occupancy signal. */
  def hllZeroCount(regs: Column): Column =
    size(filter(regs, x => x === 0)).cast("long")

  /** `S = Σ 2^(rhoMax - M_j)` as a double — every term is an exact power
    * of two `≤ 2^rhoMax`, so with the 31-bit hash (rhoMax 24) the sum is
    * integer-exact and engine/order-independent. */
  def hllScaledSum(regs: Column, p: Int, hashBits: Int): Column = {
    val rhoMax = hashBits - p + 1
    aggregate(regs, lit(0.0),
      (acc, x) =>
        acc + call_function("shiftleft", lit(1L), lit(rhoMax) - x).cast("double"))
  }

  /** Cardinality estimate from a register array (raw HLL + linear-counting
    * small-range correction). One double division of exact operands, then
    * at most one `ln` — deterministic given the registers. */
  def hllEstimate(regs: Column, p: Int, hashBits: Int): Column = {
    val m = 1 << p
    val rhoMax = hashBits - p + 1
    // K = alpha_m · m² · 2^rhoMax precomputed as one double constant
    val k = alpha(m) * m.toDouble * m.toDouble *
      java.lang.Math.scalb(1.0, rhoMax)
    val raw = lit(k) / hllScaledSum(regs, p, hashBits)
    val v = hllZeroCount(regs)
    when(raw <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(raw)
  }

  /** SQL expression text of [[hllEstimate]] for the DuckDB oracle — the
    * same constants, the same operation order, over a replayed register
    * table `(regs expressed as per-bucket max rho M, zero count v,
    * scaled sum s)`. Exposed so entry rows and oracles cannot drift. */
  def hllEstimateSql(sExpr: String, vExpr: String, p: Int, hashBits: Int): String = {
    val m = 1 << p
    val rhoMax = hashBits - p + 1
    val k = alpha(m) * m.toDouble * m.toDouble *
      java.lang.Math.scalb(1.0, rhoMax)
    s"CASE WHEN ($k / ($sExpr)) <= ${2.5 * m} AND ($vExpr) > 0 " +
      s"THEN ${m.toDouble} * ln(${m.toDouble} / CAST($vExpr AS DOUBLE)) " +
      s"ELSE $k / ($sExpr) END"
  }

  /** Distinct-cardinality sketch per group over `valueCol`, hashing with
    * `xxhash64` (production path). Output: groupCols..., `regs`
    * (`array<int>`), `v_zero`, `s_scaled`, `est`. */
  def hllCountBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 p: Int = 12): DataFrame = {
    // NULL values must not register: Spark's xxhash64(NULL) returns the
    // seed (42), which would count one phantom distinct entity per group —
    // count(distinct) semantics skip nulls, and so does the Prehashed
    // path's null guard in HllRegisters. A null __h is skipped by that
    // same guard (a when() wrap rather than a row filter, so a group
    // whose values are ALL null still emits a row, with est ≈ 0).
    val hashed = df.withColumn("__h",
      when(col(valueCol).isNotNull, xxhash64(col(valueCol))))
    sketchOut(hashed, groupCols, p, 64)
  }

  /** Same, over a caller-supplied uniform hash column of `hashBits` width
    * (the oracle-replayable path). */
  def hllCountByPrehashed(df: DataFrame, groupCols: Seq[String],
                          hashCol: Column, p: Int, hashBits: Int): DataFrame =
    sketchOut(df.withColumn("__h", hashCol), groupCols, p, hashBits)

  private def sketchOut(hashed: DataFrame, groupCols: Seq[String],
                        p: Int, hashBits: Int): DataFrame =
    hashed
      .groupBy(groupCols.map(col): _*)
      .agg(hllAgg(col("__h"), p, hashBits).as("regs"))
      .withColumn("v_zero", hllZeroCount(col("regs")))
      .withColumn("s_scaled", hllScaledSum(col("regs"), p, hashBits))
      .withColumn("est", hllEstimate(col("regs"), p, hashBits))

  /** Merge per-shard sketch rows (`groupCols..., regs`) back to one row
    * per group: elementwise register max, then the same estimate columns.
    * `mergeShards(writeShard(day1) ∪ … ∪ writeShard(dayN))` equals the
    * single-pass sketch exactly. */
  def mergeShards(shards: DataFrame, groupCols: Seq[String], p: Int,
                  hashBits: Int = 64): DataFrame =
    shards
      .groupBy(groupCols.map(col): _*)
      .agg(hllMergeAgg(col("regs"), p).as("regs"))
      .withColumn("v_zero", hllZeroCount(col("regs")))
      .withColumn("s_scaled", hllScaledSum(col("regs"), p, hashBits))
      .withColumn("est", hllEstimate(col("regs"), p, hashBits))

  /** Set-algebra report over two sketch tables (`groupCols..., regs`
    * each): union cardinality from the elementwise-max register merge
    * (EXACT at the sketch level — identical to sketching the unioned
    * stream), intersection by inclusion-exclusion
    * `|A| + |B| - |A∪B|` (clamped at 0), and the Jaccard estimate —
    * "how many unique URLs do crawl A and crawl B share?" over persisted
    * sketches, without ever re-reading either corpus. Intersection error
    * grows as the true overlap shrinks (standard HLL caveat, documented
    * here rather than hidden: the subtraction compounds the ±1.04/√m of
    * three estimates). Output per group: `est_a`, `est_b`, `est_union`,
    * `est_intersection`, `jaccard`. */
  def overlapEstimate(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                      p: Int, hashBits: Int = 64): DataFrame = {
    val aS = a.select(groupCols.map(col) :+ col("regs").as("__ra"): _*)
    val bS = b.select(groupCols.map(col) :+ col("regs").as("__rb"): _*)
    val j = if (groupCols.isEmpty) aS.crossJoin(bS) else aS.join(bS, groupCols)
    j.withColumn("__ru", zip_with(col("__ra"), col("__rb"), (x, y) => greatest(x, y)))
      .select(groupCols.map(col) ++ Seq(
        hllEstimate(col("__ra"), p, hashBits).as("est_a"),
        hllEstimate(col("__rb"), p, hashBits).as("est_b"),
        hllEstimate(col("__ru"), p, hashBits).as("est_union")): _*)
      .withColumn("est_intersection",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("jaccard",
        when(col("est_union") > 0, col("est_intersection") / col("est_union"))
          .otherwise(lit(0.0)))
  }

  /** Persist sketch rows (the steady-state layout: one parquet of
    * `groupCols..., regs` per corpus shard/day, merged on read). */
  def writeHllSketches(sketches: DataFrame, path: String): Unit =
    sketches.write.mode("overwrite").parquet(path)

  def readHllSketches(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

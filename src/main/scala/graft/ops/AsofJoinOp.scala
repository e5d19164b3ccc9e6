package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

/** Point-in-time (as-of) join — for each left row `(keys, ts)`, attach the
  * single right row with the same keys whose timestamp is the nearest one
  * at-or-before it (`backward`, the feature-store / leakage-free-features
  * semantics: "the latest value known at prediction time"), or the nearest
  * one at-or-after it (`forward`). Matches DuckDB's `ASOF JOIN`
  * (`l.ts >= r.ts` backward non-strict, `>` strict, `<=` / `<` forward) and
  * the pandas `merge_asof` contract, including `tolerance` (max distance
  * beyond which the match is nulled) — the reference engine exposes the
  * same shape through its SQL frontend's ASOF syntax.
  *
  * Scale design — the naive plan is a per-key range join: Spark would
  * either broadcast-nested-loop (O(|L|·|R|)) or sort-merge on the equi-keys
  * and re-scan each key's right block per left row (O(|L|·|R|) per key,
  * catastrophic on a 100 TB fact table keyed by a few thousand entities).
  * This implementation NEVER JOINS: it tags both inputs, unions the two
  * timelines, and runs ONE running `last(value, ignoreNulls)` window
  * partitioned by the keys and ordered by `(ts, side)` — the side bit sorts
  * right rows before left rows at equal timestamps exactly when the match
  * is inclusive. One hash exchange on the keys, one sort, one linear
  * window pass with an O(1) frame (running last, no buffering of the
  * partition in the frame), zero join operators in the plan
  * (PlanGuardSpec pins this). Shuffle volume is |L| + |R| rows, each
  * carrying only the keys, the 8-byte epoch, and the packed payload
  * struct. Skew: a single hot key serializes its own timeline (inherent to
  * as-of semantics — a running state over time cannot be salted without a
  * second merge pass); at 100 TB the mitigation is range-bucketing the
  * timeline per key into epochs and seeding each bucket with the previous
  * bucket's final state, which this op's union/window core composes with
  * directly.
  *
  * Determinism: duplicate right rows on `(keys, ts)` are resolved to the
  * largest payload struct (field-wise struct ordering), not to an
  * arbitrary partition-order winner; DuckDB's ASOF leaves that tie
  * undefined, so oracle-gated fixtures pre-aggregate the right side to
  * unique `(keys, ts)` — the recommended production shape as well.
  *
  * Timestamps may be `TimestampType` (compared at epoch-micros precision)
  * or any integral/numeric column; `toleranceMicros` is in the same unit
  * as the comparison (micros for timestamps, raw units for numerics).
  *
  * Reference: asof join surface of the reference SQL frontend; semantics
  * cross-checked against DuckDB `ASOF JOIN` (the oracle engine) and
  * pandas `merge_asof`. */
object AsofJoinOp {

  /** As-of join `left` to `right` on equal `keys` and nearest `rightTs`
    * relative to `leftTs`.
    *
    * @param direction  "backward" (nearest right at-or-before; default),
    *                   "forward" (nearest right at-or-after), or "nearest"
    *                   (closer of the two, ties to backward — the pandas
    *                   merge_asof contract; both directional windows run
    *                   over the ONE key exchange)
    * @param strict     drop exact-timestamp matches (`>` / `<` instead of
    *                   `>=` / `<=`)
    * @param toleranceMicros max |leftTs - rightTs| for a match to stand;
    *                   beyond it the right columns are null
    * @param valueCols  right columns to attach (default: all non-key,
    *                   non-ts right columns); emitted as `rightPrefix+name`
    *                   plus `rightPrefix+rightTs` (the matched timestamp,
    *                   in the right column's original type) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[String] = Seq.empty,
               direction: String = "backward", strict: Boolean = false,
               toleranceMicros: Option[Long] = None,
               rightPrefix: String = "right_"): DataFrame = {
    require(direction == "backward" || direction == "forward" ||
      direction == "nearest",
      s"direction must be backward|forward|nearest, got $direction")
    require(keys.nonEmpty, "asof join needs at least one equi-key")
    val vals =
      if (valueCols.nonEmpty) valueCols
      else right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    require(vals.nonEmpty, "right side has no value columns to attach")

    // NTZ epochs via an explicit UTC-session cast to TimestampType — every
    // graft session pins spark.sql.session.timeZone=UTC, so this is stable.
    def isTs(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
      case TimestampType | TimestampNTZType => true
      case _                                => false
    }
    def epoch(df: DataFrame, c: String): Column =
      if (isTs(df, c)) unix_micros(col(c).cast(TimestampType))
      else col(c).cast("long")

    // Inclusive match ⇔ right rows sort before left rows at equal ts.
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val lrowType = StructType(left.schema.fields)
    val rvFields = struct(col(rightTs).as("__mts") +: vals.map(col): _*)
    val rvType   = StructType(
      right.schema(rightTs).copy(name = "__mts") +:
        vals.map(c => right.schema(c)))

    val rSlim = right
      .filter(col(rightTs).isNotNull)
      .select(keys.map(col) ++ Seq(
        epoch(right, rightTs).as("__ats"),
        lit(rightSide).as("__side"),
        lit(null).cast(lrowType).as("__lrow"),
        rvFields.as("__rv")): _*)
    val lSlim = left
      .select(keys.map(col) ++ Seq(
        epoch(left, leftTs).as("__ats"),
        lit(leftSide).as("__side"),
        struct(left.columns.map(col): _*).as("__lrow"),
        lit(null).cast(rvType).as("__rv")): _*)

    def ordFor(dir: String): Seq[Column] =
      if (dir == "backward")
        Seq(col("__ats").asc_nulls_first, col("__side").asc, col("__rv").asc_nulls_first)
      else
        Seq(col("__ats").desc_nulls_last, col("__side").asc, col("__rv").asc_nulls_first)
    def windowFor(dir: String) =
      Window.partitionBy(keys.map(col): _*).orderBy(ordFor(dir): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def mEpochOf(m: Column): Column =
      if (isTs(right, rightTs)) unix_micros(m.getField("__mts").cast(TimestampType))
      else m.getField("__mts").cast("long")

    val base = rSlim.unionByName(lSlim)
    // "nearest" evaluates BOTH directional running-last windows over the
    // same key partitioning (one exchange, two sorts) and keeps the
    // closer match, ties to backward — the pandas merge_asof contract.
    val unioned =
      if (direction == "nearest") {
        val mb = last(col("__rv"), ignoreNulls = true).over(windowFor("backward"))
        val mf = last(col("__rv"), ignoreNulls = true).over(windowFor("forward"))
        // Tolerance applies PER DIRECTIONAL CANDIDATE before the
        // closer-of-the-two pick (the pandas merge_asof contract): a left
        // row whose nearer match is out of tolerance must still take the
        // other direction's in-tolerance match, not NULL.
        def gated(m: Column, distOf: Column => Column): Column =
          toleranceMicros.map(t => when(distOf(m) <= lit(t), m)).getOrElse(m)
        base.withColumn("__mb", mb).withColumn("__mf", mf)
          .withColumn("__mb",
            gated(col("__mb"), m => col("__ats") - mEpochOf(m)))
          .withColumn("__mf",
            gated(col("__mf"), m => mEpochOf(m) - col("__ats")))
          .withColumn("__m",
            when(col("__mf").isNull, col("__mb"))
              .when(col("__mb").isNull, col("__mf"))
              .when(col("__ats") - mEpochOf(col("__mb")) <=
                mEpochOf(col("__mf")) - col("__ats"), col("__mb"))
              .otherwise(col("__mf")))
          .drop("__mb", "__mf")
          .filter(col("__side") === leftSide && col("__lrow").isNotNull)
      } else {
        base
          .withColumn("__m",
            last(col("__rv"), ignoreNulls = true).over(windowFor(direction)))
          .filter(col("__side") === leftSide && col("__lrow").isNotNull)
      }

    // Null left ts never matches (it sorted somewhere arbitrary); apply
    // the tolerance on the epoch distance in the match's own direction.
    val mEpoch = mEpochOf(col("__m"))
    val dist = direction match {
      case "backward" => col("__ats") - mEpoch
      case "forward"  => mEpoch - col("__ats")
      case _          => abs(col("__ats") - mEpoch)
    }
    val keep = col("__ats").isNotNull && col("__m").isNotNull &&
      toleranceMicros.map(t => dist <= lit(t)).getOrElse(lit(true))
    val gated = unioned.withColumn("__mk", when(keep, col("__m")))

    val attached: Seq[(String, Column)] =
      (s"$rightPrefix$rightTs", col("__mk.__mts")) +:
        vals.map(c => (s"$rightPrefix$c", col(s"__mk.$c")))
    val out = left.columns.map(c => col(s"__lrow.$c").as(c)) ++
      attached.map { case (n, c) => c.as(n) }
    gated.select(out.toSeq: _*)
  }
}

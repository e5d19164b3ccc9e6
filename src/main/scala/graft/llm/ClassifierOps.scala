package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hashed Naive-Bayes document classifier — the fasttext-style linear
  * quality filter used by large-scale pretraining pipelines (GPT-3 / The
  * Pile / CCNet all gate web text with a cheap linear classifier trained on
  * a high-quality seed corpus vs a random web sample; Brown et al. 2020
  * §A.2, Wenzek et al. 2020 §4.3 describe the public recipe).
  *
  * Tokens hash into `numBuckets` feature buckets (the hashing trick —
  * Weinberger et al. 2009), so the model is a BOUNDED table independent of
  * vocabulary size: train is one map-side-combined count aggregation over
  * (bucket, label) and score is a broadcast hash join — both scale shapes
  * survive 100 TB unchanged. No gradient loop: Naive Bayes with add-alpha
  * smoothing has a closed-form fit, which keeps the whole pipeline
  * deterministic and oracle-replayable in plain SQL.
  *
  * Numeric discipline: per-bucket log-likelihood ratios are rounded to 6
  * decimals at train time, and a document's score accumulates those rounded
  * values in DECIMAL space — order-independent, engine-exact (same contract
  * as [[TextOps.lmScore]]).
  */
object ClassifierOps {

  /** Unigram bucket array in one native pass — bit-identical to the
    * seeded 131-rolling-hash-mod-P bucketing the DuckDB oracles replay
    * (NgramBucketHashes parity spec), minus the per-token char-array fold
    * that dominated the 10x-corpus NB-gate profile. */
  private def bucketArr(textCol: String, numBuckets: Int, seed: Long): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.NgramBucketHashes(
        org.apache.spark.sql.GraftExpressionBridge.expression(
          lower(trim(col(textCol)))), numBuckets, seed, bigrams = false))

  /** Train a hashed Naive-Bayes model on a labeled corpus.
    *
    * @param labeled  rows with `textCol` and a boolean/0-1 `labelCol`
    *                 (true/1 = positive class, e.g. "high quality")
    * @return the model as a bounded DataFrame:
    *         one row per OBSERVED bucket `(bucket, c_pos, c_neg, llr)`,
    *         a `bucket = NULL` row carrying the unseen-bucket fallback LLR,
    *         and a `bucket = -1` row carrying the add-one-smoothed
    *         log-prior ratio `log((D⁺+1)/(D⁻+1))`. Buckets live in
    *         `[0, numBuckets)`, so the two marker rows cannot collide with
    *         a real feature.
    *
    * llr(b) = log((c⁺(b)+α)/(N⁺+α·B)) − log((c⁻(b)+α)/(N⁻+α·B)) with
    * token totals N± and B = numBuckets. Scale shape: explode → one
    * (bucket, label) count aggregation (map-side combined, result ≤ B
    * rows) → an in-plan broadcast of the single totals row. No driver
    * collection; the corpus text never crosses an exchange (only hashed
    * bucket ids shuffle). */
  def nbTrain(labeled: DataFrame, textCol: String, labelCol: String,
              numBuckets: Int = 1 << 20, alpha: Double = 0.5,
              seed: Long = 0L): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val y = col(labelCol).cast(BooleanType)
    val ex = labeled.select(y.as("_y"),
      explode(bucketArr(textCol, numBuckets, seed)).as("bucket"))
    val counts = ex.groupBy(col("bucket"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("_y"), 0L).otherwise(1L)).as("c_neg"))
    val totals = counts.agg(
      sum(col("c_pos")).as("_np"), sum(col("c_neg")).as("_nn"))
    val docs = labeled.agg(
      sum(when(y, 1L).otherwise(0L)).as("_dp"),
      sum(when(y, 0L).otherwise(1L)).as("_dn"))
    val denomP = coalesce(col("_np"), lit(0L)) + lit(alpha * numBuckets)
    val denomN = coalesce(col("_nn"), lit(0L)) + lit(alpha * numBuckets)
    // `+ 0.0` normalizes a tiny-negative LLR that rounds to zero: Spark's
    // BigDecimal round emits +0.0 while DuckDB's keeps −0.0 (the house
    // signed-zero rule; both the op and the oracle add the same term)
    def llrOf(cp: Column, cn: Column): Column =
      round(log((cp + lit(alpha)) / denomP) - log((cn + lit(alpha)) / denomN), 6) + lit(0.0)
    val buckets = counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("c_pos"), col("c_neg"),
        llrOf(col("c_pos"), col("c_neg")).as("llr"))
    val fallback = totals.select(
      lit(null).cast(LongType).as("bucket"), lit(0L).as("c_pos"),
      lit(0L).as("c_neg"), llrOf(lit(0L), lit(0L)).as("llr"))
    val prior = docs.select(
      lit(-1L).as("bucket"),
      col("_dp").as("c_pos"), col("_dn").as("c_neg"),
      (round(log((col("_dp") + lit(1L)) / (col("_dn") + lit(1L)).cast(DoubleType)), 6)
        + lit(0.0)).as("llr"))
    buckets.unionByName(fallback).unionByName(prior)
  }

  /** Score documents under a [[nbTrain]] model: per document the token
    * count, the accumulated LLR `score = prior + Σ_tokens llr(bucket(tok))`
    * (6-decimal fixed-point — order-independent), and `pred = score > 0`.
    *
    * Production shape (r10): ONE map-only pass through the broadcast
    * scaled-long scorer ([[nbScoreBroadcast]]) — the model is bounded by
    * `numBuckets`, so it collects into a broadcast bucket→LLR map and every
    * document scores in place: no token explode, no join, no per-doc
    * aggregation exchange. Bit-parity with the broadcast-join DECIMAL-sum
    * form is pinned in ClassifierOpsSpec; that form stays below as
    * [[nbScoreJoins]], the executable specification. `numBuckets`/`seed`
    * must match the training call (they define the feature space). */
  def nbScore(df: DataFrame, idCol: String, textCol: String, model: DataFrame,
              numBuckets: Int = 1 << 20, seed: Long = 0L,
              scoreOut: String = "nb_score", predOut: String = "nb_pred"): DataFrame =
    nbScoreBroadcast(df.select(col(idCol), col(textCol)), textCol, model,
      numBuckets, seed, scoreOut, predOut)
      .select(col(idCol), col("n_tokens"), col(scoreOut), col(predOut))

  /** The broadcast-join DECIMAL-sum form of [[nbScore]] — kept as the
    * executable specification: the bucket→llr lookup IS a broadcast hash
    * join; unseen buckets fall back to the NULL-row LLR; the only shuffle
    * is the per-doc aggregation keyed on `idCol`. Pure codegen end to end. */
  private[graft] def nbScoreJoins(df: DataFrame, idCol: String, textCol: String,
                                  model: DataFrame, numBuckets: Int = 1 << 20,
                                  seed: Long = 0L, scoreOut: String = "nb_score",
                                  predOut: String = "nb_pred"): DataFrame = {
    val fallback = model.filter(col("bucket").isNull)
      .select(col("llr").as("_fb"))
    val prior = model.filter(col("bucket") === -1L)
      .select(col("llr").as("_prior"))
    val feats = model.filter(col("bucket").isNotNull && col("bucket") >= 0L)
      .select(col("bucket"), col("llr"))
    val base = df.select(col(idCol), col(textCol))
    val perDoc = base
      .select(col(idCol), explode(bucketArr(textCol, numBuckets, seed)).as("bucket"))
      .join(broadcast(feats), Seq("bucket"), "left")
      .crossJoin(broadcast(fallback))
      .withColumn("_llr", coalesce(col("llr"), col("_fb")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(graft.functions.RoundedDecimal.column(col("_llr"))).as("_sum"))
    base.select(col(idCol)).crossJoin(broadcast(prior))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("_sum"), lit(0).cast(DecimalType(28, 6)))
          + col("_prior").cast(DecimalType(28, 6)))
          .cast(DoubleType).as(scoreOut))
      .withColumn(predOut, col(scoreOut) > 0.0)
  }

  /** Streaming-compatible scoring with EXACT [[nbScore]] parity: the
    * bounded model collects into a broadcast bucket→LLR map and each row
    * scores in place — no join, no per-doc aggregation, fully stateless,
    * so the same call gates a streaming micro-batch unchanged. Exactness:
    * the model's LLRs are 6-decimal fixed-point, so the in-row sum
    * accumulates SCALED LONGS (order-independent integer arithmetic) and
    * divides once at the end — bit-identical to the batch DECIMAL-space
    * sum. Tokenization runs through the native one-pass
    * [[graft.functions.NgramBucketHashes]] in unigram mode (bit-parity
    * with the tokHash composition). Returns the input rows with
    * `n_tokens`, score and pred appended. */
  def nbScoreBroadcast(df: DataFrame, textCol: String, model: DataFrame,
                       numBuckets: Int = 1 << 20, seed: Long = 0L,
                       scoreOut: String = "nb_score",
                       predOut: String = "nb_pred"): DataFrame = {
    val spark = df.sparkSession
    var fbScaled = 0L
    var priorScaled = 0L
    val b = Map.newBuilder[Long, Long]
    model.select(col("bucket"), col("llr")).collect().foreach { r =>
      val scaled = math.round(r.getDouble(1) * 1e6)
      if (r.isNullAt(0)) fbScaled = scaled
      else if (r.getLong(0) == -1L) priorScaled = scaled
      else b += r.getLong(0) -> scaled
    }
    val bc = spark.sparkContext.broadcast(b.result())
    val fb = fbScaled
    val pr = priorScaled
    val scoreUdf = udf((bkts: Seq[Long]) => {
      var s = 0L
      bkts.foreach(bk => s += bc.value.getOrElse(bk, fb))
      (s + pr) / 1e6
    })
    // coalesce: null text must score as the EMPTY document (n_tokens = 0,
    // score = prior) exactly as nbScore's left-join+coalesce does — without
    // it the native featurization yields null and the scalar UDF NPEs on a
    // streaming micro-batch (the bigramScoreBroadcast parity discipline)
    val feats = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.NgramBucketHashes(
        org.apache.spark.sql.GraftExpressionBridge.expression(
          lower(trim(coalesce(col(textCol), lit(""))))), numBuckets, seed,
        bigrams = false))
    df.withColumn("_fb", feats)
      .withColumn("n_tokens", size(col("_fb")).cast(LongType))
      .withColumn(scoreOut, scoreUdf(col("_fb")))
      .withColumn(predOut, col(scoreOut) > 0.0)
      .drop("_fb")
  }

  /** A loaded NB model with the featurization parameters that define its
    * feature space — so a scoring batch can never disagree with the fit
    * (the [[DsirOps.DsirModel]] discipline). */
  final case class NbModel(model: DataFrame, numBuckets: Int, seed: Long)

  /** Persist a [[nbTrain]] model: `path/model` (the bounded bucket/LLR
    * table) and `path/meta` (numBuckets + seed). Written once per
    * seed-corpus refresh; every subsequent crawl batch scores against the
    * stored layout via [[loadNbModel]] + [[nbScore]]/[[nbScoreBroadcast]]
    * without touching the training corpora. */
  def writeNbModel(model: DataFrame, numBuckets: Int, seed: Long,
                   path: String): Unit = {
    val spark = model.sparkSession
    import spark.implicits._
    model.write.mode("overwrite").parquet(s"$path/model")
    Seq((numBuckets, seed)).toDF("num_buckets", "seed")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[writeNbModel]] layout. */
  def loadNbModel(spark: org.apache.spark.sql.SparkSession,
                  path: String): NbModel = {
    val m = spark.read.parquet(s"$path/meta").collect()(0)
    NbModel(spark.read.parquet(s"$path/model"), m.getInt(0), m.getLong(1))
  }

  /** One-call form: train on `labeled`, score `df` — the typical
    * seed-corpus-vs-web-sample quality gate. */
  def nbQualityFilter(df: DataFrame, idCol: String, textCol: String,
                      labeled: DataFrame, labeledTextCol: String, labelCol: String,
                      numBuckets: Int = 1 << 20, alpha: Double = 0.5,
                      seed: Long = 0L): DataFrame =
    nbScore(df, idCol, textCol,
      nbTrain(labeled, labeledTextCol, labelCol, numBuckets, alpha, seed),
      numBuckets, seed)
}

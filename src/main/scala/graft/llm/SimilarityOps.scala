package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Baseline: brute-force cosine top-k with the query side broadcast — the
  * corpus is scanned once, never shuffled. Scale path: LSH bucketing via
  * random hyperplanes (signed projections) so candidate generation is a
  * bucket equi-join instead of a cross product.
  */
object SimilarityOps {

  /** Cosine similarity of two double arrays as a codegen'd column expression
    * (functions.aggregate/zip_with — no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: for each query row, the k nearest corpus rows.
    * The query side is broadcast (small); per-query ranking uses a window —
    * fine when |queries| is modest. Output: (qid, vid, sim). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).cast(ArrayType(DoubleType)).as("_cv"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast(ArrayType(DoubleType)).as("_qv"))
    val pairs = c.crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("_qv"), col("_cv")))
      // zero-norm vectors give NaN cosine; Spark sorts NaN above every real
      // value desc, which would steal top-k slots
      .filter(!isnan(col("sim")))
      .select(col("qid"), col("vid"), col("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vid"))
    pairs.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k).drop("_rk")
  }

  /** Random-hyperplane LSH bucketing: `nBits` signed projections → bucket id.
    * Deterministic (seeded). Near-duplicate candidates = same bucket. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                 nBits: Int = 16, seed: Long = 42L, out: String = "bucket"): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nBits, dim)(rnd.nextGaussian())
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val bucketBits = (0 until nBits).map { b =>
      val proj = aggregate(zip_with(v, lit(planes(b)), (x, p) => x * p), lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn(out, bucketBits)
  }

  /** LSH-accelerated near-neighbor pairs: bucket equi-join then exact cosine
    * filter. Scales by bucket size, not corpus². */
  def lshNearPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   minSim: Double, nBits: Int = 16): DataFrame = {
    val b = lshBuckets(df, idCol, vecCol, dim, nBits)
      .select(col(idCol), col(vecCol).cast(ArrayType(DoubleType)).as("_v"), col("bucket"))
    val l = b.select(col(idCol).as("id_a"), col("_v").as("_va"), col("bucket"))
    val r = b.select(col(idCol).as("id_b"), col("_v").as("_vb"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("_va"), col("_vb")))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Embedding-cosine near-duplicate removal: drop rows whose embedding is
    * ≥ minSim-similar to a lower-id row (LSH-bucketed candidate generation). */
  def dedupByEmbedding(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                       minSim: Double = 0.95): DataFrame = {
    val dupIds = lshNearPairs(df, idCol, vecCol, dim, minSim)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }
}

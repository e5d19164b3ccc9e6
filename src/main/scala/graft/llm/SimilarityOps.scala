package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  /** Bounded top-k accumulator state: parallel (vid, sim) arrays with a
    * fill cursor, capacity 2k+1 — product-encodable (plain arrays), unlike a
    * kryo-serialized collection which failed to round-trip through shuffle
    * buffer serialization at scale. */
  final case class TopKBuf(size: Int, ids: Array[Long], sims: Array[Double])

  /** Bounded-heap top-k accumulator over (vid, sim) pairs: keeps at most
    * 2k+1 candidates per partial state, compacting to the best k by
    * (sim desc, vid asc) whenever full. Memory is O(k) per group and partial
    * states combine map-side, so the Q×N pair stream is reduced during the
    * scan instead of being fully sorted — the window-sort alternative
    * materializes and sorts every pair per query, which does not survive a
    * 100× corpus scale-up. */
  private final class TopKAggregator(k: Int)
      extends Aggregator[(Long, Double), TopKBuf, Seq[(Long, Double)]] {
    private val cap = 2 * k + 1

    private def sortedIdx(b: TopKBuf): Array[Int] =
      Array.range(0, b.size).sortBy(i => (-b.sims(i), b.ids(i)))

    /** Keep only the best k entries (in-place when capacity allows). */
    private def compact(b: TopKBuf): TopKBuf = {
      if (b.size <= k) return b
      val order = sortedIdx(b).take(k)
      val ids = new Array[Long](cap)
      val sims = new Array[Double](cap)
      var i = 0
      while (i < order.length) { ids(i) = b.ids(order(i)); sims(i) = b.sims(order(i)); i += 1 }
      TopKBuf(order.length, ids, sims)
    }

    private def append(b0: TopKBuf, vid: Long, sim: Double): TopKBuf = {
      val b = if (b0.ids.length < cap)
        TopKBuf(b0.size, java.util.Arrays.copyOf(b0.ids, cap),
          java.util.Arrays.copyOf(b0.sims, cap))
      else b0
      val c = if (b.size >= cap) compact(b) else b
      c.ids(c.size) = vid
      c.sims(c.size) = sim
      TopKBuf(c.size + 1, c.ids, c.sims)
    }

    def zero: TopKBuf = TopKBuf(0, new Array[Long](cap), new Array[Double](cap))
    def reduce(b: TopKBuf, a: (Long, Double)): TopKBuf = append(b, a._1, a._2)
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      var acc = a
      var i = 0
      while (i < b.size) { acc = append(acc, b.ids(i), b.sims(i)); i += 1 }
      acc
    }
    def finish(b: TopKBuf): Seq[(Long, Double)] =
      sortedIdx(b).take(k).map(i => (b.ids(i), b.sims(i))).toSeq
    def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
  }

  /** Brute-force cosine top-k: for each query row, the k nearest corpus rows.
    * The query side is broadcast (small); the corpus is scanned once and
    * reduced through a bounded-heap Aggregator (no per-query full sort).
    * Ties break by vid ascending. Output: (qid, vid, sim). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val vidType = corpus.schema(idCol).dataType
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).cast(ArrayType(DoubleType)).as("_cv"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast(ArrayType(DoubleType)).as("_qv"))
    val pairs = c.crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("_qv"), col("_cv")))
      // zero-norm vectors give NaN cosine; Spark sorts NaN above every real
      // value desc, which would steal top-k slots
      .filter(!isnan(col("sim")))
      .select(col("qid"), col("vid").cast(LongType).as("vid"), col("sim"))
    val topk = udaf(new TopKAggregator(k), ExpressionEncoder[(Long, Double)]())
    pairs.groupBy(col("qid"))
      .agg(topk(col("vid"), col("sim")).as("_top"))
      .select(col("qid"), explode(col("_top")).as("_p"))
      .select(col("qid"), col("_p._1").cast(vidType).as("vid"), col("_p._2").as("sim"))
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
    * filter. Scales by bucket size, not corpus² — and bucket size itself is
    * capped at `maxBucketSize`: a degenerate bucket of m rows would emit
    * O(m²) pairs (boilerplate-heavy corpora routinely produce such buckets),
    * which is a straggler/OOM bomb at 100 TB. Rows in over-cap buckets are
    * excluded from candidate generation in that bucket; callers needing full
    * recall on hot buckets should re-bucket them with more bits. */
  def lshNearPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   minSim: Double, nBits: Int = 16, maxBucketSize: Int = 1000): DataFrame = {
    val b = lshBuckets(df, idCol, vecCol, dim, nBits)
      .select(col(idCol), col(vecCol).cast(ArrayType(DoubleType)).as("_v"), col("bucket"))
    // bucket histogram is small (≤ 2^nBits rows); AQE picks the join strategy
    val okBuckets = b.groupBy(col("bucket")).agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBucketSize).select(col("bucket"))
    val capped = b.join(okBuckets, Seq("bucket"))
    val l = capped.select(col(idCol).as("id_a"), col("_v").as("_va"), col("bucket"))
    val r = capped.select(col(idCol).as("id_b"), col("_v").as("_vb"), col("bucket"))
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

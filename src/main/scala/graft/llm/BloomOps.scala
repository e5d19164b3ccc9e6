package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{BloomBitsAgg, BloomContains, BloomWords, NgramBucketHashes}

/** Bounded-memory cross-corpus EXACT-dedup gate: a Bloom filter over
  * document fingerprints.
  *
  * The incremental-ingest problem [[TextOps.dedupAgainstCorpus]] solves for
  * NEAR-duplicates has an exact-match little sibling that dominates real
  * crawl pipelines by volume: "have we already ingested exactly this
  * document?" Joining each new crawl against the full historical fingerprint
  * set answers it exactly, but at 100 TB that join re-shuffles a
  * corpus-sized table every batch. The Bloom gate is the standard
  * bounded-memory trade: the historical corpus reduces ONCE to a fixed
  * m-bit array (1 GiB of bits ≈ 10⁹ docs at 1% false-positive rate with
  * k=7), the array broadcasts to every executor, and scoring a new batch is
  * a stateless map-only bit test — no join, no shuffle, no state, identical
  * in batch and streaming. False positives drop a few unique docs (tunable
  * via m/n); false negatives are IMPOSSIBLE — a true duplicate always
  * reports maybe_dup, so the gate never lets a known document back in.
  *
  * Scale design per stage:
  *  - build: one aggregation whose buffer IS the bit array
  *    ([[graft.functions.BloomBitsAgg]] — map-side combine sets bits
  *    partition-locally, merge is word-wise OR, order- and
  *    partitioning-invariant); only (fingerprint-derived positions) flow,
  *    text never leaves the scan projection;
  *  - persist: [[writeBloomModel]] stores (word_idx, word) rows +
  *    versioned meta, the rolling-crawl steady state (build once per
  *    corpus version, load per batch); [[BloomModel.union]] merges shard
  *    models (bitwise OR — exactly the distributive build);
  *  - score: [[graft.functions.BloomContains]] carries the array as a plan
  *    reference object — pure codegen projection, fuses into the scan.
  *
  * Determinism / oracle replay: position derivation is double hashing over
  * the [[SampleOps.hashBucket]] mixer — h1 mixes `fp mod P`, h2 mixes
  * `fp mod P2` (P2 a second prime), so the pair is sensitive to the full
  * 64-bit fingerprint (not just its low 31 bits), every intermediate stays
  * BIGINT-safe, and the DuckDB oracle replays positions — and therefore
  * every false positive — bit-for-bit ([[positionsSqlCtes]]).
  *
  * The fingerprint column is caller-supplied (any BIGINT). Production uses
  * `xxhash64` of the normalized text ([[TextOps.fingerprint]]); the
  * hash-gated driver rows use [[replayableFingerprint]], the rolling-hash
  * fold the oracle can replay in SQL.
  */
object BloomOps {

  import SampleOps.P
  private val Mult = 2654435761L % P // Knuth constant — MUST match SampleOps
  /** Second residue prime (2^31 − 19): h2's input is `fp mod P2`, so the
    * (h1, h2) pair distinguishes fingerprints up to lcm(P, P2) ≈ 2^62. */
  val P2 = 2147483629L

  /** Version stamp of the persisted model layout + position hash scheme.
    * A scheme change makes OLD bit arrays test garbage positions — silent
    * total false-negative/positive corruption — so [[loadBloomModel]]
    * fails fast on mismatch (the dedup-index discipline). */
  val BloomFormatVersion: Int = 1

  /** Plain-Scala twin of [[SampleOps.hashBucket]] (same constants, same
    * rounds); BloomOpsSpec pins the equality on randomized inputs. Used by
    * the scoring expression so the hot path allocates nothing. */
  def mix(id: Long, seed: Long): Long = {
    val s0 = ((seed % P) + P) % P
    var x = (((id % P) + P) % P * Mult + s0) % P
    var r = 0
    while (r < 3) { x = ((x ^ (x >> 16)) * 48271L) % P; r += 1 }
    x
  }

  def pmodP2(fp: Long): Long = ((fp % P2) + P2) % P2

  /** The k bit positions of a fingerprint — the single owner of the
    * position math (expression eval, Column form, and SQL replay all pin
    * against it). Double hashing: pos_i = (h1 + i·h2) mod mBits; max
    * intermediate P·k < 2^36, BIGINT-safe everywhere. */
  def positions(fp: Long, mBits: Long, k: Int, seed: Long): Array[Long] = {
    val h1 = mix(fp, seed)
    val h2 = mix(pmodP2(fp), seed + 1L)
    Array.tabulate(k)(i => (h1 + i.toLong * h2) % mBits)
  }

  /** Column twin of [[positions]]: unrolled pure-codegen arithmetic (k is
    * a literal — no HOF, no lambda). */
  def positionsCol(fp: Column, mBits: Long, k: Int, seed: Long): Column = {
    val h1 = SampleOps.hashBucket(fp, seed)
    val h2 = SampleOps.hashBucket(pmod(fp, lit(P2)), seed + 1L)
    array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % lit(mBits)): _*)
  }

  /** A built Bloom gate. `nItems` is the build-side row count (the fpp
    * estimate input); [[union]] sums it as an upper bound. */
  case class BloomModel(words: Array[Long], mBits: Long, k: Int, seed: Long,
                        nItems: Long) {
    require(words.length == (((mBits + 63L) >>> 6)).toInt,
      s"word array length ${words.length} does not match mBits $mBits")

    def mightContain(fp: Long): Boolean =
      BloomContains.contains(fp, asWords)

    private[graft] def asWords: BloomWords = new BloomWords(words, mBits, k, seed)

    /** Standard Bloom fpp estimate (1 − e^(−kn/m))^k. */
    def expectedFpp: Double =
      math.pow(1.0 - math.exp(-k.toDouble * nItems.toDouble / mBits.toDouble), k.toDouble)

    /** Merge two shard builds (bitwise OR) — exactly what building on the
      * unioned corpora produces, so rolling crawls can maintain per-epoch
      * shard models and fold them down. */
    def union(other: BloomModel): BloomModel = {
      require(mBits == other.mBits && k == other.k && seed == other.seed,
        s"cannot union Bloom models with different parameters: " +
          s"($mBits,$k,$seed) vs (${other.mBits},${other.k},${other.seed})")
      val out = new Array[Long](words.length)
      var i = 0
      while (i < words.length) { out(i) = words(i) | other.words(i); i += 1 }
      BloomModel(out, mBits, k, seed, nItems + other.nItems)
    }
  }

  /** The build aggregation as a plan (one row: word array + count) —
    * split out so PlanGuardSpec can pin its shape: only the k-position
    * array column leaves the scan projection (text never shuffles; the
    * only exchange carries the fixed-size partial word arrays). */
  private[graft] def buildPlan(corpus: DataFrame, fpCol: Column, mBits: Long,
                               k: Int, seed: Long): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    val B = org.apache.spark.sql.GraftExpressionBridge
    corpus
      .select(positionsCol(fpCol.cast(LongType), mBits, k, seed).as("_pos"))
      .agg(B.column(BloomBitsAgg(B.expression(col("_pos")), mBits)
        .toAggregateExpression()).as("_w"),
        // count the non-null position rows — the rows actually inserted —
        // so nItems (and expectedFpp) stay honest on nullable fingerprints
        count(col("_pos")).as("_n"))
  }

  /** Build the gate over a corpus's fingerprint column. ONE aggregation;
    * the single-row collect is the model itself (bounded: mBits/8 bytes,
    * caller-sized). */
  def buildBloom(corpus: DataFrame, fpCol: Column, mBits: Long, k: Int,
                 seed: Long): BloomModel = {
    val row = buildPlan(corpus, fpCol, mBits, k, seed).collect()(0)
    BloomModel(row.getSeq[Long](0).toArray, mBits, k, seed, row.getLong(1))
  }

  /** Production document fingerprint: `xxhash64` of the
    * case/whitespace-normalized text — 64-bit, fully codegen, the form
    * [[dedupAgainstCorpusExact]] and real pipelines use. (The driver rows
    * use [[replayableFingerprint]] instead because DuckDB cannot replay
    * xxhash64; the position machinery is fingerprint-agnostic.) */
  def productionFingerprint(textCol: Column): Column =
    xxhash64(regexp_replace(lower(trim(coalesce(textCol, lit("")))),
      "[ \\t\\n\\r\\f]+", " "))

  /** One-call exact cross-corpus gate (the TVF surface): build on the
    * reference corpus, flag every incoming row whose normalized text the
    * reference MAY already contain. Certain on true duplicates; false
    * positives at [[BloomModel.expectedFpp]] — size mBits accordingly. */
  def dedupAgainstCorpusExact(incoming: DataFrame, reference: DataFrame,
                              idCol: String, textCol: String,
                              mBits: Long = 1L << 24, k: Int = 7,
                              seed: Long = 0L): DataFrame = {
    val model = buildBloom(reference, productionFingerprint(col(textCol)),
      mBits, k, seed)
    dedupAgainstBloom(incoming, model, productionFingerprint(col(textCol)))
      .select(col(idCol), col(textCol), col("maybe_dup"))
  }

  /** Membership column: true = "maybe already in the corpus" (certain for
    * every fingerprint the build saw; false-positive at [[BloomModel.expectedFpp]]
    * for new ones). Map-only, no exchange, streaming-safe. */
  def mightContainCol(model: BloomModel, fp: Column): Column = {
    val B = org.apache.spark.sql.GraftExpressionBridge
    B.column(BloomContains(B.expression(fp.cast(LongType)), model.asWords))
  }

  /** Flag mode: annotate each incoming row with `maybe_dup`. */
  def dedupAgainstBloom(incoming: DataFrame, model: BloomModel, fpCol: Column,
                        out: String = "maybe_dup"): DataFrame =
    incoming.withColumn(out, mightContainCol(model, fpCol))

  /** Filter mode: keep only rows the gate has never seen. The false-positive
    * rate is the fraction of UNIQUE docs sacrificed — size mBits for the
    * corpus, it is the only tuning knob. A NULL fingerprint (unknown
    * content) is KEPT explicitly: the bare `!mightContain` would evaluate
    * to NULL and silently drop the row — neither flagged nor kept — which
    * is the wrong default for a gate whose one guarantee is "never lose a
    * unique document to anything but the sized fpp". */
  def filterAgainstBloom(incoming: DataFrame, model: BloomModel,
                         fpCol: Column): DataFrame =
    incoming.filter(coalesce(!mightContainCol(model, fpCol), lit(true)))

  /** Persist: (word_idx, word) rows — the layout scales to the largest
    * legal array without a giant single row — plus versioned meta. */
  def writeBloomModel(spark: SparkSession, model: BloomModel, path: String): Unit = {
    import spark.implicits._
    model.words.zipWithIndex.map { case (w, i) => (i, w) }.toSeq
      .toDF("word_idx", "word")
      .write.mode("overwrite").parquet(s"$path/words")
    Seq((model.mBits, model.k, model.seed, model.nItems, BloomFormatVersion))
      .toDF("m_bits", "k", "seed", "n_items", "format_version")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[writeBloomModel]] layout; fails fast on a format/hash-scheme
    * version mismatch (a mismatched array tests garbage positions and
    * corrupts the gate silently in BOTH directions). */
  def loadBloomModel(spark: SparkSession, path: String): BloomModel = {
    val meta = spark.read.parquet(s"$path/meta")
    require(meta.columns.contains("format_version"),
      s"bloom model at $path has no format_version — rebuild with writeBloomModel")
    val m = meta.select(col("m_bits"), col("k"), col("seed"), col("n_items"),
      col("format_version")).collect()(0)
    require(m.getInt(4) == BloomFormatVersion,
      s"bloom model at $path is format_version ${m.getInt(4)}, this build " +
        s"requires $BloomFormatVersion — rebuild with writeBloomModel")
    val words = spark.read.parquet(s"$path/words")
      .orderBy(col("word_idx"))
      .select(col("word")).collect().map(_.getLong(0))
    BloomModel(words, m.getLong(0), m.getInt(1), m.getLong(2), m.getLong(3))
  }

  /** Oracle-replayable 31-bit document fingerprint: the rolling-hash fold
    * `f ← (1000003·f + h) mod P` over the [[NgramBucketHashes]] token
    * hashes of the lowercased/trimmed text, from f₀ = seed mod P. The
    * token hashes are the native one-pass kernel; the outer fold runs per
    * TOKEN (not per char), and the whole chain replays in DuckDB as
    * `list_reduce` CTEs ([[replayableFingerprintSql]]). PRODUCTION gates
    * should fingerprint with `xxhash64(normalized text)` instead — 64-bit,
    * fully native — the position math upstream is fingerprint-agnostic;
    * this form exists so the driver rows can hash-gate the gate itself. */
  def replayableFingerprint(textCol: Column, seed: Long): Column = {
    val B = org.apache.spark.sql.GraftExpressionBridge
    val hashes = B.column(NgramBucketHashes(
      B.expression(lower(trim(coalesce(textCol, lit(""))))), 0, seed, bigrams = false))
    aggregate(hashes, lit(((seed % P) + P) % P),
      (a, h) => (a * lit(1000003L) + h) % lit(P))
  }

  /** DuckDB replay of [[replayableFingerprint]]: CTEs exposing `fpCol`
    * over `fromSql` (which must expose `textExpr`). */
  def replayableFingerprintSql(fromSql: String, textExpr: String, seed: Long,
                               prefix: String = "_fp"): (String, String) = {
    val s0 = ((seed % P) + P) % P
    val cte =
      s"""${prefix}tk AS (SELECT *, list_filter(string_split_regex(
         |    lower(trim(coalesce($textExpr, ''))), '[ \\t\\n\\r\\f]+'),
         |    x -> len(x) > 0) AS ${prefix}ts FROM $fromSql),
         |${prefix}th AS (SELECT *, list_transform(${prefix}ts,
         |    t -> list_reduce(list_prepend(CAST($seed AS BIGINT),
         |      list_transform(range(1, len(t) + 1), i -> CAST(ord(t[i:i]) AS BIGINT))),
         |      (a, c) -> (a * 131 + c) % $P)) AS ${prefix}hs FROM ${prefix}tk),
         |${prefix}v AS (SELECT *, list_reduce(list_prepend(CAST($s0 AS BIGINT), ${prefix}hs),
         |    (a, h) -> (a * 1000003 + h) % $P) AS ${prefix}val FROM ${prefix}th)""".stripMargin
    (cte, s"${prefix}val")
  }

  /** DuckDB replay of [[positions]]: CTEs over `fromSql` (which must
    * expose `fpExpr`), emitting one row per (input row, i ∈ [0, k)) with
    * position column `posCol`. Returns (cteSql, lastRelation, posCol). */
  def positionsSqlCtes(fromSql: String, fpExpr: String, mBits: Long, k: Int,
                       seed: Long, prefix: String = "_bp"): (String, String, String) = {
    val (cte1, h1) = SampleOps.hashBucketSqlCtes(fromSql, fpExpr, seed, prefix + "a")
    val (cte2, h2) = SampleOps.hashBucketSqlCtes(s"${prefix}a3",
      s"(($fpExpr) % $P2 + $P2) % $P2", seed + 1L, prefix + "b")
    val posRel = s"${prefix}pos"
    val cte =
      s"""$cte1, $cte2,
         |$posRel AS (SELECT *, ($h1 + i * $h2) % $mBits AS ${prefix}p
         |  FROM ${prefix}b3 CROSS JOIN (SELECT unnest(range(0, $k)) AS i) _ks)""".stripMargin
    (cte, posRel, s"${prefix}p")
  }
}

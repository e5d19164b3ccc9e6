package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding subword tokenizer — train + encode (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units",
  * the public BPE recipe every modern tokenizer descends from). The
  * whitespace/BPE-regex token counters elsewhere in this library
  * approximate a tokenizer; this op LEARNS one from the corpus, so token
  * budgets ([[MixOps]]) and packing ([[TextOps.packSequences]]) can run
  * against the vocabulary that will actually tokenize the training run.
  *
  * Distributed shape (the standard scale design): the corpus is read ONCE
  * into a word-frequency table (one map-side-combined aggregation, bounded
  * by the language's word-type count, not the corpus), and every merge
  * iteration runs on that types table alone — pair counting is a
  * types-table aggregation, the argmax is a 1-row bounded collect, and the
  * merge itself is a string `replace` over the types table. Iterates are
  * pinned ([[Pin]]) so iteration k does not re-execute the k−1 previous
  * merges.
  *
  * Determinism & oracle replay: a word's symbol state is its characters
  * wrapped in sentinel bytes (<0x01> … <0x02>) and space-joined. Applying
  * merge (a, b) is then literal non-overlapping left-to-right string
  * replacement of `wrap(a) + " " + wrap(b)` with `wrap(ab)` — exactly
  * BPE's greedy merge scan, with the sentinels making token boundaries
  * unambiguous: adjacent merge sites `a b a b` both fire (no trailing
  * space in the pattern), and a symbol that is a bare prefix/suffix of a
  * longer symbol cannot false-match (the <0x02>…<0x01> boundary breaks
  * it). Every engine's `replace` implements the same scan, so the whole
  * train loop replays in plain SQL. Ties in pair counts break by the
  * wrapped pair string ascending — binary string order, identical across
  * engines (<0x02> sorts below every printable byte, which keeps the
  * wrapped order consistent with the unwrapped one). */
object BpeOps {

  private val S1 = "\u0001" // token start sentinel
  private val S2 = "\u0002" // token end sentinel

  /** Lowercased whitespace words with the sentinel bytes scrubbed (they are
    * the internal markers, so input text must not carry them). */
  private def words(textCol: String): Column =
    filter(split(regexp_replace(lower(trim(col(textCol))), "[\u0001\u0002]", ""),
      "[ \\t\\n\\r\\f]+"), w => length(w) > 0)

  /** The word's characters, each sentinel-wrapped, joined by single spaces. */
  private def charState(w: Column): Column =
    array_join(transform(sequence(lit(1), length(w)),
      i => concat(lit(S1), w.substr(i, lit(1)), lit(S2))), " ")

  private def wrap(tok: String): String = S1 + tok + S2

  private def applyMerge(state: Column, left: String, right: String): Column =
    regexp_replace(state,
      java.util.regex.Pattern.quote(wrap(left) + " " + wrap(right)),
      java.util.regex.Matcher.quoteReplacement(wrap(left + right)))

  /** One learned merge: rank (1-based), the left/right symbols, the merged
    * symbol, and the pair's frequency-weighted count at merge time. */
  final case class BpeMerge(rank: Int, left: String, right: String,
                            merged: String, pair_count: Long)

  /** Train `numMerges` BPE merges on a corpus. Stops early when the best
    * remaining pair's count drops below `minPairFreq` (merging a pair seen
    * once cannot compress anything).
    *
    * Returns the ordered merge list; [[mergesToDf]] turns it into the
    * table shape. The per-iteration driver collect is ONE row (the argmax
    * pair) — bounded by construction, like ivfTrain's seed collect. */
  def bpeTrain(corpus: DataFrame, textCol: String, numMerges: Int,
               minPairFreq: Long = 2L): Seq[BpeMerge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairFreq >= 1, s"minPairFreq must be >= 1, got $minPairFreq")
    val types = corpus.select(explode(words(textCol)).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_freq"))
      .select(col("_freq"), charState(col("_w")).as("_sym"))
    var pin = Pin(types, eager = true)
    val acc = Seq.newBuilder[BpeMerge]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val best = pin.df
        .select(col("_freq"), split(col("_sym"), " ").as("_sy"))
        // single-symbol words carry no pairs (Spark's `sequence(1, 0)`
        // would run DESCENDING, not empty — filter them out first)
        .filter(size(col("_sy")) >= 2)
        // when-guard keeps the expression total even if an optimizer rule
        // (inferred isnotnull constraints) evaluates it before the filter
        .select(col("_freq"), explode(when(size(col("_sy")) >= 2, transform(
          sequence(lit(1), size(col("_sy")) - 1),
          i => concat(element_at(col("_sy"), i), lit(" "),
            element_at(col("_sy"), i + 1))))
          .otherwise(array().cast(ArrayType(StringType))))
          .as("_p"))
        .groupBy(col("_p")).agg(sum(col("_freq")).as("_cnt"))
        .orderBy(col("_cnt").desc, col("_p").asc)
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(1) < minPairFreq) done = true
      else {
        val Array(wa, wb) = best.head.getString(0).split(' ')
        val (a, b) = (wa.substring(1, wa.length - 1), wb.substring(1, wb.length - 1))
        acc += BpeMerge(r, a, b, a + b, best.head.getLong(1))
        val next = pin.df.withColumn("_sym", applyMerge(col("_sym"), a, b))
        val np = Pin(next, eager = true)
        pin.release()
        pin = np
        r += 1
      }
    }
    pin.release()
    acc.result()
  }

  /** Unsigned lexicographic UTF-8 byte order — the order Spark's UTF8String
    * (and DuckDB's BLOB-backed VARCHAR) sorts strings in, so the driver-side
    * tie-break below agrees with the SQL loop's `ORDER BY _p ASC` even for
    * astral-plane codepoints (where Java's UTF-16 compareTo disagrees). */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** Code-point symbols of a word (Spark's substr/length are code-point
    * based, so the driver state must split the same way). */
  private def codePointSyms(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Left-to-right non-overlapping merge scan — the same replacement rule
    * as [[applyMerge]]'s literal string replace. */
  private def mergeWord(syms: Array[String], a: String, b: String,
                        ab: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += ab; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Production-scale BPE training: ONE Spark job (the corpus-sized
    * word-frequency aggregation — the only stage whose cost grows with the
    * corpus), then the entire merge loop runs driver-side over the
    * collected types table with incrementally-maintained pair counts.
    * Identical output to [[bpeTrain]] (BpeOpsSpec pins equality, including
    * count ties and multi-byte symbols): same greedy argmax, same
    * UTF-8-binary tie-break on the sentinel-wrapped pair, same
    * left-to-right non-overlapping merge scan, same `minPairFreq` early
    * stop.
    *
    * Scale design: [[bpeTrain]] schedules one Spark job PER MERGE — fine
    * at demo merge counts, hours of pure scheduling overhead at a
    * production 30k-merge vocabulary. The types table is bounded by the
    * language's word-type count (~10⁶ rows × avg word length for clean
    * text — a driver-sized collect, same order as the IVF seed or BM25
    * query-vocab collects), and each merge then touches only the words
    * containing the merged pair via an inverted pair→word index. The
    * argmax is a lazy max-heap keyed (count, wrapped-pair UTF-8) with
    * stale-entry discard — O(log #pairs) per update instead of a full
    * pair-map scan per merge (30k merges on a web-scale pair map would
    * otherwise cost O(#pairs × merges) ≈ 10¹⁰ comparisons). The all-SQL
    * [[bpeTrain]] loop remains the oracle-replay mode.
    *
    * Raw 100 TB web text (URLs, hex hashes, typos) can push word types to
    * 10⁸⁺ — past any driver. `minWordFreq` drops types below a corpus
    * frequency floor BEFORE the collect and `maxTypes` caps the table to
    * the most frequent types (ties by word ascending — deterministic, a
    * bounded TakeOrdered, never a global sort). Both default to "keep
    * everything" (exact [[bpeTrain]] equality); with a floor of even 2,
    * hapax garbage — the bulk of raw-web type inventory — never reaches
    * the driver, at the cost of excluding those occurrences from the pair
    * statistics (the standard corpus-BPE trade, Sennrich et al. §3). */
  def bpeTrainLocal(corpus: DataFrame, textCol: String, numMerges: Int,
                    minPairFreq: Long = 2L, minWordFreq: Long = 1L,
                    maxTypes: Int = Int.MaxValue): Seq[BpeMerge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairFreq >= 1, s"minPairFreq must be >= 1, got $minPairFreq")
    require(minWordFreq >= 1, s"minWordFreq must be >= 1, got $minWordFreq")
    require(maxTypes >= 1, s"maxTypes must be >= 1, got $maxTypes")
    val counted = corpus.select(explode(words(textCol)).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_freq"))
      .filter(col("_freq") >= minWordFreq)
    val bounded =
      if (maxTypes == Int.MaxValue) counted
      else counted.orderBy(col("_freq").desc, col("_w").asc).limit(maxTypes)
    val types: Array[(String, Long)] =
      bounded.collect().map(r => r.getString(0) -> r.getLong(1))
    val syms = types.map { case (w, _) => codePointSyms(w) }
    val freqs = types.map(_._2)
    val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairIdx =
      scala.collection.mutable.HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    def wrappedKey(p: (String, String)): String = wrap(p._1) + " " + wrap(p._2)
    // lazy max-heap over (count, wrapped-pair key): every count change
    // pushes a fresh entry; pops validate against pairCnt and discard stale
    // ones. The heap always contains each pair's CURRENT (count, pair)
    // entry, so the top valid entry is the greedy argmax with the exact
    // utf8-ascending tie-break of the SQL loop's ORDER BY _cnt DESC, _p ASC.
    final case class HeapEntry(count: Long, key: String, pair: (String, String))
    val heapOrd: Ordering[HeapEntry] = (x: HeapEntry, y: HeapEntry) =>
      if (x.count != y.count) java.lang.Long.compare(x.count, y.count)
      // smaller utf8 key must win among equal counts → rank it higher
      else if (x.key == y.key) 0
      else if (utf8Less(x.key, y.key)) 1
      else -1
    val heap = scala.collection.mutable.PriorityQueue.empty[HeapEntry](heapOrd)
    def bump(p: (String, String), d: Long): Unit = {
      val nv = pairCnt.getOrElse(p, 0L) + d
      if (nv <= 0L) pairCnt.remove(p)
      else {
        pairCnt(p) = nv
        heap.enqueue(HeapEntry(nv, wrappedKey(p), p))
      }
    }
    def pairsOf(s: Array[String]): Iterator[(String, String)] =
      if (s.length < 2) Iterator.empty
      else (0 until s.length - 1).iterator.map(j => (s(j), s(j + 1)))
    var i = 0
    while (i < syms.length) {
      pairsOf(syms(i)).foreach { p =>
        bump(p, freqs(i))
        pairIdx.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
      }
      i += 1
    }
    val acc = Seq.newBuilder[BpeMerge]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      var best: (String, String) = null
      var bestCnt = 0L
      while (best == null && heap.nonEmpty) {
        val top = heap.dequeue()
        if (pairCnt.getOrElse(top.pair, 0L) == top.count) {
          best = top.pair; bestCnt = top.count
          // the argmax stays current: re-enqueue so the next merge can see
          // it again if its count is unchanged
          heap.enqueue(top)
        }
      }
      if (best == null || bestCnt < minPairFreq) done = true
      else {
        val (a, b) = best
        val ab = a + b
        acc += BpeMerge(r, a, b, ab, bestCnt)
        val affected = pairIdx.getOrElse(best, scala.collection.mutable.Set.empty).toArray
        affected.foreach { wi =>
          val old = syms(wi)
          val oldPairs = pairsOf(old).toArray
          oldPairs.foreach(bump(_, -freqs(wi)))
          val nw = mergeWord(old, a, b, ab)
          syms(wi) = nw
          val newPairs = pairsOf(nw).toArray
          newPairs.foreach { p =>
            bump(p, freqs(wi))
            pairIdx.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
          }
          val newSet = newPairs.toSet
          oldPairs.foreach { p =>
            if (!newSet.contains(p))
              pairIdx.get(p).foreach { s => s -= wi; if (s.isEmpty) pairIdx.remove(p) }
          }
        }
        r += 1
      }
    }
    acc.result()
  }

  /** The merge list as a DataFrame (rank, left, right, merged, pair_count). */
  def mergesToDf(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[BpeMerge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Encode documents with an ordered merge list: every word re-derives its
    * character state and replays the merges in rank order (the standard
    * encode rule). Output columns: `{out}` (ARRAY<STRING> subwords in
    * order, sentinels stripped) and `{out}_count`. Pure codegen string work
    * per row — the corpus never shuffles; the merge list compiles into the
    * plan as `numMerges` stacked literal replaces (right for the moderate
    * merge counts this op targets; a production 30k-merge vocabulary would
    * tokenize in a dedicated kernel instead — documented deviation). */
  def bpeEncode(df: DataFrame, textCol: String, merges: Seq[BpeMerge],
                out: String = "bpe_tokens"): DataFrame = {
    val encoded = transform(words(textCol), w =>
      split(merges.foldLeft(charState(w)) { (state, m) =>
        applyMerge(state, m.left, m.right)
      }, " "))
    val cleaned = transform(flatten(encoded),
      t => regexp_replace(t, "[\u0001\u0002]", ""))
    df.withColumn(out, cleaned)
      .withColumn(s"${out}_count", size(col(out)).cast(LongType))
  }

  /** Production-scale encode: same output as [[bpeEncode]] (BpeOpsSpec
    * pins equality), but the merge list rides as a pair→rank lookup inside
    * ONE native expression ([[graft.functions.BpeEncodeWord]]) instead of
    * `numMerges` stacked literal regex replaces — the plan no longer grows
    * with the vocabulary, so a 30k-merge production tokenizer encodes in
    * one map-only pass (the dedicated kernel the [[bpeEncode]] scaladoc
    * promised). Tokenization (lowercase, sentinel scrub, whitespace split)
    * stays in the same declarative `words` projection, so the two paths
    * cannot drift on word boundaries. */
  def bpeEncodeFast(df: DataFrame, textCol: String, merges: Seq[BpeMerge],
                    out: String = "bpe_tokens"): DataFrame = {
    val B = org.apache.spark.sql.GraftExpressionBridge
    val ranks = graft.functions.BpeEncodeWord.ranksOf(
      merges.sortBy(_.rank).map(m => (m.left, m.right)))
    val encoded = flatten(transform(words(textCol), w =>
      B.column(graft.functions.BpeEncodeWord(B.expression(w), ranks))))
    df.withColumn(out, encoded)
      .withColumn(s"${out}_count", size(col(out)).cast(LongType))
  }

  /** One-call form: train on the corpus, encode the corpus — the
    * self-tokenization shape used for vocabulary studies and exact token
    * budgeting. Runs the production paths ([[bpeTrainLocal]] +
    * [[bpeEncodeFast]]); both are parity-pinned equal to the replay forms,
    * so the SQL TVF surface scales to real merge counts for free. */
  def bpeSelfEncode(df: DataFrame, textCol: String, numMerges: Int,
                    minPairFreq: Long = 2L,
                    out: String = "bpe_tokens"): DataFrame =
    bpeEncodeFast(df, textCol, bpeTrainLocal(df, textCol, numMerges, minPairFreq), out)
}

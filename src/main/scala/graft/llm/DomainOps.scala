package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** URL/domain-level corpus curation: host extraction, blocklist/allowlist
  * filtering with dot-boundary suffix matching, and a deterministic
  * per-domain document cap.
  *
  * Web-crawl curation pipelines group and police documents by the host they
  * came from (domain blocklists, per-site quotas so no single domain
  * dominates the training mix). These ops complement the content-level
  * family in [[TextOps]]/[[SampleOps]] and follow the same two design
  * rules:
  *
  *   - '''pure codegen where possible''': host extraction and suffix
  *     generation are `regexp_extract`/`split`/`transform` column
  *     expressions (no UDF), so they stay inside whole-stage codegen and
  *     the DuckDB oracle can replay them;
  *   - '''no corpus-sized sorts or windows''': the per-domain cap is NOT a
  *     `row_number()` window partitioned by domain — a mega-domain (one
  *     site being 10% of a crawl is common) would funnel through a single
  *     task's sort. Instead a bounded-heap Aggregator reduces each domain
  *     to its cap-th smallest (hash, id) pair map-side, and the tiny
  *     per-domain threshold table joins back as a plain filter.
  */
object DomainOps {

  /** Authority grammar handled: `[scheme:]//` or nothing, then
    * `[user[:pw]@]host[:port][/path…]`. The scheme (or protocol-relative
    * `//`) prefix is stripped first so a bare `host:port` is not misread as
    * `scheme:port`. Both patterns are RE2-compatible (no lookaround, no
    * backreferences) so the DuckDB oracle runs the identical regexes. */
  val SchemePrefixPattern = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//"
  val HostPattern = "^(?:[^/?#@]*@)?([^/?#:]+)"

  /** Suffix matching depth: only the last `MaxLabels` dot-separated labels
    * of a host participate in list matching, bounding the explode fan-out
    * (and the per-row string work) on adversarial many-dot hosts.
    * Registrable domains are ≤5 labels in practice. */
  val MaxLabels = 8

  /** Extract the lowercased host from a URL column, dropping one leading
    * `www.` label; yields NULL when nothing host-like is present. Pure
    * codegen (regexp_extract + regexp_replace), no UDF. */
  def extractDomain(df: DataFrame, urlCol: String, out: String = "domain"): DataFrame = {
    val host = lower(regexp_extract(
      regexp_replace(col(urlCol), SchemePrefixPattern, ""), HostPattern, 1))
    val noWww = regexp_replace(host, "^www\\.", "")
    df.withColumn(out, when(noWww === "", lit(null)).otherwise(noWww))
  }

  /** Query parameters dropped by [[canonicalizeUrl]] — the common tracking
    * decorations that make one page look like many distinct URLs to an
    * exact-dedup pass. Anchored, RE2-safe. */
  val TrackingParamPattern = "^(utm_[a-zA-Z0-9_]+|gclid|fbclid|msclkid|ref)="

  /** Canonicalize a URL for identity/dedup purposes: strip the fragment,
    * drop tracking query parameters ([[TrackingParamPattern]]), lowercase
    * the scheme://host prefix (paths stay case-sensitive), strip the
    * scheme's default port (`:80` for http, `:443` for https), and strip a
    * single trailing slash from the path. A crawl that stores one canonical
    * URL per page can exact-dedup re-crawled pages whose URLs differ only
    * in tracking noise. Pure codegen column expressions (split/regexp/
    * higher-order filter), no UDF — replayable by the SQL oracle. */
  def canonicalizeUrl(df: DataFrame, urlCol: String,
                      out: String = "url_canonical"): DataFrame = {
    val u = col(urlCol)
    val noFrag = regexp_replace(u, "#.*", "")
    val base0 = substring_index(noFrag, "?", 1)
    val query = when(noFrag.contains("?"),
      noFrag.substr(length(base0) + 2, length(noFrag))).otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => !p.rlike(TrackingParamPattern) && length(p) > 0)
    val qs = array_join(params, "&")
    // strip ONE trailing slash when it follows a non-slash (so a bare
    // protocol-relative "//" is never collapsed)
    val base1 = when(base0.rlike("[^/]/$"), regexp_replace(base0, "/$", ""))
      .otherwise(base0)
    val schemeHost = regexp_extract(base1, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", 0)
    val rest = base1.substr(length(schemeHost) + 1, length(base1))
    val shLower = lower(schemeHost)
    val shNoPort = when(shLower.startsWith("http://"), regexp_replace(shLower, ":80$", ""))
      .when(shLower.startsWith("https://"), regexp_replace(shLower, ":443$", ""))
      .otherwise(shLower)
    val canon = concat(shNoPort, rest,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit("")))
    df.withColumn(out, when(u.isNull, lit(null)).otherwise(canon))
  }

  /** All dot-boundary suffixes of a host, deepest `MaxLabels` only:
    * `a.b.co.uk` → `[a.b.co.uk, b.co.uk, co.uk, uk]`. A blocklist entry
    * matches a host iff it equals one of these — i.e. matches the host
    * itself or any parent domain, never a substring (`xexample.com` is NOT
    * matched by `example.com`). Array expression, no UDF. */
  def domainSuffixes(host: Column): Column = {
    val all = split(host, "\\.")
    val n = size(all)
    val labels = when(n > MaxLabels, slice(all, n - MaxLabels + 1, lit(MaxLabels)))
      .otherwise(all)
    val m = size(labels)
    transform(sequence(lit(1), m), i => array_join(slice(labels, i, m - i + 1), "."))
  }

  /** Keep (`mode="allow"`) or drop (`mode="block"`) every document whose
    * domain — or any parent domain at a dot boundary — appears in `domains`
    * (a one-column DataFrame; values are lowercased and deduped here).
    *
    * Scale shape: the fan-out branch carries ONLY (id, suffix) — ≤
    * [[MaxLabels]] narrow rows per document, column pruning keeps the text
    * out of it — and semi-joins against the (broadcast by default) list.
    * The surviving id set then anti/semi-joins back onto the full rows, so
    * document payloads are never exploded or shuffled by suffix. With
    * `broadcastList=false` (very large lists) both joins fall back to
    * shuffle joins and AQE handles skew. */
  def filterByDomainList(df: DataFrame, idCol: String, domainCol: String,
                         domains: DataFrame, mode: String = "block",
                         broadcastList: Boolean = true): DataFrame = {
    require(mode == "block" || mode == "allow", s"mode must be block|allow, got '$mode'")
    val listCol = domains.columns.headOption.getOrElse(
      throw new IllegalArgumentException("domain list needs one column"))
    val list0 = domains.select(lower(col(listCol)).as("_gd_list")).distinct()
    val list = if (broadcastList) broadcast(list0) else list0
    val matchedIds = df
      .select(col(idCol), explode(domainSuffixes(lower(col(domainCol)))).as("_gd_suf"))
      .join(list, col("_gd_suf") === col("_gd_list"), "left_semi")
      .select(col(idCol)).distinct()
    df.join(matchedIds, Seq(idCol), if (mode == "block") "left_anti" else "left_semi")
  }

  /** Aggregator buffer: the `size` smallest (bucket, id) pairs seen so far
    * (lexicographic), padded arrays of capacity 2·cap+1. */
  final case class MinKBuf(size: Int, buckets: Array[Long], ids: Array[Long])

  /** Bounded-heap k-smallest accumulator over (bucket, id) pairs — the
    * same compact-at-2k device as SimilarityOps.TopKAggregator, ordered
    * ascending. `finish` returns the k-th smallest pair (the cap
    * threshold), or (Long.MaxValue, Long.MaxValue) when fewer than k pairs
    * exist (every row passes the threshold filter). Memory is O(cap) per
    * domain and partials combine map-side, so no domain — however skewed —
    * is ever sorted whole. */
  private final class KSmallestPairAgg(k: Int)
      extends Aggregator[(Long, Long), MinKBuf, (Long, Long)] {
    private val cap = 2 * k + 1

    private def sortedIdx(b: MinKBuf): Array[Int] =
      Array.range(0, b.size).sortBy(i => (b.buckets(i), b.ids(i)))

    private def compact(b: MinKBuf): MinKBuf = {
      if (b.size <= k) return b
      val order = sortedIdx(b).take(k)
      val bk = new Array[Long](cap)
      val id = new Array[Long](cap)
      var i = 0
      while (i < order.length) { bk(i) = b.buckets(order(i)); id(i) = b.ids(order(i)); i += 1 }
      MinKBuf(order.length, bk, id)
    }

    private def append(b0: MinKBuf, bucket: Long, vid: Long): MinKBuf = {
      val b = if (b0.buckets.length < cap)
        MinKBuf(b0.size, java.util.Arrays.copyOf(b0.buckets, cap),
          java.util.Arrays.copyOf(b0.ids, cap))
      else b0
      val c = if (b.size >= cap) compact(b) else b
      c.buckets(c.size) = bucket
      c.ids(c.size) = vid
      MinKBuf(c.size + 1, c.buckets, c.ids)
    }

    def zero: MinKBuf = MinKBuf(0, new Array[Long](cap), new Array[Long](cap))
    def reduce(b: MinKBuf, a: (Long, Long)): MinKBuf = append(b, a._1, a._2)
    def merge(a: MinKBuf, b: MinKBuf): MinKBuf = {
      var acc = a
      var i = 0
      while (i < b.size) { acc = append(acc, b.buckets(i), b.ids(i)); i += 1 }
      acc
    }
    def finish(b: MinKBuf): (Long, Long) = {
      if (b.size < k) (Long.MaxValue, Long.MaxValue)
      else { val i = sortedIdx(b)(k - 1); (b.buckets(i), b.ids(i)) }
    }
    def bufferEncoder: Encoder[MinKBuf] = ExpressionEncoder()
    def outputEncoder: Encoder[(Long, Long)] = ExpressionEncoder()
  }

  /** Keep at most `cap` documents per domain, chosen deterministically: the
    * cap smallest values of `SampleOps.hashBucket(seed, id)` (ties broken
    * by id) win, so the survivor set is reproducible across runs, cluster
    * sizes, and re-partitioning — and is a strict subset of any larger
    * cap's survivors with the same seed. NULL domains form one capped group
    * (null-safe join), matching `PARTITION BY domain` oracle semantics.
    *
    * `idCol` must be integral and unique (the hash input and tiebreak).
    *
    * Scale shape: `groupBy(domain).agg(k-smallest aggregator)` partial-
    * aggregates map-side to one O(cap) buffer per domain per task — the
    * shuffle carries buffers, not rows, and no task sorts a whole domain
    * (the window-partitioned-by-domain alternative dies on mega-domain
    * skew). The resulting one-row-per-domain threshold table joins back
    * broadcast by default; set `broadcastThresholds=false` when the domain
    * count itself is huge and let AQE's skew handling take the shuffle
    * join. */
  def capPerDomain(df: DataFrame, idCol: String, domainCol: String, cap: Int,
                   seed: Long, broadcastThresholds: Boolean = true): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val bucket = SampleOps.hashBucket(col(idCol), seed)
    val kSmallest = udaf(new KSmallestPairAgg(cap), ExpressionEncoder[(Long, Long)]())
    val thresholds0 = df
      .select(col(domainCol).as("_gd_dom"), bucket.as("_gd_b"),
        col(idCol).cast(LongType).as("_gd_i"))
      .groupBy(col("_gd_dom"))
      .agg(kSmallest(col("_gd_b"), col("_gd_i")).as("_gd_th"))
      .select(col("_gd_dom"), col("_gd_th._1").as("_gd_tb"), col("_gd_th._2").as("_gd_ti"))
    val thresholds = if (broadcastThresholds) broadcast(thresholds0) else thresholds0
    df.join(thresholds, df(domainCol) <=> thresholds("_gd_dom"), "left")
      .drop("_gd_dom")
      .filter(bucket < col("_gd_tb") ||
        (bucket === col("_gd_tb") && col(idCol).cast(LongType) <= col("_gd_ti")))
      .drop("_gd_tb", "_gd_ti")
  }
}

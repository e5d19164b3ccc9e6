package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{DomainOps, SampleOps}

/** Domain-level curation ops: host extraction grammar, dot-boundary suffix
  * matching, and the deterministic per-domain cap (vs a brute-force
  * row_number reference, partition invariance, nesting, no-window plan). */
class DomainOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-domain-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("extractDomain handles scheme/userinfo/port/path/www/bare forms") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "https://www.Example.COM/path?q=1#f" -> "example.com",
      "http://user:pw@sub.example.org:8080/p" -> "sub.example.org",
      "example.net/x#frag" -> "example.net",
      "ftp://files.example.co.uk" -> "files.example.co.uk",
      "https://example.io" -> "example.io",
      "www.example.dev" -> "example.dev",
      "//cdn.example.com/asset.js" -> "cdn.example.com",
      "https://example.com:443" -> "example.com")
    val df = cases.map(_._1).toDF("url")
    val got = DomainOps.extractDomain(df, "url").select("url", "domain")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (url, want) =>
      assert(got(url) == want, s"extractDomain($url)") }
    // nothing host-like → NULL
    val none = DomainOps.extractDomain(Seq("///", "?q=1").toDF("url"), "url")
      .filter(col("domain").isNotNull).count()
    assert(none == 0)
  }

  test("suffix matching is dot-boundary only (no substring matches)") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "ads.example.com"),   // parent match
      (2L, "example.com"),       // exact match
      (3L, "xexample.com"),      // substring — must NOT match
      (4L, "example.com.evil"),  // prefix, not suffix — must NOT match
      (5L, "safe.org")).toDF("id", "domain")
    val list = Seq("example.com").toDF("domain")
    val kept = DomainOps.filterByDomainList(docs, "id", "domain", list, "block")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
    val allowed = DomainOps.filterByDomainList(docs, "id", "domain", list, "allow")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(allowed == Set(1L, 2L))
  }

  test("block and allow partition the corpus; list matching is case-insensitive") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 200L).map(i => (i, s"site$i.example${i % 7}.com"))
      .toDF("id", "domain")
    val list = Seq("EXAMPLE3.com", "site11.example4.COM").toDF("d")
    val blocked = DomainOps.filterByDomainList(docs, "id", "domain", list, "block")
      .collect().map(_.getLong(0)).toSet
    val allowed = DomainOps.filterByDomainList(docs, "id", "domain", list, "allow")
      .collect().map(_.getLong(0)).toSet
    assert(blocked.intersect(allowed).isEmpty)
    assert(blocked.size + allowed.size == 200)
    assert(allowed.contains(11L) && allowed.contains(3L) && !allowed.contains(2L))
  }

  test("capPerDomain matches the row_number reference and is partition-invariant") {
    val sp = spark
    import sp.implicits._
    // skewed corpus: domain d0 has 500 docs, others 20
    val rows = (0L until 500L).map(i => (i, "d0")) ++
      (0 until 5).flatMap(d => (0 until 20).map(j => (1000L + d * 100 + j, s"d${d + 1}")))
    val df = rows.toDF("id", "domain")
    val cap = 30
    val got = DomainOps.capPerDomain(df, "id", "domain", cap, seed = 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    // brute-force reference: smallest (hashBucket, id) pairs per domain
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("domain"))
      .orderBy(SampleOps.hashBucket(col("id"), 7L), col("id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.count(rows.take(500).map(_._1).toSet) == cap, "d0 capped exactly")
    assert(got.count(_ >= 1000L) == 100, "small domains keep all rows")
    // invariant under physical layout
    val again = DomainOps.capPerDomain(df.repartition(17), "id", "domain", cap, 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("caps nest and NULL domains form one capped group") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) null else "d"))
      .toDF("id", "domain")
    val small = DomainOps.capPerDomain(df, "id", "domain", 10, 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = DomainOps.capPerDomain(df, "id", "domain", 25, 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "same-seed caps must nest")
    assert(small.count(_ % 2 == 0) == 10 && small.count(_ % 2 == 1) == 10,
      "NULL domain group is capped like any other")
  }

  test("capPerDomain plan has no Window and aggregates before the join") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 50L).map(i => (i, s"d${i % 3}")).toDF("id", "domain")
    val plan = DomainOps.capPerDomain(df, "id", "domain", 5, 1L)
      .queryExecution.executedPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, "per-domain cap must not sort domains through a window")
    val hasBroadcast = plan.toString.contains("BroadcastHashJoin") ||
      plan.toString.contains("BroadcastNestedLoopJoin")
    assert(hasBroadcast, "threshold table should broadcast by default")
  }
}

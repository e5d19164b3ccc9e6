package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{ClassifierOps, TextOps}

/** Batch-19 curation ops: the hashed Naive-Bayes quality gate,
  * partial-overlap (Jaccard) decontamination, and HTML stripping. */
class ClassifierOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-classifier-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def labeledCorpus = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, "the curated essay reads with care and insight", true),
      (2L, "another careful insight filled essay with depth", true),
      (3L, "thoughtful analysis with careful depth and care", true),
      (4L, "buy cheap pills now click here free offer", false),
      (5L, "click now free pills cheap offer buy here", false),
      (6L, "free free cheap click offer now buy pills", false)
    ).toDF("id", "text", "label")
  }

  test("nbTrain model is bounded and carries fallback + prior marker rows") {
    val model = ClassifierOps.nbTrain(labeledCorpus, "text", "label",
      numBuckets = 32, alpha = 0.5, seed = 3).cache()
    val n = model.count()
    assert(n <= 32 + 2, s"model must be bounded by numBuckets + 2 markers, got $n")
    assert(model.filter(col("bucket").isNull).count() == 1)
    assert(model.filter(col("bucket") === -1L).count() == 1)
    // balanced classes -> prior llr = ln((3+1)/(3+1)) = 0
    val prior = model.filter(col("bucket") === -1L).select("llr").head.getDouble(0)
    assert(prior == 0.0, s"balanced prior must be 0, got $prior")
    model.unpersist()
  }

  test("nbScore separates planted classes and generalizes to unseen docs") {
    val sp = spark
    import sp.implicits._
    val model = ClassifierOps.nbTrain(labeledCorpus, "text", "label",
      numBuckets = 256, alpha = 0.5, seed = 3)
    val unseen = Seq(
      (10L, "a careful essay with insight and depth"),
      (11L, "cheap pills free click buy offer"),
      (12L, "")
    ).toDF("id", "text")
    val scored = ClassifierOps.nbScore(unseen, "id", "text", model,
      numBuckets = 256, seed = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(scored(10L)._3, s"quality doc must score positive, got ${scored(10L)}")
    assert(!scored(11L)._3, s"spam doc must score negative, got ${scored(11L)}")
    // empty doc: zero tokens, score = prior alone (balanced -> 0, pred false)
    assert(scored(12L)._1 == 0L && scored(12L)._2 == 0.0 && !scored(12L)._3,
      s"empty doc must carry the bare prior, got ${scored(12L)}")
  }

  test("nbScore is partition-invariant") {
    val sp = spark
    import sp.implicits._
    val docs = Seq.tabulate(40)(i => (i.toLong,
      if (i % 2 == 0) s"careful essay $i with insight" else s"cheap pills $i click free"))
      .toDF("id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      ClassifierOps.nbQualityFilter(df, "id", "text",
          labeledCorpus, "text", "label", numBuckets = 128, alpha = 0.5, seed = 7)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(run(docs.repartition(1)) == run(docs.repartition(7)))
  }

  test("nbScoreBroadcast scores null text as the empty document, matching nbScore") {
    val sp = spark
    import sp.implicits._
    val model = ClassifierOps.nbTrain(labeledCorpus, "text", "label",
      numBuckets = 128, alpha = 0.5, seed = 7)
    val docs = Seq((1L, Option("careful essay with insight")),
      (2L, Option.empty[String]), (3L, Option(""))).toDF("id", "text")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "n_tokens", "nb_score", "nb_pred").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // the joins form is the executable SPECIFICATION; the public nbScore
    // delegates to the broadcast scorer, so pin all three pairwise
    val batch = snap(ClassifierOps.nbScoreJoins(docs, "id", "text", model, 128, 7))
    // the broadcast scorer used to NPE here (null Seq into the scalar UDF —
    // a streaming micro-batch crash); it must emit the batch path's
    // empty-document score instead
    val stream = snap(ClassifierOps.nbScoreBroadcast(docs, "text", model, 128, 7)
      .select(col("id"), col("n_tokens"), col("nb_score"), col("nb_pred")))
    assert(stream == batch, s"joins $batch vs broadcast $stream")
    val public = snap(ClassifierOps.nbScore(docs, "id", "text", model, 128, 7))
    assert(public == batch, s"public $public vs joins $batch")
    assert(batch(2L)._1 == 0L && batch(2L) == batch(3L),
      "null text ≡ empty text ≡ zero tokens (score = prior)")
  }

  test("jaccardContamination scores exact copies 1.0, partial overlaps in between") {
    val sp = spark
    import sp.implicits._
    val mk = (tag: String, n: Int) => (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (1L, mk("alpha", 20)),            // verbatim in benchmark
      (2L, mk("alpha", 12)),            // prefix of bench doc -> partial overlap
      (3L, mk("gamma", 20)),            // disjoint
      (4L, "too short")                 // < n tokens -> no grams
    ).toDF("id", "text")
    val bench = Seq((100L, mk("alpha", 20))).toDF("bid", "text")
    val rows = TextOps.jaccardContamination(corpus, bench, "id", "bid", "text",
        n = 5, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(rows(1L) == ((16L, 1.0, false)), s"got ${rows(1L)}")
    // doc 2 = first 12 tokens: 8 of its grams are among bench's 16
    val (n2, j2, keep2) = rows(2L)
    assert(n2 == 8L && j2 == 8.0 / 16.0 && keep2 == false, s"got ${rows(2L)}")
    assert(rows(3L) == ((16L, 0.0, true)), s"got ${rows(3L)}")
    assert(rows(4L) == ((0L, 0.0, true)), s"got ${rows(4L)}")
  }

  test("htmlStrip removes script/style/comments, decodes entities, keeps prose") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "<div class=\"x\"><p>Hello &amp; goodbye</p></div><script>var a = 1 < 2;</script>"),
      (2L, "plain text stays"),
      (3L, "<ul><li>one</li><li>two</li></ul><style>p{color:red}</style>"),
      (4L, "a &lt;tag&gt; literal &quot;q&quot; &#39;s&#39; and a&nbsp;b"),
      (5L, "<P ALIGN=left>case insensitive</P><!-- gone -->")
    ).toDF("id", "text")
    val out = TextOps.htmlStrip(docs, "text").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "Hello & goodbye", s"got '${out(1L)}'")
    assert(out(2L) == "plain text stays")
    assert(out(3L) == "one\ntwo", s"got '${out(3L)}'")
    assert(out(4L) == "a <tag> literal \"q\" 's' and a b", s"got '${out(4L)}'")
    assert(out(5L) == "case insensitive", s"got '${out(5L)}'")
    // double-encoded entities cannot smuggle a tag past removal
    val tricky = Seq((9L, "&amp;lt;script&amp;gt; stays text")).toDF("id", "text")
    val t9 = TextOps.htmlStrip(tricky, "text").collect().head.getString(2)
    assert(t9 == "&lt;script&gt; stays text", s"got '$t9'")
  }

  test("the batch-19 ops are SQL-callable as table macros (registry route)") {
    val sp = spark
    import sp.implicits._
    graft.sql.Register.registerAll(sp)
    labeledCorpus.createOrReplaceTempView("lab")
    Seq((1L, "careful essay insight"), (2L, "cheap pills click"))
      .toDF("id", "text").createOrReplaceTempView("docs")
    val preds = sp.sql(
      "SELECT id, nb_pred FROM nb_quality_filter('docs', 'id', 'text', 'lab', 'text', 'label', 128, 0.5, 7)")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(preds(1L) && !preds(2L), s"got $preds")
    val stripped = sp.sql(
      "SELECT text_plain FROM html_strip('docs', 'text')").count()
    assert(stripped == 2)
    Seq((100L, "careful essay insight")).toDF("bid", "text")
      .createOrReplaceTempView("bench")
    val jac = sp.sql(
      "SELECT * FROM decontaminate_jaccard('docs', 'bench', 'id', 'bid', 'text', 3, 0.5)")
    assert(jac.count() == 2)
  }
}

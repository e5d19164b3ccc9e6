package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Parity of [[graft.functions.BoundedLevenshtein]] against Spark's 3-arg
  * `levenshtein(l, r, threshold)`: the edit distance is an integer metric,
  * so every (string, string, threshold) input must return the identical
  * value — both on the banded ASCII fast path and on the non-ASCII
  * fallback. The fuzzy-join verify stage (and its oracle rows) depend on
  * exact equality. */
class LevenshteinParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-levenshtein-parity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pairs: Seq[(String, String)] = {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abcde "
    def randStr(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (0 until edits).foreach { _ =>
        if (cur.isEmpty) cur = cur + alphabet(rnd.nextInt(alphabet.length))
        else rnd.nextInt(3) match {
          case 0 => val i = rnd.nextInt(cur.length) // substitute
            cur = cur.updated(i, alphabet(rnd.nextInt(alphabet.length)))
          case 1 => val i = rnd.nextInt(cur.length) // delete
            cur = cur.take(i) + cur.drop(i + 1)
          case _ => val i = rnd.nextInt(cur.length + 1) // insert
            cur = cur.take(i) + alphabet(rnd.nextInt(alphabet.length)) + cur.drop(i)
        }
      }
      cur
    }
    val randoms = (1 to 3000).map { _ =>
      val a = randStr(30)
      (a, if (rnd.nextBoolean()) mutate(a, rnd.nextInt(5)) else randStr(30))
    }
    val specials = Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
      ("a", "b"), ("ab", "ba"), ("kitten", "sitting"),
      ("naïve", "naive"), ("héllo wörld", "hello world"), // non-ASCII fallback
      ("日本語テキスト", "日本語のテキスト"), ("𝄞clef", "clef"), // multi-byte / surrogate
      ("aaaaaaaaaaaaaaaaaaaaaaaa", "aaaaaaaaaaaaaaaaaaaaaaab"))
    randoms ++ specials
  }

  test("BoundedLevenshtein == levenshtein(l, r, d) for d in 0..4") {
    val sp = spark
    import sp.implicits._
    val df = pairs.toDF("a", "b")
    (0 to 4).foreach { d =>
      val fast = org.apache.spark.sql.GraftExpressionBridge.column(
        graft.functions.BoundedLevenshtein(
          org.apache.spark.sql.GraftExpressionBridge.expression(col("a")),
          org.apache.spark.sql.GraftExpressionBridge.expression(col("b")), d))
      val bad = df.select(col("a"), col("b"), fast.as("f"),
          levenshtein(col("a"), col("b"), d).as("s"))
        .filter(col("f") =!= col("s"))
        .collect()
      assert(bad.isEmpty,
        s"d=$d mismatches: ${bad.take(5).map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))).mkString("; ")}")
    }
  }

  test("null inputs are null, matching the built-in") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Some("x"), None: Option[String]), (None: Option[String], Some("y")),
      (None: Option[String], None: Option[String])).toDF("a", "b")
    val fast = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.BoundedLevenshtein(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("a")),
        org.apache.spark.sql.GraftExpressionBridge.expression(col("b")), 2))
    val rows = df.select(fast.as("f"), levenshtein(col("a"), col("b"), 2).as("s")).collect()
    rows.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }
}

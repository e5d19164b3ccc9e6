package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.SampleOps

/** Round-10: the signed-zero rounding convention (VERDICT r9 #1).
  *
  * The r9 gate's only red row was a single −0.0: a tiny negative A-ES key
  * rounds to zero at 6 decimals, where Spark's BigDecimal HALF_UP round
  * emits +0.0 but DuckDB's round keeps the sign — payloads
  * 0x0000000000000000 vs 0x8000000000000000 under the driver's bit-exact
  * hash. House rule: every cross-engine rounded score whose value can be
  * a tiny NEGATIVE is normalized with `+ 0.0` on BOTH sides (IEEE:
  * −0.0 + 0.0 = +0.0). The DuckDB half of the contract is swept by
  * tools/signedzero.py over every oracle; this spec pins the Spark half
  * and the IEEE identity the rule rests on. */
class SignedZeroSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-signed-zero")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def isNegZero(d: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(d) == java.lang.Long.MIN_VALUE

  test("the IEEE identity the rule rests on: -0.0 + 0.0 is bit-positive zero") {
    assert(java.lang.Double.doubleToRawLongBits(-0.0 + 0.0) === 0L)
    assert(java.lang.Double.doubleToRawLongBits(0.0 + 0.0) === 0L)
  }

  test("Spark round of a tiny negative emits +0.0 (BigDecimal HALF_UP has no signed zero)") {
    val sp = spark
    import sp.implicits._
    val out = Seq(-1e-9, -4.9e-7, 0.0).toDF("x")
      .select(round(col("x"), 6).as("r")).collect().map(_.getDouble(0))
    assert(out.forall(d => d == 0.0 && !isNegZero(d)),
      "round must land on +0.0 for every value that rounds to zero")
  }

  test("weightedSampleK keys that round to zero carry the +0.0 payload") {
    val sp = spark
    import sp.implicits._
    // weights so large that EVERY key ln(u)/w rounds to zero at 6 decimals
    // — the exact regime that produced the r9 doc_id-378 defect
    val docs = (1L to 500L).map(i => (i, 1e9)).toDF("doc_id", "w")
    val out = SampleOps.weightedSampleK(docs, "doc_id", "w", 50, seed = 37L)
      .select("score").collect().map(_.getDouble(0))
    assert(out.nonEmpty)
    assert(out.forall(d => !isNegZero(d)),
      "normalized score must never carry the negative-zero bit pattern")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.CardinalityOps

/** HyperLogLog sketch evidence: registers match a single-threaded
  * reference fold bit-for-bit (so partial aggregation and partition
  * layout cannot change the result), shard-merge is register-identical
  * to the single pass, and the estimate honors the published
  * 1.04/sqrt(m) error bound across cardinality regimes including the
  * linear-counting small range. */
class HllSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-hll")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Single-threaded reference: registers of the 64-bit xxhash64 stream. */
  private def refRegisters(hashes: Seq[Long], p: Int): Array[Int] = {
    val m = 1 << p
    val regs = new Array[Int](m)
    val suffix = 64 - p
    val mask = if (suffix == 64) -1L else (1L << suffix) - 1L
    hashes.foreach { h =>
      val b = ((h >>> suffix) & (m - 1)).toInt
      val w = h & mask
      val rho = if (w == 0L) suffix + 1
        else suffix + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(b)) regs(b) = rho
    }
    regs
  }

  private def values(n: Int): Seq[Long] = (1 to n).map(i => i * 2654435761L + 17)

  test("registers equal the single-threaded reference fold at every partition layout") {
    val sp = spark; import sp.implicits._
    val vals = values(5000)
    val df = vals.toDF("v")
    val hashes = df.select(xxhash64(col("v"))).collect().map(_.getLong(0)).toSeq
    val want = refRegisters(hashes, p = 8).toSeq
    for (parts <- Seq(1, 7)) {
      val got = CardinalityOps
        .hllCountBy(df.repartition(parts), Seq.empty, "v", p = 8)
        .select("regs").collect().head.getSeq[Int](0)
      assert(got == want, s"parts=$parts")
    }
  }

  test("estimate stays inside 3x the published standard error across regimes") {
    val sp = spark; import sp.implicits._
    val p = 10
    val se = 1.04 / math.sqrt((1 << p).toDouble)
    for (n <- Seq(500, 5000, 50000)) {
      val df = values(n).toDF("v")
      val est = CardinalityOps.hllCountBy(df, Seq.empty, "v", p)
        .select("est").collect().head.getDouble(0)
      assert(math.abs(est - n) / n <= 3 * se, s"n=$n est=$est")
    }
  }

  test("duplicates do not move the registers; linear counting handles tiny sets") {
    val sp = spark; import sp.implicits._
    val base = values(300)
    val dups = (base ++ base ++ base).toDF("v")
    val once = base.toDF("v")
    val a = CardinalityOps.hllCountBy(dups, Seq.empty, "v", 8)
      .select("regs", "est").collect().head
    val b = CardinalityOps.hllCountBy(once, Seq.empty, "v", 8)
      .select("regs", "est").collect().head
    assert(a.getSeq[Int](0) == b.getSeq[Int](0))
    // 300 distinct at m=256 is the linear-counting regime: E = m ln(m/V)
    val regs = a.getSeq[Int](0)
    val v = regs.count(_ == 0)
    if (v > 0) {
      val lc = 256.0 * math.log(256.0 / v)
      assert(math.abs(a.getDouble(1) - lc) < 1e-9 ||
        a.getDouble(1) > 2.5 * 256, s"est=${a.getDouble(1)} lc=$lc")
    }
  }

  test("shard merge is register-identical to the single pass (persist + HllMergeRegisters)") {
    val sp = spark; import sp.implicits._
    val df = values(20000).zipWithIndex
      .map { case (v, i) => (v, i % 5) }.toDF("v", "shard")
    val whole = CardinalityOps.hllCountBy(df, Seq.empty, "v", 8)
      .select("regs", "est").collect().head
    val dir = java.nio.file.Files.createTempDirectory("graft-hll").toString
    val perShard = CardinalityOps.hllCountBy(df, Seq("shard"), "v", 8)
      .select("shard", "regs")
    CardinalityOps.writeHllSketches(perShard, dir)
    val merged = CardinalityOps
      .mergeShards(CardinalityOps.readHllSketches(spark, dir), Seq.empty, 8)
      .select("regs", "est").collect().head
    assert(merged.getSeq[Int](0) == whole.getSeq[Int](0))
    assert(merged.getDouble(1) == whole.getDouble(1))
  }

  test("overlapEstimate: union registers exact, inclusion-exclusion inside tolerance") {
    val sp = spark; import sp.implicits._
    val p = 10
    val aVals = values(8000)
    val bVals = values(12000).drop(5000) // overlap = 3000, |B| = 7000
    val aSk = CardinalityOps.hllCountBy(aVals.toDF("v"), Seq.empty, "v", p)
      .select("regs")
    val bSk = CardinalityOps.hllCountBy(bVals.toDF("v"), Seq.empty, "v", p)
      .select("regs")
    val row = CardinalityOps.overlapEstimate(aSk, bSk, Seq.empty, p)
      .collect().head
    val (estA, estB, estU, estI) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    // union registers must equal sketching the unioned stream directly
    val uSk = CardinalityOps.hllCountBy((aVals ++ bVals).toDF("v"), Seq.empty, "v", p)
      .select("est").collect().head.getDouble(0)
    assert(estU == uSk)
    val se = 1.04 / math.sqrt((1 << p).toDouble)
    assert(math.abs(estA - 8000) / 8000 <= 3 * se)
    assert(math.abs(estB - 7000) / 7000 <= 3 * se)
    // inclusion-exclusion compounds three estimates: allow 3x the summed SE
    assert(math.abs(estI - 3000) <= 3 * se * (8000 + 7000 + 12000))
  }

  test("prehashed 31-bit mixer path replays in plain Scala (the oracle contract)") {
    val sp = spark; import sp.implicits._
    val seed = 31L
    val ids = (1L to 4000L)
    val df = ids.toDF("id")
    val got = CardinalityOps.hllCountByPrehashed(df, Seq.empty,
        graft.llm.SampleOps.hashBucket(col("id"), seed), p = 8, hashBits = 31)
      .select("regs", "v_zero", "s_scaled", "est").collect().head
    // replay the LCG mixer + register fold single-threaded
    val P = graft.llm.SampleOps.P
    val mult = 2654435761L % P
    def mix(id: Long): Long = {
      var x = (((id % P) + P) % P * mult + seed % P) % P
      (0 until 3).foreach(_ => x = ((x ^ (x >> 16)) * 48271L) % P)
      x
    }
    val regs = new Array[Int](256)
    ids.map(mix).foreach { h =>
      val b = (h >>> 23).toInt & 255
      val w = h & ((1L << 23) - 1)
      val rho = if (w == 0) 24 else 24 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(b)) regs(b) = rho
    }
    assert(got.getSeq[Int](0) == regs.toSeq)
    val v = regs.count(_ == 0)
    val s = regs.map(r => math.pow(2.0, 24 - r)).sum
    assert(got.getLong(1) == v)
    assert(got.getDouble(2) == s)
  }
}

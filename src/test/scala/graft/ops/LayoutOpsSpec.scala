package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: Morton bit interleave correctness against the textbook
  * pattern, the null/constant conventions, and the end-to-end write
  * guarantee (disjoint per-file z-ranges → prunable row-group stats). */
class LayoutOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-layout")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("zorderValue reproduces the textbook Morton pattern on a 4x4 grid") {
    val sp = spark
    import sp.implicits._
    // values 0..3 with min 0 / max 3 level to themselves at bits=2:
    // floor(v/3*4) = 0,1,2,4→clamp 3
    val grid = (for (x <- 0 to 3; y <- 0 to 3) yield (x, y)).toDF("x", "y")
    val z = LayoutOps.zorderValue(grid, Seq("x", "y"), bits = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def morton(x: Int, y: Int): Long =
      ((x & 1) | ((y & 1) << 1) | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)).toLong
    for (x <- 0 to 3; y <- 0 to 3)
      assert(z((x, y)) == morton(x, y), s"($x,$y)")
    // the z-sorted walk is the classic N-curve: each step stays in the
    // same 2x2 quadrant until it's exhausted
    val walk = z.toSeq.sortBy(_._2).map(_._1)
    assert(walk.take(4).toSet == Set((0, 0), (1, 0), (0, 1), (1, 1)))
  }

  test("null values and constant columns level to 0") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Some(1.0), 5.0), (None, 5.0), (Some(3.0), 5.0))
      .toDF("a", "c")
    val z = LayoutOps.zorderValue(df, Seq("a", "c"), bits = 4)
      .collect().map(r => (r.get(0), r.getLong(2)))
    // c is constant → contributes 0 everywhere; null a → level 0
    assert(z.collect { case (null, v) => v }.head == 0L)
    // max value levels to 2^bits-1 on dimension a alone (c contributes 0)
    val maxZ = z.collect { case (a: java.lang.Double, v) if a == 3.0 => v }.head
    val expected = (0 until 4).map(b => ((15L >> b) & 1L) << (b * 2)).sum
    assert(maxZ == expected)
  }

  test("writeZordered produces files with disjoint z-ranges (prunable stats)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(2000)((rnd.nextInt(1000), rnd.nextInt(1000)))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val df = rows.toDF("id", "x", "y").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    LayoutOps.writeZordered(df, Seq("x", "y"), dir, nFiles = 4)
    val back = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
    val ranges = back.groupBy("f")
      .agg(min("zvalue").as("lo"), max("zvalue").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, "file z-ranges must not overlap")
    }
    // every row and column survived the layout shuffle
    assert(back.count() == 2000)
    assert(back.select(sum("x")).collect()(0).getLong(0) ==
      rows.map(_._2.toLong).sum)
  }

  test("property: z-values match a naive per-bit reference on random data (3 cols)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(200)((rnd.nextDouble() * 100 - 50,
      rnd.nextInt(1000).toDouble, rnd.nextDouble()))
      .zipWithIndex.map { case ((a, b, c), i) => (i.toLong, a, b, c) }
    val df = rows.toDF("id", "a", "b", "c")
    val bits = 4
    val got = LayoutOps.zorderValue(df, Seq("a", "b", "c"), bits)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val (mins, maxs) = (
      Seq(rows.map(_._2).min, rows.map(_._3).min, rows.map(_._4).min),
      Seq(rows.map(_._2).max, rows.map(_._3).max, rows.map(_._4).max))
    def lvl(v: Double, j: Int): Long =
      if (maxs(j) == mins(j)) 0L
      else math.min(math.floor((v - mins(j)) / (maxs(j) - mins(j)) * 16).toLong, 15L)
    for ((id, a, b, c) <- rows) {
      val ls = Seq(lvl(a, 0), lvl(b, 1), lvl(c, 2))
      var z = 0L
      for (bt <- 0 until bits; j <- 0 until 3)
        z |= ((ls(j) >> bt) & 1L) << (bt * 3 + j)
      assert(got(id) == z, s"id=$id")
    }
  }

  test("a 2-d box predicate scans fewer rows from the z-layout than from a 1-d sort") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(40000)((rnd.nextInt(1000), rnd.nextInt(1000)))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val df = rows.toDF("id", "x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft_z2").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft_s2").toString
    LayoutOps.writeZordered(df, Seq("x", "y"), zDir, nFiles = 32)
    // the status quo: cluster on ONE dimension only
    df.repartitionByRange(32, org.apache.spark.sql.functions.col("x"))
      .sortWithinPartitions("x").write.mode("overwrite").parquet(sDir)

    // rows the parquet reader actually surfaces = rows of row groups the
    // pushed min/max filters could NOT skip
    def scannedRows(dir: String): Long = {
      val q = spark.read.parquet(dir)
        .filter(col("x").between(100, 199) && col("y").between(100, 199))
      q.collect()
      q.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    val zScanned = scannedRows(zDir)
    val sScanned = scannedRows(sDir)
    // the x-sorted layout prunes only on x (~10% of row groups survive,
    // all useless y ranges); the z-layout prunes on BOTH dimensions
    assert(zScanned < sScanned,
      s"z-layout must scan less: z=$zScanned vs sorted=$sScanned")
    // and the answer is identical either way
    val a = spark.read.parquet(zDir)
      .filter(col("x").between(100, 199) && col("y").between(100, 199))
      .agg(sum("id")).collect()(0).getLong(0)
    val b = spark.read.parquet(sDir)
      .filter(col("x").between(100, 199) && col("y").between(100, 199))
      .agg(sum("id")).collect()(0).getLong(0)
    assert(a == b)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.SimilarityOps

/** Native codegen cosine expression: bit-parity with the declarative
  * zip_with/aggregate form, null/edge semantics, SQL registration, and
  * whole-stage-codegen participation. */
class CosineExpressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-cosine-expr")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The declarative composition the expression replaced. */
  private def declarativeCosine(a: org.apache.spark.sql.Column,
                                b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  test("bit-exact vs the declarative form on pseudo-random vectors") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      SimilarityOps.cosine(col("a"), col("b")).as("native"),
      declarativeCosine(col("a"), col("b")).as("decl")).collect()
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"native ${r.getDouble(0)} != declarative ${r.getDouble(1)}")
    }
  }

  test("null, empty and zero-norm semantics") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))), // identical → 1.0
      (2L, None, Some(Seq(1.0, 2.0))), //                null input → null
      (3L, Some(Seq.empty[Double]), Some(Seq.empty[Double])), // empty → NaN
      (4L, Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))) //  zero norm → NaN
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), SimilarityOps.cosine(col("a"), col("b")).as("sim"))
      .orderBy("id").collect()
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-15)
    assert(out(1).isNullAt(1))
    assert(out(2).getDouble(1).isNaN)
    assert(out(3).getDouble(1).isNaN)
  }

  test("unequal lengths yield NULL (zip_with pad parity)") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("id", "a", "b")
    val out = df.select(SimilarityOps.cosine(col("a"), col("b")).as("s")).collect()
    assert(out(0).isNullAt(0))
  }

  test("registered SQL surface + stays inside whole-stage codegen") {
    graft.sql.Register.registerAll(spark)
    val r = spark.sql(
      "SELECT ts_cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s, " +
        "anofox_fcst_cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS o")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15 && math.abs(r.getDouble(1)) < 1e-15)
    // wrong arity is an analysis error with the function name, not an
    // IndexOutOfBoundsException from the registry lambda
    val arity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT ts_cosine_similarity(array(1.0d))").collect()
    }
    assert(arity.getMessage.contains("ts_cosine_similarity"))
    // a local Seq constant-folds to LocalTableScan; range() forces execution
    val df = spark.range(100)
      .select(array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(SimilarityOps.cosine(col("a"), col("b")).as("s"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      s"expected a WholeStageCodegen span, got:\n${df.queryExecution.executedPlan}")
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    assert(df.agg(sum("s")).collect()(0).getDouble(0) > 0.0)
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the documented 100 TB claim that "a corpus bucketed by
  * centroid_id makes the per-cluster self-join exchange-free"
  * (ARCHITECTURE.md §8): a table written with `bucketBy(centroid_id)` joins
  * and aggregates on that key with ZERO ShuffleExchange nodes — the bucketed
  * scan itself satisfies the hash-distribution requirement. This is the
  * storage discipline a production deployment applies to the stored corpus
  * so SemDeDup pair generation, inverted-list probing and per-cluster stats
  * run shuffle-free over it.
  */
class BucketedCorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    warehouse = java.nio.file.Files.createTempDirectory("graft-bucketed")
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.warehouse.dir", warehouse.toString)
      .config("spark.ui.enabled", "false")
      .appName("graft-bucketed-corpus")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a centroid_id-bucketed corpus self-joins and aggregates with zero exchanges") {
    val sp = spark
    import sp.implicits._
    val corpus = (0L until 200L)
      .map(i => (i, i % 8, Seq(1.0 * (i % 5), 1.0, 0.5)))
      .toDF("vid", "centroid_id", "vec")
    corpus.write.mode("overwrite")
      .bucketBy(4, "centroid_id")
      .sortBy("centroid_id")
      .format("parquet")
      .saveAsTable("corpus_bucketed")
    val t = spark.table("corpus_bucketed")

    // the SemDeDup pair-generation shape: per-cluster self-join
    val l = t.select(col("vid").as("id_a"), col("centroid_id"))
    val r = t.select(col("vid").as("id_b"), col("centroid_id"))
    val pairs = l.join(r, Seq("centroid_id")).filter(col("id_a") < col("id_b"))
    assert(pairs.queryExecution.executedPlan
      .collect { case s: ShuffleExchangeExec => s }.isEmpty,
      "the bucketed self-join must plan without any exchange")
    assert(pairs.count() > 0)

    // and the per-cluster histogram (the skew-cap input) is map-side only
    val hist = t.groupBy(col("centroid_id")).agg(count(lit(1)).as("n"))
    assert(hist.queryExecution.executedPlan
      .collect { case s: ShuffleExchangeExec => s }.isEmpty,
      "the bucketed aggregation must plan without any exchange")
    assert(hist.count() == 8)
  }
}

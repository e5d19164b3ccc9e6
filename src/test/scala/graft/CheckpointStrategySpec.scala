package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{SimilarityOps, TextOps}

/** The iterative LLM ops pin intermediates via `spark.graft.checkpoint.mode`
  * (see graft.llm.Pin): `local` (localCheckpoint, default), `reliable` (RDD
  * checkpoint to the checkpoint dir — the 100 TB mode: survives executor
  * loss), `disk` (DISK_ONLY persist — recomputable lineage). All three must
  * produce identical results, and loops must release superseded iterates so
  * storage does not grow with the iteration count. */
class CheckpointStrategySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-checkpoint-strategy")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def chainPairs = {
    val sp = spark
    import sp.implicits._
    // chain 1-…-6 (pointer jumping) + clique 10-12 + isolated pair 20-21
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
  }

  private def runClusters(mode: String): Map[Long, Long] = {
    spark.conf.set(graft.llm.Pin.ModeKey, mode)
    try TextOps.dedupClusters(chainPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally spark.conf.set(graft.llm.Pin.ModeKey, "local")
  }

  test("dedupClusters is mode-invariant: local == reliable == disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val local = runClusters("local")
    val reliable = runClusters("reliable")
    val disk = runClusters("disk")
    assert(local == reliable, "reliable checkpoint changed the result")
    assert(local == disk, "DISK_ONLY persist changed the result")
    assert((1L to 6L).forall(local(_) == 1L) && (10L to 12L).forall(local(_) == 10L)
      && local(20L) == 20L && local(21L) == 20L)
  }

  test("superseded iterates are released: storage does not grow with rounds") {
    // same contract in BOTH release-capable modes: the chain needs >=3
    // label-propagation rounds; only the FINAL iterate may still hold
    // storage (it backs the returned plan) — every superseded label table
    // and the edge list must have been unpersisted (disk: Dataset.unpersist;
    // local: the checkpointed RDD inside the LogicalRDD leaf)
    for (mode <- Seq("disk", "local")) {
      spark.conf.set(graft.llm.Pin.ModeKey, mode)
      try {
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val out = TextOps.dedupClusters(chainPairs)
        out.count()
        val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
        assert(leaked.size <= 1,
          s"[$mode] expected at most the final iterate pinned, found ${leaked.size} new persistent RDDs")
      } finally spark.conf.set(graft.llm.Pin.ModeKey, "local")
    }
  }

  test("ivfTrain under reliable mode matches local mode") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-ivf").toString
    spark.sparkContext.setCheckpointDir(dir)
    val corpus = (0 until 40)
      .map(i => (i.toLong, Array.tabulate(4)(j => math.sin(i * (j + 1)).abs + 0.1)))
      .toDF("vec_id", "embedding")
    def train(mode: String) = {
      spark.conf.set(graft.llm.Pin.ModeKey, mode)
      try SimilarityOps.ivfTrain(corpus, "vec_id", "embedding", nLists = 4, iters = 3)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      finally spark.conf.set(graft.llm.Pin.ModeKey, "local")
    }
    assert(train("local") == train("reliable"))
  }

  test("an unknown mode fails fast with the valid options") {
    spark.conf.set(graft.llm.Pin.ModeKey, "ramdisk")
    try {
      val err = intercept[IllegalArgumentException] {
        TextOps.dedupClusters(chainPairs).collect()
      }
      assert(err.getMessage.contains("local|reliable|disk"))
    } finally spark.conf.set(graft.llm.Pin.ModeKey, "local")
  }
}

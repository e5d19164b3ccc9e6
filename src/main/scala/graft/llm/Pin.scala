package graft.llm

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Materialization ("pinning") strategy for the iterative and multi-consumer
  * LLM ops (dedupClusters, minHashLshPairs, lshNearPairs, ivfTrain). These
  * ops MUST cut lineage between rounds — an iterative plan otherwise
  * re-executes every previous round (quadratic recomputation) — but HOW the
  * intermediate is stored is a deployment decision, so it is a runtime conf:
  *
  * `spark.graft.checkpoint.mode`:
  *  - `local` (default): `localCheckpoint` — fastest, but blocks live on
  *    executors non-fault-tolerantly. An executor loss (or a
  *    dynamic-allocation decommission) makes the pinned data unrecoverable
  *    and fails the job. The right default for local mode and short-lived
  *    clusters with static allocation.
  *  - `reliable`: RDD `checkpoint()` to the SparkContext checkpoint dir
  *    (HDFS/S3). Survives executor loss — the right mode for 100 TB runs
  *    with dynamic allocation. Requires `sc.setCheckpointDir(...)`;
  *    checkpoint files are reclaimed by the ContextCleaner when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`, or when the
  *    checkpoint dir is removed.
  *  - `disk`: `persist(DISK_ONLY)` + eager count. Keeps lineage, so a lost
  *    block is recomputed rather than failing the job; no checkpoint dir
  *    needed. Slower to produce than `local`, cheaper than `reliable`.
  *
  * Loops release superseded iterates through [[Pin.Handle.release]] so only
  * the latest round stays pinned. Pins that back a RETURNED plan (the banded
  * LSH table, the final label/centroid iterate) cannot be released inside
  * the op — they are freed deterministically by the caller under `disk`
  * mode, or asynchronously by the ContextCleaner once the returned
  * DataFrame is garbage-collected.
  */
private[graft] object Pin {

  val ModeKey = "spark.graft.checkpoint.mode"

  /** A pinned DataFrame plus a release hook that frees its storage. Safe to
    * call after the pinned data's consumers have been materialized (or, in
    * `disk`/`reliable` mode, at any time — the data is recomputable).
    * Release BLOCKS until the blocks are gone: a fire-and-forget unpersist
    * let superseded pins overlap their successors' allocation, which showed
    * up as bimodal run-to-run timings in the LSH ops. */
  final case class Handle(df: DataFrame, release: () => Unit)

  /** Pin `df`. `eager = false` defers materialization to the first action
    * that touches the pin (compute-once still guaranteed by the storage
    * layer) — one fewer scheduled job when the caller's own plan will
    * materialize it immediately anyway (backtest), at the cost of the
    * first consumer paying the production time. Iterative loops should
    * stay eager: a lazy pin inside a loop materializes under the NEXT
    * round's job, hiding where time goes. */
  def apply(df: DataFrame, eager: Boolean = true): Handle =
    df.sparkSession.conf.get(ModeKey, "local") match {
      case "local" =>
        val cp = df.localCheckpoint(eager)
        // the checkpoint blocks belong to the RDD inside the LogicalRDD leaf
        val rdd: Option[RDD[_]] =
          cp.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
        Handle(cp, () => rdd.foreach(_.unpersist(blocking = true)))
      case "reliable" =>
        // reliable checkpoint files outlive the handle by design (that is
        // the fault-tolerance contract); cleanup is the ContextCleaner's job
        Handle(df.checkpoint(eager), () => ())
      case "disk" =>
        val p = df.persist(StorageLevel.DISK_ONLY)
        if (eager) p.count()
        Handle(p, () => { p.unpersist(blocking = true); () })
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be one of local|reliable|disk, got '$other'")
    }
}

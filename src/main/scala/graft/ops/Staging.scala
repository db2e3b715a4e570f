package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Caller-selectable materialization for iterative/self-joining
  * operators that must not re-run their upstream plan per branch or per
  * round.
  *
  * Three postures, one switch plus one conf:
  *
  *  - `reliable = false` (default): `localCheckpoint()` — EAGER (runs a
  *    job now), truncates lineage to an RDD leaf, stores blocks
  *    non-fault-tolerantly. Fastest, and the right call on local mode /
  *    dedicated clusters: an executor loss kills the query instead of
  *    recomputing.
  *  - `reliable = true`: `persist(DISK_ONLY)` — lazy, lineage KEPT, so
  *    a lost block is recomputed from source instead of failing the
  *    job. The posture for preemptible/spot clusters; costs plan
  *    re-execution (not just block reload) only on actual executor
  *    loss. Only valid when the staged plan is DETERMINISTIC (recompute
  *    must reproduce the lost partition bit-identically) — every call
  *    site stages a pure function of its input. Honest trade: because
  *    lineage is kept, the LOGICAL plan grows linearly with rounds
  *    (execution stays cheap — the cache manager substitutes each
  *    persisted subtree with its materialized relation at planning
  *    time, so the optimizer/physical planner see a leaf — but very
  *    long runs carry a deep analyzed tree on the driver).
  *  - `reliable = true` AND `spark.graft.reliablePin=true` (with
  *    `SparkContext.setCheckpointDir` pointing at cluster-visible
  *    storage): a REAL eager `checkpoint()` — fault-tolerant AND
  *    lineage-truncating, the best posture for very long iterative runs
  *    (multi-hundred-round BPE, 50-iteration PageRank) when the cluster
  *    has a checkpoint dir to offer. Recovery re-READS the checkpoint
  *    files rather than recomputing. Storage honesty: Spark does NOT
  *    delete reliable checkpoints by default, so a long run writes one
  *    state snapshot per staged round and keeps them all — set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` so the
  *    ContextCleaner removes each round's files once its RDD is
  *    unreferenced, and plan checkpoint-dir capacity for at least a few
  *    concurrent snapshots either way.
  *
  * Callers that need eager + fault-tolerant for NON-deterministic
  * stages (sampled range boundaries that must be fixed once,
  * [[Normalize.denseIds]]) use [[pin]]: `reliable`'s recompute
  * semantics cannot apply there (recompute would resample the
  * boundaries and desynchronize offsets), so only the checkpoint path
  * provides fault tolerance — same conf, same checkpoint dir.
  */
private[graft] object Staging {

  private def reliablePin(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.graft.reliablePin", "false").toBoolean

  private def requireCheckpointDir(df: DataFrame): Unit =
    require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "spark.graft.reliablePin=true requires SparkContext.setCheckpointDir " +
        "(cluster-visible storage, e.g. an HDFS/S3 path)")

  def stage(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable && reliablePin(df)) {
      requireCheckpointDir(df)
      df.checkpoint()
    } else if (reliable) df.persist(StorageLevel.DISK_ONLY)
    else df.localCheckpoint()

  /** Eager materialization whose RESULT must be pinned exactly once —
    * used where the staged plan is execution-nondeterministic (sampled
    * range boundaries) and therefore must never be recomputed, not even
    * on failure recovery.
    *
    *  - default: `localCheckpoint()` — eager, non-fault-tolerant; an
    *    executor loss fails the query (and the retry re-pins fresh
    *    boundaries, still correct end-to-end).
    *  - `spark.graft.reliablePin=true`: eager reliable `checkpoint()`
    *    into the caller-provided `SparkContext.setCheckpointDir`
    *    (HDFS/S3 on a real cluster) — a lost executor re-READS the
    *    pinned blocks instead of failing. Requires the checkpoint dir;
    *    fails fast with instructions when unset.
    */
  def pin(df: DataFrame): DataFrame =
    if (reliablePin(df)) {
      requireCheckpointDir(df)
      df.checkpoint()
    } else df.localCheckpoint()
}

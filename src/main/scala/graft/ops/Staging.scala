package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Caller-selectable materialization for iterative/self-joining
  * operators that must not re-run their upstream plan per branch or per
  * round.
  *
  * Two postures, one switch:
  *
  *  - `reliable = false` (default): `localCheckpoint()` — EAGER (runs a
  *    job now), truncates lineage, stores blocks non-fault-tolerantly.
  *    Fastest, and the right call on local mode / dedicated clusters:
  *    an executor loss kills the query instead of recomputing.
  *  - `reliable = true`: `persist(DISK_ONLY)` — lazy, lineage kept, so a
  *    lost block is recomputed from source instead of failing the job.
  *    The posture for preemptible/spot clusters; costs plan re-execution
  *    (not just block reload) only on actual executor loss. Only valid
  *    when the staged plan is DETERMINISTIC (recompute must reproduce
  *    the lost partition bit-identically) — every call site below stages
  *    a pure function of its input.
  *
  * Callers that need eager + fault-tolerant (e.g. sampled range
  * boundaries that must be fixed once, [[Normalize.denseIds]]) use
  * [[pin]]: `reliable` cannot apply there (recompute would resample the
  * boundaries and desynchronize offsets), so the fault-tolerant posture
  * is a REAL `checkpoint()` into `SparkContext.setCheckpointDir` —
  * cluster-wide storage this library cannot assume exists, hence opt-in
  * via the session conf `spark.graft.reliablePin=true` rather than a
  * default.
  */
private[graft] object Staging {
  def stage(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.persist(StorageLevel.DISK_ONLY) else df.localCheckpoint()

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
    if (df.sparkSession.conf.get("spark.graft.reliablePin", "false").toBoolean) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "spark.graft.reliablePin=true requires SparkContext.setCheckpointDir " +
          "(cluster-visible storage, e.g. an HDFS/S3 path)")
      df.checkpoint()
    } else df.localCheckpoint()
}

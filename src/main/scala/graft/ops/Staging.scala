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
  * boundaries that must be fixed once, [[Normalize.denseIds]]) should
  * use `SparkContext.setCheckpointDir` + `checkpoint()` instead; that
  * needs cluster-wide storage this library cannot assume, so it is not
  * offered here.
  */
private[graft] object Staging {
  def stage(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.persist(StorageLevel.DISK_ONLY) else df.localCheckpoint()
}

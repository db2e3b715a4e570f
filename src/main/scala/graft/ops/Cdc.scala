package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a keyed changelog of upserts and
  * deletes to a base snapshot, producing the next snapshot.
  *
  * This generalizes the reference's last-write-wins mapping store
  * (`src/data_processor.py:131-143` — every Redis `SET` overwrites the
  * key's previous value, and the latest write wins) from "latest value
  * per key" to the full snapshot-maintenance shape a lakehouse pipeline
  * needs: base ⊕ changelog → new base, with deletes honored.
  *
  * Scale shape: ONE aggregation shuffle over the changelog (collapse to
  * the last change per key — at 100 TB the changelog collapses BEFORE
  * touching the base table, so the join carries one row per changed key,
  * not one per change), then one key-partitioned outer join against the
  * base. Both sides shuffle on the key; with a bucketed base table the
  * base-side exchange disappears entirely.
  */
object Cdc {

  /** Next snapshot = `base` with `changes` applied.
    *
    *  - a key's LAST change (max `seqCol`) decides its fate: `deleteOp`
    *    drops the key, anything else upserts `valueCols` from the change;
    *  - keys present only in `changes` are inserts;
    *  - keys absent from `changes` keep their base row untouched;
    *  - `n_changes` counts how many changelog entries touched the key
    *    (0 for untouched base rows).
    *
    * `seqCol` must totally order changes within a key (a log offset or
    * unique change id) — with duplicate seq values per key, `max_by`
    * picks a shuffle-dependent winner, same contract as
    * [[TimeSeries.forwardFill]] / [[Scd.history]].
    */
  def applyChangelog(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String,
      valueCols: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    // Collapse the changelog map-side-first: one narrow row per changed
    // key survives the shuffle.
    val last = changes.groupBy(col(keyCol)).agg(
      max_by(struct((opCol +: valueCols).map(col): _*), col(seqCol)).as("__last"),
      count(lit(1)).as("n_changes"))
    base
      .join(last, Seq(keyCol), "full_outer")
      // Keep: untouched base rows (no change entry) and keys whose last
      // change is not a delete.
      .where(col("__last").isNull || col(s"__last.$opCol") =!= deleteOp)
      .select(
        col(keyCol) +:
          // presence of a change decides, not null-ness of the value — an
          // upsert may legitimately SET a column to null, and coalesce
          // would silently resurrect the stale base value
          valueCols.map(v =>
            when(col("__last").isNotNull, col(s"__last.$v")).otherwise(col(v)).as(v)) :+
          coalesce(col("n_changes"), lit(0L)).as("n_changes"): _*)
  }

  /** Incremental aggregate maintenance: merge a signed row-level delta
    * stream into a per-key (count, sum) aggregate table WITHOUT re-reading
    * the base data — the materialized-view maintenance shape. Inserts
    * contribute (+1, +v), deletes (−1, −v); keys whose merged count
    * reaches 0 disappear (and a negative merged count is a contract
    * violation — deletes for rows that never existed — surfaced rather
    * than clamped).
    *
    * Both count and sum are self-inverse under signed merge, which is
    * exactly why this table maintains incrementally; averages derive as
    * sum/count downstream, but max/min do NOT maintain this way (a
    * deleted max needs a rescan) — keep those out of delta-maintained
    * views.
    *
    * Scale shape: the delta stream collapses to one row per touched key
    * in a map-side-combined aggregation BEFORE the one key-partitioned
    * outer join against the aggregate table. At 100 TB the join carries
    * |touched keys| + |aggregate keys| rows — the base FACT data is never
    * read, which is the entire point.
    */
  def mergeAggregate(
      baseAgg: DataFrame,
      deltas: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val sign = when(col(opCol) === deleteOp, lit(-1L)).otherwise(lit(1L))
    val d = deltas.groupBy(keyCols.map(col): _*).agg(
      sum(sign).as("__dn"),
      sum(sign * col(valueCol)).as("__dsum"))
    baseAgg
      .join(d, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n_rows") :+
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("__dsum"), lit(0L))).as("sum_v"): _*)
      .where(col("n_rows") =!= 0L)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot reconciliation — the diff between two versions of a
  * table: which keys were added, removed, or changed, and WHICH columns
  * changed. The audit primitive behind pipeline regression testing
  * (yesterday's output vs today's after a code change), migration
  * verification (old engine vs new), and incremental-load validation —
  * the batch counterpart of [[Cdc]] (Cdc APPLIES a changelog; this
  * RECOVERS one from two snapshots).
  *
  * Scale shape: one full outer join on the key — the minimum possible
  * data movement for a whole-table compare (both sides shuffle once on
  * the same key; AQE handles skew). Column comparison is a codegen'd
  * null-safe equality per column — no row serialization, no UDF. For
  * very wide tables, compare a hash column per side instead and only
  * mask-diff rows whose hashes differ.
  */
object TableDiff {

  /** Row-level diff of `newDf` against `oldDf` by `keyCols`:
    * (key…, change, changed_cols) where change ∈ added | removed |
    * changed, and `changed_cols` lists the differing `compareCols`
    * (comma-joined, column order) for changed rows. Unchanged rows are
    * omitted — at reconciliation scale they are the overwhelming bulk,
    * and emitting them would make the diff as big as the table.
    *
    * Null-safe: a null→value or value→null transition is a change; a
    * null→null column is not.
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
    val renamedO = compareCols.foldLeft(o)((d, c) => d.withColumnRenamed(c, s"__old_$c"))
    val renamedN = compareCols.foldLeft(n)((d, c) => d.withColumnRenamed(c, s"__new_$c"))
    val joined = renamedO.join(renamedN, keyCols, "full_outer")
    val changedCols = concat_ws(",",
      compareCols.map(c =>
        when(!(col(s"__old_$c") <=> col(s"__new_$c")), lit(c))): _*)
    joined
      .withColumn("change",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(changedCols =!= "", lit("changed")))
      .where(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed", changedCols).otherwise(lit("")))
      .select((keyCols.map(col) :+ col("change") :+ col("changed_cols")): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse an ordered
  * change log into validity intervals per key — the standard shape for
  * "what was this entity's state at time T" queries (point-in-time joins
  * via [[AsOfJoin]] compose directly with this output).
  *
  * The reference's mapping store keeps only last-write-wins state
  * (`src/data_processor.py:131-143` overwrites the Redis value per key);
  * SCD2 is the batch-analytics generalization that keeps every historical
  * state with its validity window instead of just the latest.
  *
  * Scale shape: ONE shuffle on the key. Change detection (`lag`),
  * interval close (`lead`) and the kept-row filter are all window
  * functions over the same `(key, order)` sort, so Catalyst plans a
  * single exchange + sort and evaluates both windows on it — no
  * self-join, no second shuffle, no driver state. 100 TB of change log
  * partitions by key exactly like any wide aggregation.
  */
object Scd {

  /** Validity intervals per key: one row per state CHANGE, with
    * `valid_from` (inclusive) = the order value where the state first
    * held, `valid_to` (exclusive) = the next change's order value (null
    * for the current state) and `is_current`.
    *
    * Consecutive rows with identical `attrCols` collapse into one
    * interval (null-safe comparison — a null attribute is a state like
    * any other). `(orderCol, tiebreaks*)` must totally order rows within
    * a key: with duplicate sort keys the lag-based change detector would
    * see a shuffle-dependent neighbor (same contract as
    * [[TimeSeries.forwardFill]]).
    */
  def history(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      attrCols: Seq[String],
      tiebreaks: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(orderCol) +: tiebreaks.map(col)): _*)
    val state = struct(attrCols.map(col): _*)
    // First row of a key: lag is null; null <=> struct(..) is false, so it
    // is always a change — exactly right.
    val changed = !(state <=> lag(state, 1).over(w))
    val kept = df
      .withColumn("__chg", changed)
      .where(col("__chg"))
      .drop("__chg")
    // Same partitioning + a compatible prefix sort → no new exchange.
    val wk = Window.partitionBy(col(keyCol))
      .orderBy((col(orderCol) +: tiebreaks.map(col)): _*)
    kept
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
  }
}

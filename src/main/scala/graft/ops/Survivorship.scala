package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survivorship (golden-record merge): collapse the duplicate / change-log
  * records of an entity into one best record — the step AFTER matching in
  * an entity-resolution pipeline ([[FuzzyJoin]] finds the pairs,
  * [[Components]] clusters them, this merges each cluster), and equally
  * the "current state" read over a sparse CDC feed where each update
  * carries only the fields it changed.
  *
  * Rule implemented: per field, the most recent NON-NULL value — sparse
  * updates never erase an attribute with their own null. That is
  * `max_by(field, seq WHERE field IS NOT NULL)`: rows whose ordering
  * expression is null are ignored by max_by in Spark exactly as by
  * `arg_max` in DuckDB, which is what makes the rule engine-portable.
  *
  * Scale shape: ONE hash aggregation on the entity key — partials
  * combine map-side, so a key's records never co-locate before being
  * reduced; no window, no sort, no join. This is deliberately stronger
  * at scale than last-write-wins via window-rank (which must sort every
  * group) — field-wise max_by needs only a running (value, seq) pair
  * per field per key.
  */
object Survivorship {

  /** One golden record per key: each of `valueCols` resolved to its
    * latest non-null value by `seqCol`, plus `n_records` and `last_seq`
    * provenance. `seqCol` must totally order a key's records (a version
    * number, an event id — ties make the winner undefined).
    */
  def merge(
      df: DataFrame,
      keyCols: Seq[String],
      seqCol: Column,
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val resolved = valueCols.map { c =>
      max_by(col(c), when(col(c).isNotNull, seqCol)).as(c)
    }
    val aggs = Seq(count(lit(1)).as("n_records"), max(seqCol).as("last_seq")) ++ resolved
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-wise feature normalization — the scaling step between raw
  * metrics and anything rank-, threshold- or model-shaped downstream.
  * Exact-integer outputs (ppm of the group range) keep results
  * order-independent and engine-portable, unlike float mean/std scaling.
  */
object Normalize {

  /** Min-max scale `valueCol` (integer) within each `groupCols` group to
    * parts-per-million of the group's range:
    * `scaled_ppm = ⌊1e6·(x − min) / (max − min)⌋` (0 for a constant
    * group). Adds `scaled_ppm` beside the input columns.
    *
    * Scale shape: the group extrema come from a window over one hash
    * shuffle on the group key — no join, no second pass over the data;
    * every row carries its group min/max out of the same exchange a
    * per-group aggregate would use. Magnitude guard: |value| ≤ ~9·10⁹
    * keeps 1e6·(x−min) inside Long.
    */
  def minMaxPpm(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    val v = col(valueCol).cast("long")
    df
      .withColumn("__min", min(v).over(w))
      .withColumn("__max", max(v).over(w))
      .withColumn("scaled_ppm",
        when(col("__max") === col("__min"), lit(0L))
          .otherwise(floor(lit(1000000L) * (v - col("__min")) /
            (col("__max") - col("__min")))))
      .drop("__min", "__max")
  }

  /** Dictionary-encode a categorical column: dense integer codes 1..n in
    * the value's sort order — label encoding for feature pipelines, and
    * the id-assignment step of building any dimension table. Sort-order
    * codes (not first-seen order) are what make the assignment
    * deterministic and reproducible across runs and engines.
    *
    * Scale shape: codes are assigned on the DISTINCT values (dimension-
    * sized — the window's single reducer sees categories, never rows),
    * then broadcast-joined back; the fact table is never shuffled. This
    * is the distinct→rank→broadcast pattern, NOT a window over the fact
    * table.
    */
  def dictEncode(df: DataFrame, valueCol: String, codeCol: String = "code"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(valueCol))
    val dict = df.select(col(valueCol)).distinct()
      .withColumn(codeCol, row_number().over(w).cast("long"))
    df.join(broadcast(dict), Seq(valueCol))
  }
}

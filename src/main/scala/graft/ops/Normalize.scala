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
}

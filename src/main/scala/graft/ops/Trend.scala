package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group linear trend in EXACT integer arithmetic — "is this series
  * going up or down, and how fast" over millions of groups in one
  * aggregation pass, without the cross-engine float drift of the built-in
  * `regr_slope` family (whose running sums differ in the last ulps with
  * partitioning/merge order).
  *
  * The least-squares slope over points (x, y) is
  * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`. With integer x and y, numerator
  * and denominator are exact integer aggregates — associative,
  * commutative, partitioning-independent. We emit them unscaled (plus the
  * sign) and leave the one float division to the caller's presentation
  * layer: every engine computes the identical integers.
  *
  * Scale shape: a single hash aggregation on the group key with map-side
  * partials — the cheapest possible wide shape; nothing else shuffles.
  * Precision: |numerator| ≤ n²·max|x|·max|y| — pick x as a SMALL index
  * (month number, not epoch millis) so 64-bit never overflows; with
  * n ≤ 10⁴, x ≤ 10⁴ and y ≤ 10¹⁰ cents the products stay < 2⁶³.
  */
object Trend {

  /** One row per group: `n`, `slope_num`, `slope_den` (slope =
    * num/den when den ≠ 0; den = 0 ⟺ all x equal) and `trend` ∈
    * {-1, 0, 1} = sign(slope_num) — valid because the denominator is
    * n·Var(x)·n ≥ 0, and identically-zero numerator whenever it is 0.
    */
  def linear(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
      .select(
        groupCols.map(col) ++ Seq(
          col("n"),
          (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("slope_num"),
          (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("slope_den"),
          signum(col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("long")
            .as("trend")): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the standard longitudinal engagement view
  * an analytics engine owes its users: group entities by the period of
  * their FIRST activity (the cohort), then count how many of each cohort
  * are still active 1, 2, … periods later. The reference's per-client
  * metric rollups (SURVEY §3 EP3) are single-period; this is the
  * cross-period generalization.
  *
  * Scale shape: one window min over the entity key (single shuffle on
  * the key — the same partitioning a per-entity metric rollup already
  * uses) followed by one narrow aggregation on (cohort, age). No join:
  * the cohort period rides along each activity row via the window, so
  * nothing is re-shuffled wide. `countDistinct` at the end is exact and
  * shuffles only (cohort, age, key) triples — at 100 TB swap in
  * `approx_count_distinct` per the q43 error-contract pattern if the
  * key cardinality per cell overwhelms the exact path.
  */
object Cohort {

  /** Retention matrix rows: (cohort, age, n_active) — `n_active` distinct
    * `keyCol` entities whose first-ever period equals `cohort` and who
    * were active in period `cohort + age`.
    *
    * @param periodCol integer period index (e.g. `year*12 + month`);
    *                  integer periods keep the output exactly portable
    *                  across engines (no calendar/timezone drift)
    */
  def retention(df: DataFrame, keyCol: String, periodCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    df.select(col(keyCol), periodCol.cast("long").as("__m"))
      .select(col(keyCol), col("__m"), min(col("__m")).over(w).as("cohort"))
      .groupBy(col("cohort"), (col("__m") - col("cohort")).as("age"))
      .agg(count_distinct(col(keyCol)).as("n_active"))
  }
}

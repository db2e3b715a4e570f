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

  /** RFM segmentation: per entity, Recency (days since its last activity,
    * relative to the dataset's latest date), Frequency (activity count)
    * and Monetary (summed integer amount), each quintile-scored 1..k by
    * `ntile` — the classic customer-value segmentation grid.
    *
    * Determinism: each ntile orders by (metric, entity id) — the unique
    * tiebreak that makes bucket assignment engine-portable.
    *
    * Scale shape: the base is one narrow aggregation on the entity key;
    * the dataset max date is a 1-row broadcast. The three ntile windows
    * are GLOBAL sorts of the entity-grain table — fine at customer grain
    * (orders of magnitude below event grain); at billions of entities
    * swap ntile for comparison against broadcast `approx_percentile`
    * boundaries, trading exact equal-frequency buckets for ε-rank error.
    */
  def rfm(
      df: DataFrame,
      keyCol: String,
      dateCol: Column,
      amountCents: Column,
      k: Int = 5): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    import org.apache.spark.sql.expressions.Window
    val per = df.groupBy(col(keyCol)).agg(
      max(to_date(dateCol)).as("__last"),
      count(lit(1)).as("frequency"),
      sum(amountCents).as("monetary_cents"))
    val mx = per.agg(max(col("__last")).as("__mx"))
    val base = per.crossJoin(broadcast(mx))
      .withColumn("recency_days", datediff(col("__mx"), col("__last")).cast("long"))
      .drop("__last", "__mx")
    def score(metric: String): Column =
      ntile(k).over(Window.orderBy(col(metric), col(keyCol))).cast("long")
    base
      .withColumn("r_bucket", score("recency_days"))
      .withColumn("f_bucket", score("frequency"))
      .withColumn("m_bucket", score("monetary_cents"))
  }
}

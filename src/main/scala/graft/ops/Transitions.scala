package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-order Markov transition statistics over per-entity ordered event
  * sequences — the model behind next-event prediction, funnel drop-off
  * analysis ([[Funnel]] asks "did the ordered stages happen"; this asks
  * "what follows what, how often") and session-shape anomaly detection.
  *
  * Output is exact integers plus a ppm probability of integer counts:
  * `p_ppm = ⌊1e6·n(u→v) / n(u→·)⌋` — portable across engines because no
  * float accumulates; the division happens once on final counts.
  */
object Transitions {

  /** (from_state, to_state, n, p_ppm) over consecutive event pairs within
    * each `keyCol` sequence, ordered by `orderCols` (must totally order
    * events within a key — pass a tiebreaker, the [[Sessionize]] rule).
    *
    * Scale shape: one shuffle partitions by key for the `lag` window (the
    * same sort a sessionizer already pays), then two narrow aggregations
    * on state pairs — counts combine map-side, and the final join of
    * pair-counts to from-state totals is on a state-cardinality table
    * (tiny; broadcast). Nothing corpus-sized is ever re-shuffled.
    */
  def matrix(df: DataFrame, keyCol: String, stateCol: String, orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val pairs = df
      .select(col(keyCol), col(stateCol).as("to_state"),
        lag(col(stateCol), 1).over(w).as("from_state"))
      .where(col("from_state").isNotNull)
    val n = pairs.groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
    val totals = n.groupBy("from_state").agg(sum("n").as("__total"))
    n.join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        floor(lit(1000000L) * col("n") / col("__total")).as("p_ppm"))
  }

  /** Top observed paths: the first `maxSteps` states of each key's
    * ordered sequence joined into one `a->b->c` string, counted across
    * keys — the "what do sessions actually look like" query behind
    * user-journey dashboards (where [[matrix]] is memoryless, a path
    * keeps full order up to the horizon).
    *
    * Scale shape: `row_number ≤ maxSteps` BEFORE any collection bounds
    * per-key state to `maxSteps` elements — the aggregate buffers at
    * most `maxSteps` tiny structs per key, never a whole session — then
    * path counts combine map-side like any groupBy. One window shuffle
    * + one count shuffle on path strings ≤ `maxSteps` tokens long.
    */
  def topPaths(
      df: DataFrame,
      keyCol: String,
      stateCol: String,
      orderCols: Seq[Column],
      maxSteps: Int): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(maxSteps >= 1 && maxSteps <= 64, s"maxSteps must be in [1, 64]: $maxSteps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxSteps)
      .groupBy(col(keyCol))
      .agg(collect_list(struct(col("__rn"), col(stateCol).as("s"))).as("__steps"))
      .select(concat_ws("->",
        transform(sort_array(col("__steps")), x => x("s"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Sliding state k-grams: every length-`k` window of consecutive
    * states within a key's ordered sequence, counted across keys — the
    * higher-order sequence-mining middle ground between [[matrix]]
    * (memoryless pairs) and [[topPaths]] (prefix-anchored whole paths):
    * `a→b→c` counts wherever it occurs, not only at sequence starts.
    * Emits `(s1 … sk, n, share_ppm)` over all observed k-grams.
    *
    * Scale shape: one per-key window shuffle feeding `k−1` `lead`
    * columns over the SAME window spec (one WindowExec, no extra
    * exchanges), then a map-side-combined count on state tuples — the
    * shuffle after the window carries k-gram tuples, never sequences.
    */
  def ngrams(
      df: DataFrame,
      keyCol: String,
      stateCol: String,
      orderCols: Seq[Column],
      k: Int): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(k >= 2 && k <= 8, s"k must be in [2, 8]: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val stateCols = (1 to k).map(i => s"s$i")
    val withLeads = (2 to k).foldLeft(
      df.select((Seq(col(keyCol), col(stateCol).as("s1")) ++ orderCols): _*)) { (acc, i) =>
      acc.withColumn(s"s$i", lead(col("s1"), i - 1).over(w))
    }
    val grams = withLeads
      .where(col(s"s$k").isNotNull)
      .groupBy(stateCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val total = grams.groupBy().agg(sum(col("n")).as("__total"))
    grams.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(1000000L * n) div __total"))
      .drop("__total")
  }
}

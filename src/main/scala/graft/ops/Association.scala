package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association rules — support / confidence / lift over
  * item pairs that co-occur in a basket (an order, a session, a
  * document): the classic "people who bought A also bought B" mining
  * pass, and in a training-data pipeline the co-occurrence screen that
  * surfaces template pairs and topical bundles before any embedding
  * model exists. All-integer evidence: pair and item basket counts are
  * exact, support/confidence publish as truncated ppm and lift as
  * truncated milli (`lift = N·c_ab / (c_a·c_b)`, > 1000 ⇒ positive
  * association), so every engine reproduces the identical rows.
  *
  * Scale shape: baskets dedupe to distinct (basket, item) once, then
  * the pair expansion is an equi-join on the BASKET key — Σ_b s_b²
  * pairs where s_b is basket size (retail orders: single digits;
  * documents-as-baskets: cap the item set per basket upstream). Item
  * supports attach via two joins against the item-catalog-sized count
  * table, and `minPairCount` prunes the pair stream BEFORE those joins
  * so the long tail of once-seen pairs never shuffles twice. No
  * all-pairs over the catalog anywhere.
  */
object Association {

  /** Rules over unordered co-occurring pairs, one row per pair
    * (item_a < item_b) with both rule directions' confidence:
    * (item_a, item_b, n_ab, n_a, n_b, n_baskets, support_ppm,
    * conf_a_b_ppm, conf_b_a_ppm, lift_milli).
    *
    * @param minPairCount emit only pairs co-occurring in at least this
    *                     many baskets (support pruning — Apriori's
    *                     frequent-pair step)
    */
  def rules(
      df: DataFrame,
      basketCol: Column,
      itemCol: Column,
      minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1: $minPairCount")
    val items = df
      .select(basketCol.cast("long").as("__b"), itemCol.cast("long").as("__it"))
      .where(col("__b").isNotNull && col("__it").isNotNull)
      .distinct()
    val itemCounts = items.groupBy(col("__it")).agg(count(lit(1)).as("__c"))
    // one-row basket universe size, broadcast onto the pair stream
    val n = items.select(col("__b")).distinct().agg(count(lit(1)).as("n_baskets"))
    val pairs = items.select(col("__b"), col("__it").as("item_a"))
      .join(items.select(col("__b"), col("__it").as("item_b")), Seq("__b"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.select(col("__it").as("item_a"), col("__c").as("n_a")), Seq("item_a"))
      .join(itemCounts.select(col("__it").as("item_b"), col("__c").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_baskets"),
        expr("(1000000L * n_ab) div n_baskets").as("support_ppm"),
        expr("(1000000L * n_ab) div n_a").as("conf_a_b_ppm"),
        expr("(1000000L * n_ab) div n_b").as("conf_b_a_ppm"),
        expr("(1000L * n_baskets * n_ab) div (n_a * n_b)").as("lift_milli"))
  }
}

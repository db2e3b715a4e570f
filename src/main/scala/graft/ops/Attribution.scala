package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-touch attribution over per-entity event journeys. The reference
  * surface stops at last-touch (q92, [[AsOfJoin]] + rollup); this adds the
  * position-based ("U-shaped") model, credit-split entirely in integer
  * basis points so every engine replays it bit-for-bit.
  */
object Attribution {

  /** Position-based (U-shaped) attribution: each entity's touches BEFORE
    * its first conversion share 10 000 basis points —
    *
    *  - 1 touch: 10 000;
    *  - 2 touches: 5 000 each;
    *  - n ≥ 3: first 4 000, last 4 000, the n−2 middles split 2 000 by
    *    largest-remainder (floor each, earliest middles take the +1s) —
    *    so Σ per journey is EXACTLY 10 000, no float credit leakage.
    *
    * Output: one row per credited touch — (entity, touch id, position,
    * n_touches, weight_bp). Entities with no conversion (or no touch
    * before it) emit nothing.
    *
    * Scale shape: one window shuffle on the entity key does everything —
    * the first-conversion timestamp (min-over-partition), the touch
    * ordering, and the position/count columns come from the same
    * exchange + sort; credit assignment is then a pure per-row integer
    * expression. No joins, no driver state.
    */
  def positionBased(
      events: DataFrame,
      entityCol: String,
      orderCols: Seq[org.apache.spark.sql.Column],
      idCol: String,
      isTouch: org.apache.spark.sql.Column,
      isConversion: org.apache.spark.sql.Column): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy(col(entityCol))
    val wOrd = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    // min(struct(order…)) of conversions = the first conversion's sort key;
    // struct comparison is lexicographic over the same order columns.
    val convKey = min(when(isConversion, struct(orderCols: _*))).over(wAll)
    val touches = events
      .withColumn("__conv", convKey)
      .where(isTouch && col("__conv").isNotNull &&
        struct(orderCols: _*) < col("__conv"))
    val ranked = touches
      .withColumn("position", row_number().over(wOrd).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wAll).cast("long"))
    ranked.select(
      col(entityCol), col(idCol), col("position"), col("n_touches"),
      when(col("n_touches") === 1, 10000L)
        .when(col("n_touches") === 2, 5000L)
        .when(col("position") === 1 || col("position") === col("n_touches"), 4000L)
        .otherwise(
          // middle i (1-based among middles) = position − 1
          expr("2000L div (n_touches - 2)") +
            when(col("position") - 1 <= expr("2000L % (n_touches - 2)"), 1L)
              .otherwise(0L))
        .as("weight_bp"))
  }
}

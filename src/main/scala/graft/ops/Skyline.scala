package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated by any other —
  * dominated meaning another row is ≤ on the minimized axis AND ≥ on the
  * maximized axis with at least one strict inequality. The
  * cost/benefit shortlist query (cheapest sources per quality tier,
  * fastest configs per accuracy, ...).
  *
  * Algorithm (no O(n²) self-join): in x-ascending order the frontier is
  * exactly the rows that strictly improve the running maximum of y.
  * With integer x both tests are window frames:
  *   - dominated by a strictly-cheaper row ⇔
  *     `max(y) RANGE (unbounded, x−1] ≥ y`;
  *   - dominated within the same x ⇔ `max(y) OVER (PARTITION BY x) > y`.
  * Ties: identical (x, y) points do not dominate each other — all kept.
  *
  * Scale shape: skyline(S) = skyline(∪ local skylines), so phase 1 runs
  * the window per hash bucket (parallel, each bucket's frontier is tiny
  * for any realistic distribution) and phase 2 re-runs it globally on
  * the survivors only. The global single-reducer window therefore sees
  * the union of bucket frontiers, not the input — the standard
  * divide-and-merge skyline plan.
  */
object Skyline {

  /** Frontier of `df` minimizing integer `minCol` and maximizing integer
    * `maxCol`. Preserves all input columns.
    *
    * @param buckets phase-1 parallelism; any value gives the same answer
    */
  def frontier2d(df: DataFrame, minCol: String, maxCol: String, buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    def pass(in: DataFrame, partCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val wPrev = Window.partitionBy(partCols: _*).orderBy(col(minCol))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wSame = Window.partitionBy(partCols :+ col(minCol): _*)
      in
        .withColumn("__prev_best", max(col(maxCol)).over(wPrev))
        .withColumn("__same_best", max(col(maxCol)).over(wSame))
        .where((col("__prev_best").isNull || col("__prev_best") < col(maxCol)) &&
          col("__same_best") === col(maxCol))
        .drop("__prev_best", "__same_best")
    }
    val local = pass(
      df.withColumn("__b", pmod(hash(col(minCol), col(maxCol)), lit(buckets))),
      Seq(col("__b"))).drop("__b")
    pass(local, Seq.empty)
  }
}

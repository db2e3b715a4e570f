package graft.io

import org.apache.spark.sql.DataFrame

/** Ensure a DataFrame has at least default-parallelism partitions before
  * CPU-heavy per-row work. Real at-scale inputs arrive in many splits and
  * this is a no-op; only tiny single-row-group local files (every table in
  * the sf0.x test corpus is one row group, hence one scan task) pay one
  * cheap round-robin exchange to unlock the other cores. Never reduces
  * partitioning, never changes results — order-sensitive operators in this
  * library pin their own ordering explicitly (SURVEY §2 J5).
  */
object Spread {
  def toDefaultParallelism(df: DataFrame): DataFrame = {
    // streaming plans can't be probed via .rdd (and their partitioning is
    // the micro-batch planner's job) — pass through, so batch operators
    // that spread themselves stay reusable verbatim inside streams
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for repeated co-located joins.
  *
  * A big⋈big equi-join shuffles both sides every run. When the same join
  * key is hit run after run (fact ⋈ fact correlation, incremental
  * backfills), pre-bucketing both tables on that key pays the shuffle
  * once at write time: Spark records the hash-bucket layout in the
  * catalog, and subsequent sort-merge joins read matching buckets
  * directly — zero `Exchange` in the plan, which at 100 TB is the
  * difference between a network-bound job and a scan-bound one.
  *
  * Bucket count is a layout decision: pick so one bucket of the larger
  * table fits an executor's memory (`rows × rowWidth / nBuckets`), and
  * keep it identical on both sides — mismatched counts fall back to a
  * shuffle on one side.
  */
object Bucketing {

  /** Persist `df` as a bucketed (+ sorted, for merge-join readiness)
    * managed table. Overwrites any existing table of that name.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keyCol: String,
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, keyCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planned as a
    * shuffle-free sort-merge join when bucket layouts line up.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy MAX-COVERAGE subset selection — the diverse-subset curation
  * primitive: pick k documents that together cover as much of the
  * vocabulary (or any exploded feature set) as possible. The greedy
  * rule (always take the document adding the most uncovered features,
  * ties to the smallest id) carries Nemhauser–Wolsey–Fisher's (1−1/e)
  * optimality guarantee for submodular coverage — the principled core
  * of "pick a small, maximally-informative eval/annotation set".
  */
object Coverage {

  /** k greedy picks over an (id, feature) pair table — vocabulary
    * words, bigrams, shingle hashes, covered entities: whatever the
    * caller explodes. Returns one row per pick:
    * `(pick, doc_id, gain, covered_total)` — the round, the chosen doc,
    * how many NEW features it contributed, and the running covered-set
    * size. Stops early (fewer rows) once everything coverable is
    * covered. Deterministic: gain desc, id asc.
    *
    * Scale shape per round: one feature-keyed anti-join (the pair
    * table vs the covered set) + one map-side-combined count per doc +
    * a distributed top-1 (`TakeOrderedAndProject`); the ONLY driver
    * fetch is the single winning row per round (k rows total — the
    * sequential dependence is inherent to greedy submodular selection;
    * k is a curation budget, never data-sized). The covered set is
    * staged per round so the anti-join reads a leaf.
    */
  def greedyMaxCoverage(
      pairs: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      featureCol: String = "token",
      reliable: Boolean = false): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1,1000]: $k")
    val spark = pairs.sparkSession
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def staged(df: DataFrame): DataFrame = {
      val s = Staging.stage(df, reliable); frames += s; s
    }
    val toks = staged(pairs
      .select(col(idCol).cast("long").as("id"),
        col(featureCol).cast("string").as("token"))
      .distinct())
    var covered = staged(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("token STRING")))
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var total = 0L
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      round += 1
      // ONE row to the driver: the argmax doc of this round
      val win = toks.join(covered, Seq("token"), "left_anti")
        .groupBy(col("id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id").asc)
        .limit(1).collect()
      if (win.isEmpty) exhausted = true
      else {
        val id = win(0).getLong(0)
        val gain = win(0).getLong(1)
        total += gain
        picks += ((round.toLong, id, gain, total))
        covered = staged(covered.unionByName(
          toks.where(col("id") === id).select(col("token"))).distinct())
      }
    }
    val out = Staging.stage(
      spark.createDataFrame(picks.toSeq)
        .toDF("pick", "doc_id", "gain", "covered_total"),
      reliable)
    if (reliable) {
      out.count()
      frames.foreach(_.unpersist())
    }
    out
  }
}

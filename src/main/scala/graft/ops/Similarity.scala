package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star: similarity search).
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set,
  *    one codegen'd cosine per (row, query), per-query top-k via window.
  *    Linear in corpus size, no corpus shuffle: the 100 TB-scan shape.
  *  - [[lshTopK]]: scale path — corpus pre-bucketed by random-hyperplane
  *    LSH; queries probe only their own bucket, turning the scan into a
  *    bucket-equi-join. Recall < 1, cost ~ corpus/2^bits per query.
  *  - [[ivfTopK]]: IVF variant — corpus assigned to the nearest of k
  *    centroid rows (a broadcast list), queries probe `nProbe` nearest
  *    centroids' partitions.
  */
object Similarity {

  /** Project to (renamed id, unit-normalized vector). The norm is staged in
    * its own projection so it computes once per row; the follow-up select
    * is not collapsed into it because the (expensive) norm attribute is
    * referenced more than once.
    */
  private[ops] def unitized(df: DataFrame, idCol: String, outId: String, vecCol: String, outVec: String): DataFrame =
    df.select(col(idCol).as(outId), col(vecCol).as("__v"), VectorFunctions.norm(col(vecCol)).as("__n"))
      .select(col(outId), VectorFunctions.unitizeWith(col("__v"), col("__n")).as(outVec))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (id, vec) rows — arbitrarily large
    * @param queries (query_id, vec) rows — small enough to broadcast
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .crossJoin(broadcast(queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("q_vec"))))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("c_vec"), col("q_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** LSH-bucketed ANN with banded OR-amplification: each vector lands in
    * one bucket per band; queries probe the union of their band-buckets.
    * More bands → higher recall, more candidates scored.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nBits: Int = 8,
      bands: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    // Unit-normalize before bucketing (signs of hyperplane projections are
    // scale-invariant, so buckets are unchanged) → pair scoring is one dot.
    def bucketize(df: DataFrame, id: String, outId: String, vec: String, outVec: String): DataFrame =
      unitized(df, id, outId, vec, outVec).select(
        col(outId), col(outVec),
        posexplode(array((0 until bands).map(bd =>
          VectorFunctions.simhashBucket(col(outVec), nBits, seed = bd)): _*)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bucket")
    val bucketedCorpus = bucketize(corpus, idCol, "neighbor_id", vecCol, "c_vec")
    val bucketedQueries = bucketize(queries, queryIdCol, "query_id", vecCol, "q_vec")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    bucketedCorpus.join(broadcast(bucketedQueries), Seq("band", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.dot(col("c_vec"), col("q_vec")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF ANN: assign corpus rows to their nearest centroid, probe the
    * `nProbe` nearest centroids per query. Centroids are any representative
    * sample (e.g. `corpus.limit(nCentroids)` or k-means out of band);
    * correctness degrades gracefully with centroid quality.
    *
    * The centroid table is small by construction (that is the point of
    * IVF), so it is collected and inlined as literal arrays — centroid
    * assignment becomes a **map-only codegen'd projection** over the
    * corpus: no crossJoin, no per-row window, no corpus shuffle. At 100 TB
    * the corpus is touched exactly once before the (broadcast) probe join;
    * the only shuffle is the final per-query top-k over candidates.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int = 10,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    // Collect + unit-normalize centroids driver-side (equivalent to a
    // broadcast — IVF centroid sets are thousands of rows at most), sorted
    // by id so argmax ties resolve to the smallest centroid id.
    val centRows = centroids.select(col(centroidIdCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val centVecs: Column = typedLit(centRows.map { case (_, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v.map(_ => 0.0)
    }.toSeq)
    val centIds: Column = typedLit(centRows.map(_._1).toSeq)

    // score vector (dot against every centroid) staged as its own column so
    // downstream argmax / top-n expressions don't recompute it.
    def scored(df: DataFrame, vec: String): DataFrame =
      df.withColumn("__cs", transform(centVecs, c => VectorFunctions.dot(col(vec), c)))

    // Corpus: nearest centroid = first position of the max score (1-based).
    val assignedCorpus = scored(unitized(corpus, idCol, "neighbor_id", vecCol, "c_vec"), "c_vec")
      .withColumn("c_id", element_at(centIds, array_position(col("__cs"), array_max(col("__cs"))).cast("int")))
      .drop("__cs")
    // Queries: top-nProbe centroids via sort of (-score, id) structs — all
    // map-side; struct field order gives (score desc, id asc).
    val assignedQueries = scored(unitized(queries, queryIdCol, "query_id", vecCol, "q_vec"), "q_vec")
      .withColumn("c_id", explode(slice(
        array_sort(zip_with(col("__cs"), centIds, (s, i) => struct((-s).as("neg"), i.as("c_id")))),
        1, nProbe).getField("c_id")))
      .drop("__cs")
    // Each corpus row has exactly one centroid and each query probes
    // distinct centroids, so (query_id, neighbor_id) pairs are unique — no
    // dedup needed before ranking.
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    assignedCorpus.join(broadcast(assignedQueries), Seq("c_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.dot(col("c_vec"), col("q_vec")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}

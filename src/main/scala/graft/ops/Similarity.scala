package graft.ops

import org.apache.spark.sql.DataFrame
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
    def bucketize(df: DataFrame, id: String, outId: String, vec: String, outVec: String): DataFrame =
      df.select(
        col(id).as(outId), col(vec).as(outVec),
        posexplode(array((0 until bands).map(bd =>
          VectorFunctions.simhashBucket(col(vec), nBits, seed = bd)): _*)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bucket")
    val bucketedCorpus = bucketize(corpus, idCol, "neighbor_id", vecCol, "c_vec")
    val bucketedQueries = bucketize(queries, queryIdCol, "query_id", vecCol, "q_vec")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    bucketedCorpus.join(broadcast(bucketedQueries), Seq("band", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("c_vec"), col("q_vec")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF ANN: assign corpus rows to their nearest centroid (broadcast),
    * probe the `nProbe` nearest centroids per query. Centroids are any
    * representative sample (e.g. `corpus.limit(nCentroids)` or k-means out
    * of band); correctness degrades gracefully with centroid quality.
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
    val cent = broadcast(centroids.select(col(centroidIdCol).as("c_id"), col(vecCol).as("cent_vec")))

    def assign(df: DataFrame, vecName: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("__rid")).orderBy(col("__cd").desc, col("c_id"))
      df.crossJoin(cent)
        .withColumn("__cd", VectorFunctions.cosine(col(vecName), col("cent_vec")))
        .withColumn("__cr", row_number().over(w))
        .where(col("__cr") <= keep)
        .drop("cent_vec", "__cd", "__cr")
    }

    val assignedCorpus = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col(idCol).as("__rid")),
      "c_vec", 1).drop("__rid")
    val assignedQueries = assign(
      queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("q_vec"), col(queryIdCol).as("__rid")),
      "q_vec", nProbe).drop("__rid")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    assignedCorpus.join(broadcast(assignedQueries), Seq("c_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("c_vec"), col("q_vec")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction — term → posting list, the retrieval-side
  * data structure [[Bm25]] scores against. Building it IS a distributed
  * aggregation problem: the posting list of a common term ("the") is as
  * long as the corpus, so an index builder must bound what any single
  * reducer materializes.
  */
object Indexing {

  /** Posting-list summary per term: (term, df, postings) where `postings`
    * is the first `k` doc ids in ascending order, comma-joined. Terms
    * are distinct-per-doc (presence, not frequency — [[Bm25.stats]]
    * owns tf).
    *
    * Scale shape: explode to (term, doc_id) pairs — distinct within doc
    * via `array_distinct` BEFORE the explode, so the shuffle carries one
    * pair per (doc, term), not per token occurrence. The bounded-k
    * posting prefix means no reducer ever holds an unbounded list …
    * almost: `collect_list` buffers each term's group before the
    * sort+slice, so this form is exact-but-bounded only with a df cap or
    * pre-truncation; the scalable exact form for full posting lists is a
    * (term, doc_id)-sorted WRITE (partitionBy(term) sort_within), which
    * [[graft.io.Bucketing]] covers. `k` here bounds the oracled surface.
    */
  def postingSummary(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    Dedup.parallelize(docs)
      .select(col(idCol).cast("long").as("id"),
        explode(array_distinct(Dedup.wordTokens(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        concat_ws(",", slice(sort_array(collect_list(col("id"))), 1, k)).as("postings"))
  }

  /** Bitmap index of categorical presence per key: each category from
    * the CLOSED `categories` list owns one bit; per key emit the OR of
    * the bits seen (`cat_mask`) and its popcount (`n_cats`). The "which
    * event types has this user ever fired" profile as ONE Long per key —
    * set algebra over entities (users who did A and B but never C)
    * becomes bitwise AND/OR on the mask instead of k semi-joins.
    *
    * Scale shape: a single hash aggregation — `bit_or` partials combine
    * map-side, the shuffle carries one Long per (partition, key).
    * Categories outside the list map to no bit (count them upstream if
    * that matters); ≤ 63 categories by construction.
    */
  def categoryBitmap(
      df: DataFrame,
      keyCols: Seq[String],
      catCol: String,
      categories: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(categories.nonEmpty && categories.size <= 63,
      s"need 1..63 categories: ${categories.size}")
    require(categories.distinct.size == categories.size, "categories must be distinct")
    val bit = categories.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (c, i)) => when(col(catCol) === c, lit(1L << i)).otherwise(acc)
    }
    df.groupBy(keyCols.map(col): _*)
      .agg(bit_or(bit).as("cat_mask"))
      .withColumn("n_cats", bit_count(col("cat_mask")).cast("long"))
  }
}

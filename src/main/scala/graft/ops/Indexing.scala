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
}

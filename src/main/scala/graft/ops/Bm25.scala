package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BM25 relevance scoring — the retrieval primitive for
  * corpus search / query-based filtering (e.g. "find training docs
  * relevant to this eval prompt").
  *
  * Scale shape: the query term set is tiny and broadcasts; per-document
  * term frequencies come from one explode→filter-to-query-terms pass
  * (rows shrink to |query| per doc BEFORE any shuffle); document
  * frequencies aggregate (term, partial count) pairs. Document bodies
  * never shuffle, and nothing is quadratic.
  */
object Bm25 {

  /** Exact integer statistics feeding BM25: one row per (doc, query term)
    * with the term's in-doc frequency, corpus document frequency, and the
    * document length — plus the corpus size and average length as columns
    * (constant per row, kept so the frame is self-contained).
    */
  def stats(docs: DataFrame, queryTerms: Seq[String], idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tokens = Dedup.parallelize(docs)
      .select(col(idCol).as("doc_id"), Dedup.wordTokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__w"), size(col("__w")).as("doc_len"))
    val perTerm = tokens
      .select(col("doc_id"), col("doc_len"), explode(col("__w")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("doc_len"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = perTerm.groupBy("term").agg(count(lit(1)).as("df"))
    val corpus = tokens.agg(
      count(lit(1)).as("n_docs"),
      sum(col("doc_len")).cast("double").as("__total_len"))
    perTerm
      .join(docFreq, "term")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("doc_len").cast("long").as("doc_len"),
        col("n_docs"),
        (col("__total_len") / col("n_docs")).as("avg_len"))
  }

  /** BM25 score per document for the query (sum over matched terms).
    * Standard Robertson/Sparck-Jones idf with the +1 smoothing
    * (`ln(1 + (N - df + 0.5)/(df + 0.5))`), k1/b defaults per the
    * literature.
    */
  def score(
      docs: DataFrame,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val s = stats(docs, queryTerms, idCol, textCol)
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("doc_len") / col("avg_len")))
    s.select(col("doc_id"), (idf * tfNorm).as("term_score"))
      .groupBy("doc_id")
      .agg(sum(col("term_score")).as("bm25"))
  }
}

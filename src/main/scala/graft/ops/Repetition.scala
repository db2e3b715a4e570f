package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for LLM corpus filtering — the
  * word-level analogues of the Gopher/MassiveText repetition rules
  * (duplicate-line / duplicate-n-gram / top-n-gram fractions): highly
  * repetitive documents are boilerplate or spam and get filtered before
  * training.
  *
  * Scale shape: the only shuffle carries (doc_id, bigram-hash, count)
  * partial aggregates — bigrams are 64-bit-hashed BEFORE the exchange so
  * row width is constant however long the words are, and map-side partial
  * aggregation collapses each document's repeats first. Document bodies
  * never shuffle.
  */
object Repetition {

  /** Per-document repetition fractions:
    *  - `dup_word_frac`: fraction of word occurrences that repeat an
    *    earlier word (1 − distinct/total)
    *  - `dup_bigram_frac`: same over adjacent word bigrams
    *  - `top_bigram_frac`: occurrences of the most frequent bigram over
    *    all bigram occurrences
    * Documents with fewer than 2 words report 0.0 for the bigram metrics.
    */
  def signals(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = Dedup.parallelize(docs)
      .select(col(idCol).as("doc_id"), Dedup.wordTokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__w"), size(col("__w")).as("n"))
      .select(col("doc_id"), col("__w"), col("n"),
        (col("n") - size(array_distinct(col("__w")))).cast("double").as("__dup_words"))
    val bigramCounts = base.where(col("n") >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, n - 2), i -> xxhash64(__w[i], __w[i+1]))")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("__distinct_b"),
        sum(col("c")).as("__b"),
        max(col("c")).as("__max_c"))
    base.join(bigramCounts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("n") > 0, col("__dup_words") / col("n")).otherwise(0.0).as("dup_word_frac"),
        when(col("__b") > 0, (col("__b") - col("__distinct_b")).cast("double") / col("__b"))
          .otherwise(0.0).as("dup_bigram_frac"),
        when(col("__b") > 0, col("__max_c").cast("double") / col("__b"))
          .otherwise(0.0).as("top_bigram_frac"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the prep step for embedding /
  * retrieval pipelines: long documents become overlapping fixed-size word
  * windows, each embedded and indexed separately.
  *
  * Map-only: tokenize → per-row window starts → explode. No shuffle at
  * all; output size is rows × ceil(n/step), bounded and predictable, which
  * is exactly what a 100 TB chunking pass needs (it's a flatMap, not an
  * aggregation).
  */
object Chunking {

  /** One row per (document, window): `chunk_id` counts windows from 0,
    * `chunk` is the space-joined word window, `n_words` its length (the
    * final window may be shorter). Windows start every
    * `chunkSize - overlap` words, and a window only exists if it
    * contributes at least one token beyond the overlap it shares with its
    * predecessor (start < n − overlap, first window excepted) — otherwise
    * the tail window would be a strict subset of the previous one and the
    * duplicate text would be embedded/indexed twice downstream. Empty
    * documents emit nothing.
    */
  def byWords(
      docs: DataFrame,
      chunkSize: Int,
      overlap: Int = 0,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "overlap must be in [0, chunkSize)")
    val step = chunkSize - overlap
    Dedup.parallelize(docs)
      .select(col(idCol).as("doc_id"), Dedup.wordTokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__w"), size(col("__w")).as("__n"))
      .where(col("__n") > 0)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), greatest(col("__n") - lit(overlap) - 1, lit(0)), lit(step)), s => {
          val window = slice(col("__w"), s + 1, lit(chunkSize))
          struct(
            (s / step).cast("long").as("chunk_id"),
            concat_ws(" ", window).as("chunk"),
            size(window).as("n_words"))
        })).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.chunk"), col("c.n_words"))
  }

  /** Sentence-aligned chunking: split on `[.!?]+`, then assign each
    * sentence to chunk `⌊words_before / budget⌋` — sentences are NEVER
    * split across chunks (the retrieval-quality property plain
    * [[byWords]] windows can't give), chunks hold ≈ `budget` words (a
    * long sentence can push a chunk over — the standard accepted slack),
    * and the assignment is a closed-form function of the prefix word
    * counts, not a sequential fold — which is what keeps it a pure
    * per-doc array expression any engine replays. Output: (doc id,
    * chunk_id, chunk text, n_sentences, n_words).
    *
    * Scale shape: map-only until the per-(doc, chunk) regroup — and that
    * aggregation keys on (doc, chunk), preserving parallelism however
    * long single documents get. No windows, no state.
    */
  def bySentences(
      docs: DataFrame,
      budget: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val sents = filter(
      transform(split(coalesce(col(textCol), lit("")), "[.!?]+"), s => trim(s)),
      s => s =!= "")
    val withCounts = Dedup.parallelize(docs)
      .select(col(idCol).as("doc_id"), sents.as("__s"))
      .where(size(col("__s")) > 0)
      // per-sentence word counts, then exclusive prefix sums via a
      // closed-form aggregate over the index — array expressions only
      .withColumn("__wc", transform(col("__s"),
        s => size(Dedup.wordTokens(s)).cast("long")))
      .withColumn("__pre", transform(sequence(lit(0), size(col("__s")) - 1),
        i => when(i === 0, lit(0L)).otherwise(
          aggregate(slice(col("__wc"), lit(1), i), lit(0L), (a, x) => a + x))))
    withCounts
      .select(col("doc_id"),
        posexplode(zip_with(col("__s"), col("__pre"),
          // exact: __pre ≤ total words per doc stays far inside double
          (s, p) => struct(s.as("sent"),
            (p / lit(budget.toLong)).cast("long").as("cid")))))
      .select(col("doc_id"), col("pos"), col("col.sent").as("__sent"),
        col("col.cid").as("chunk_id"))
      .groupBy(col("doc_id"), col("chunk_id"))
      // order restored via (pos, sentence) sort — collect_list alone has
      // no order guarantee across shuffles
      .agg(count(lit(1)).as("n_sentences"),
        concat_ws(". ", transform(
          array_sort(collect_list(struct(col("pos"), col("__sent")))),
          s => s.getField("__sent"))).as("chunk"))
      .withColumn("n_words",
        size(Dedup.wordTokens(col("chunk"))).cast("long"))
      .select(col("doc_id"), col("chunk_id"), col("chunk"),
        col("n_sentences"), col("n_words"))
  }

  /** Context-length budgeting: truncate each document to its first
    * `maxTokens` whitespace tokens, reporting the original length and
    * whether anything was cut. Map-only (a projection — the 100 TB cost
    * is the scan), deterministic, and the truncation keeps whole tokens
    * so downstream tokenizers never see a sheared word.
    */
  def truncateTokens(
      docs: DataFrame,
      maxTokens: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    Dedup.parallelize(docs)
      .select(col(idCol), Dedup.wordTokens(col(textCol)).as("__w"))
      .select(
        col(idCol),
        size(col("__w")).as("n_tokens"),
        (size(col("__w")) > maxTokens).as("truncated"),
        concat_ws(" ", slice(col("__w"), 1, maxTokens)).as("out_text"))
  }
}

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

  /** CROSS-document boilerplate detection — the corpus-wide complement of
    * [[signals]]: a k-shingle appearing in at least `minDocs` distinct
    * documents is boilerplate (headers, footers, licence blocks, template
    * spam), and each document reports what fraction of its distinct
    * shingles are boilerplate. The canonical filter drops documents with
    * high `boilerplate_frac` before training.
    *
    * Scale shape: the exploded (doc_id, shingle-hash) frame is the one
    * large intermediate; it is persisted (compact 16-byte rows — document
    * bodies are long gone) because three aggregations consume it. Hot-gram
    * selection and the per-doc counts are plain hash aggregations; no
    * joins ever touch text. The persisted frame stays pinned for the
    * lifetime of the returned (lazy) result — callers scoring many
    * corpora in one session should `spark.catalog.clearCache()` between
    * runs (same contract as [[Dedup.lshVerifiedPairs]]).
    */
  def boilerplate(
      docs: DataFrame,
      minDocs: Int = 3,
      shingleK: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    val exploded = Dedup.shingleSets(docs, idCol, textCol, shingleK)
      .select(col("id"), explode(col("sh")).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // shingle sets are distinct per doc, so count(*) counts distinct docs
    val hot = exploded.groupBy("g").agg(count(lit(1)).as("nd"))
      .where(col("nd") >= minDocs).select("g")
    val totals = exploded.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val boiler = exploded.join(hot, Seq("g"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("__boiler"))
    totals.join(boiler, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("__boiler"), lit(0L)).as("boiler_grams"),
        when(col("n_grams") > 0,
          coalesce(col("__boiler"), lit(0L)).cast("double") / col("n_grams"))
          .otherwise(0.0).as("boilerplate_frac"))
  }

  /** Repeated-span coverage — the C4/RefinedWeb-style span dedup measure:
    * which fraction of each document's WORDS sits inside a `k`-gram
    * window that occurs in at least `minDocs` distinct documents. Where
    * [[boilerplate]] counts a document's distinct shingles, this op
    * resolves hot windows back to word POSITIONS (window at position i
    * covers words i..i+k−1, overlaps unioned), so `kept_ppm` is exactly
    * the share of text a span-removal rewrite would keep — the filter
    * threshold and the rewrite volume estimate in one pass.
    *
    * Scale shape: the positional (id, pos, gram-hash) frame is the one
    * large intermediate — 20-byte rows, bodies long gone — persisted
    * because both the hot-gram tally and the coverage join consume it.
    * Hot grams are found with a distinct-doc count (map-side combined);
    * coverage is a left-semi join on the gram hash followed by a bounded
    * k-way position fan-out and a distinct — every shuffle carries
    * (id, position) or (hash, count) rows only.
    */
  def spanCoverage(
      docs: DataFrame,
      minDocs: Int = 3,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    require(k >= 1, s"k must be >= 1: $k")
    val words = Dedup.parallelize(docs)
      .select(col(idCol).as("id"), Dedup.wordTokens(col(textCol)).as("__w"))
    // Positional gram hashes — one NATIVE pass per document (each word
    // hashes once, windows combine by mix64; empty below k words). The
    // interpreted `transform(sequence…, hash(slice…)))` formulation this
    // replaces re-sliced the token array per window and dominated the
    // whole operator's runtime ~5× over the actual shuffles.
    val withGrams = words.select(
      col("id"), size(col("__w")).as("n_words"),
      graft.functions.VectorFunctions.positionalShingleHashes(col("__w"), k).as("__g"))
    val pos = withGrams
      .select(col("id"), posexplode(col("__g")))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "g")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = pos.groupBy("g").agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") >= minDocs).select("g")
    val covered = pos
      .join(hot, Seq("g"), "left_semi")
      .select(col("id"), explode(sequence(col("i"), col("i") + (k - 1))).as("j"))
      // explicit core-count partitioning (r17): the (id, j) rows are
      // 16 bytes, so AQE coalesced the dedup (and downstream join)
      // exchanges to one partition; the distinct reuses this layout
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("id"), col("j"))
      .distinct()
      .groupBy("id").agg(count(lit(1)).as("covered_words"))
    withGrams.select(col("id"), col("n_words").cast("long").as("n_words"))
      .join(covered, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_words"),
        coalesce(col("covered_words"), lit(0L)).as("covered_words"),
        when(col("n_words") > 0,
          floor(lit(1000000L) * (col("n_words") - coalesce(col("covered_words"), lit(0L))) /
            col("n_words")))
          .otherwise(1000000L).as("kept_ppm"))
  }

  /** The REWRITE [[spanCoverage]] only measures: drop every word inside
    * a hot `k`-gram window (one occurring in ≥ `minDocs` distinct
    * documents) and emit the cleaned text — the span-removal side of
    * C4/RefinedWeb corpus hygiene (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022, §4's ExactSubstr
    * approximated at k-gram granularity). Returns
    * `(idCol, n_words, kept_words, text)` with `text` the surviving
    * words joined by single spaces (whitespace-normalized by
    * construction; empty string when everything was hot). Removal is
    * corpus-global and deterministic, so re-running on the cleaned
    * output is a no-op whenever the surviving text forms no new hot
    * window.
    *
    * Scale shape: [[spanCoverage]]'s positional-hash frame (16-byte
    * rows, bodies long gone; persisted once for the hot tally + the
    * coverage resolve), then ONE (id, position)-keyed anti-join of the
    * positional WORD table against covered positions and a per-doc
    * `sort_array(collect_list(struct(pos, word)))` rebuild — the only
    * text-bearing shuffle carries surviving words keyed by doc id, and
    * the rebuild is per-group (no global sort; the struct sort pins
    * determinism against collect_list's arrival order).
    */
  def spanRemove(
      docs: DataFrame,
      minDocs: Int = 3,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    require(k >= 1, s"k must be >= 1: $k")
    val words = Dedup.parallelize(docs)
      .select(col(idCol).as("id"), Dedup.wordTokens(col(textCol)).as("__w"))
    val withGrams = words.select(
      col("id"), col("__w"), size(col("__w")).as("n_words"),
      graft.functions.VectorFunctions.positionalShingleHashes(col("__w"), k).as("__g"))
    val pos = withGrams
      .select(col("id"), posexplode(col("__g")))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "g")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = pos.groupBy("g").agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") >= minDocs).select("g")
    val covered = pos
      .join(hot, Seq("g"), "left_semi")
      .select(col("id"), explode(sequence(col("i"), col("i") + (k - 1))).as("j"))
      // explicit core-count partitioning (r17): the (id, j) rows are
      // 16 bytes, so AQE coalesced the dedup (and downstream join)
      // exchanges to one partition; the distinct reuses this layout
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("id"), col("j"))
      .distinct()
    val wordPos = withGrams.select(col("id"), posexplode(col("__w")))
      .withColumnRenamed("pos", "j")
      .withColumnRenamed("col", "word")
    val rebuilt = wordPos
      .join(covered, Seq("id", "j"), "left_anti")
      .groupBy("id").agg(
        count(lit(1)).as("kept_words"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("j"), col("word")))),
            s => s.getItem("word")),
          " ").as("__text"))
    withGrams.select(col("id"), col("n_words").cast("long").as("n_words"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_words"),
        coalesce(col("kept_words"), lit(0L)).as("kept_words"),
        coalesce(col("__text"), lit("")).as(textCol))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with a held-out evaluation corpus — the standard pretraining
  * hygiene step (e.g. "drop any train doc containing a 13-gram from the
  * test set").
  *
  * Scale shape: the held-out set is tiny next to a 100 TB corpus, so its
  * distinct gram set is **broadcast** — the training side is scanned once,
  * map-side joined (no corpus shuffle), and only matching (id, gram) pairs
  * reach the final narrow aggregate. [[flagged]] uses exact string grams
  * (oracle-matchable in any SQL engine); [[flaggedHashed]] is the wire-
  * efficient form — 8-byte murmur shingle hashes via the native
  * [[VectorFunctions.shingleHashes]] expression — for when gram strings
  * themselves are too wide to ship.
  */
object Decontaminate {

  /** Space-joined word n-grams of a token array (empty when < n words). */
  def ngrams(words: Column, n: Int): Column = {
    require(n > 0, s"n must be positive: $n")
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)), i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  private def explodedGrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    graft.io.Spread.toDefaultParallelism(df)
      .select(col(idCol).as("id"), Dedup.wordTokens(col(textCol)).as("__w"))
      .select(col("id"), explode(ngrams(col("__w"), n)).as("gram"))

  /** (idCol, n_hits): training docs sharing ≥ 1 word n-gram with `test`,
    * with the count of distinct shared grams. Inner result — clean docs
    * don't appear; anti-join the ids to drop contaminated docs.
    */
  def flagged(
      train: DataFrame,
      test: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val testGrams = explodedGrams(test, idCol, textCol, n).select("gram").distinct()
    explodedGrams(train, idCol, textCol, n)
      .join(broadcast(testGrams), "gram")
      .groupBy(col("id").as(idCol))
      .agg(count_distinct(col("gram")).as("n_hits"))
  }

  /** Per-document contamination DEGREE (where [[flagged]] gives a yes/no):
    * every train doc with its distinct-gram count, the number of those
    * grams shared with `test`, and the share in ppm — the signal for
    * threshold-based (rather than any-hit) decontamination policies.
    * Zero-hit and too-short docs appear with 0s, so the output is a total
    * function of the train corpus.
    *
    * Scale shape: same broadcast-gram-set map-side join as [[flagged]] —
    * the corpus never shuffles bodies; the per-doc agg carries
    * (id, counts) only.
    */
  def overlapStats(
      train: DataFrame,
      test: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val testGrams = explodedGrams(test, idCol, textCol, n).select("gram").distinct()
      .withColumn("__hit", lit(true))
    val perDoc = explodedGrams(train, idCol, textCol, n)
      .dropDuplicates("id", "gram")
      .join(broadcast(testGrams), Seq("gram"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        count(when(col("__hit"), 1)).as("n_hits"))
    train.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          floor(lit(1000000L) * col("n_hits") / col("n_grams")))
          .otherwise(lit(0L)).as("overlap_ppm"))
  }

  /** SEMANTIC decontamination: flag corpus vectors whose embedding has
    * cosine ≥ tauNum/tauDen to ANY held-out vector — the paraphrase-level
    * complement of the exact n-gram screens above (a reworded benchmark
    * item shares no 8-gram but still sits next to the original in
    * embedding space; cf. SemDeDup-style near-duplicate screening,
    * [[Similarity.semanticDedup]]).
    *
    * Exactness: both sides quantize to `scale`-integers and the threshold
    * test is the cross-multiplied square — `dot² · den² ≥ num² · |a|²|b|²`
    * over integer dot products ([[VectorFunctions.intDot]]), no floats
    * anywhere, so the flag is bit-identical across engines and partition
    * counts.
    *
    * Scale shape: the held-out set is tiny next to a 100 TB corpus, so its
    * quantized vectors are **broadcast** and the corpus is scanned once
    * map-side (broadcast nested-loop: each corpus row checks k held-out
    * vectors — linear in the corpus, never a corpus shuffle). Output is a
    * total function of `corpus`: every id appears, with its match count.
    */
  def semanticFlags(
      corpus: DataFrame,
      heldout: DataFrame,
      tauNum: Int = 9,
      tauDen: Int = 10,
      scale: Int = 1024,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(tauDen > 0 && tauNum >= 0 && tauNum <= tauDen, "need 0 <= tauNum/tauDen <= 1")
    val q = transform(col(vecCol), x => round(x.cast("double") * scale).cast("long"))
    def prep(df: DataFrame, qc: String, nc: String) = df
      .select(col(idCol), q.as(qc))
      .withColumn(nc, VectorFunctions.intDot(col(qc), col(qc)))
    // Spread guards the CPU-heavy per-pair dot stage against tiny
    // single-split inputs (no-op on real multi-split corpora).
    val tr = prep(graft.io.Spread.toDefaultParallelism(corpus), "__qa", "__n2a")
      .withColumnRenamed(idCol, "__ida")
    val te = prep(heldout, "__qb", "__n2b").drop(idCol)
    val dot = VectorFunctions.intDot(col("__qa"), col("__qb"))
    // The cross-multiplied test runs in DecimalType(38,0), not Long:
    // dot²·den² exceeds Long for high-dim / non-unit-norm embeddings at
    // scale=1024 (768-dim, norm ≈ 30 ⇒ ~5·10¹⁹ > 2⁶³), and Spark wraps
    // silently where other engines error — a silent wrap could flip
    // flags. Decimal(38,0) keeps the products exact up to 10³⁸, i.e.
    // n2a·n2b·tauDen² < 10³⁸ — quantized squared-norms to ~10¹⁶ a side
    // at tauDen ≤ 10³, far beyond any real embedding. Only the
    // comparison pays decimal cost; the O(dim) dot stays a Long kernel.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val hits = tr.join(broadcast(te),
        dot > 0 && dot.cast(dec) * dot.cast(dec) * lit(tauDen.toLong * tauDen).cast(dec) >=
          lit(tauNum.toLong * tauNum).cast(dec) * col("__n2a").cast(dec) * col("__n2b").cast(dec))
      .groupBy(col("__ida").as(idCol))
      .agg(count(lit(1)).as("n_matches"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("n_matches").isNotNull.as("contaminated"))
  }

  /** [[flagged]] with 64-bit hashed shingles instead of gram strings —
    * same join shape, 8-byte keys. Distinct-per-doc by construction
    * ([[VectorFunctions.shingleHashes]] emits distinct hashes), so the
    * plain count is the distinct-gram count (modulo negligible 64-bit
    * collisions).
    */
  def flaggedHashed(
      train: DataFrame,
      test: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol).as("id"), Dedup.wordTokens(col(textCol)).as("__w"))
      .select(col("id"), explode(VectorFunctions.shingleHashes(col("__w"), n)).as("gram"))
    val testGrams = grams(test).select("gram").distinct()
    grams(train)
      .join(broadcast(testGrams), "gram")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }
}

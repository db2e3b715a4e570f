package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for training-data pipelines, each designed for
  * the shuffle profile it induces at 100 TB (BASELINE.json north star).
  *
  *  - [[exact]]: one hash-shuffle on a 16-byte digest, not the document
  *    bytes — group keys stay small however large the docs are.
  *  - [[minhashLsh]]: shingle → minhash signature → banded LSH buckets →
  *    within-bucket candidate pairs. The only join is the self-join on
  *    (band, bucket), whose groups are tiny by construction; no O(n²).
  *  - [[simhashText]]: 64-bit SimHash per doc; near-dups = identical
  *    simhash (or small Hamming distance within buckets).
  *  - [[ngramJaccard]]: exact Jaccard verification over candidate pairs —
  *    run it on LSH survivors, never all pairs.
  *  - [[embeddingNearDup]]: cosine-over-threshold pairs via LSH buckets on
  *    the embedding column.
  */
object Dedup {

  /** Ensure enough partitions for CPU-heavy per-row work — see
    * [[graft.io.Spread.toDefaultParallelism]] (no-op at real scale).
    */
  private[ops] def parallelize(df: DataFrame): DataFrame =
    graft.io.Spread.toDefaultParallelism(df)

  /** Exact dedup: keep the smallest-id representative per content
    * fingerprint; report group size. The aggregate carries only
    * (digest, id), so the shuffle is O(rows · 24 bytes) regardless of
    * document size.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    parallelize(docs)
      .select(TextFunctions.fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Normalized word tokens (the shared first stage of every sketch). */
  def wordTokens(text: Column): Column =
    filter(split(regexp_replace(trim(lower(text)), "\\s+", " "), " "), w => length(w) > 0)

  /** Distinct hashed word k-shingles — native one-pass expression (each
    * word hashes once; windows combine word hashes, no string
    * re-concatenation per shingle).
    */
  def shinglesFromWords(words: Column, k: Int = 3): Column =
    VectorFunctions.shingleHashes(words, k)

  /** Word k-shingles of the normalized text (single-expression convenience
    * for tests/small inputs; pipelines should stage via [[shingleSets]]).
    */
  def shingles(text: Column, k: Int = 3): Column = shinglesFromWords(wordTokens(text), k)

  /** (id, sh) shingle-set DataFrame, staged so tokenize → shingle → sketch
    * each evaluate once per row, and repartitioned so the CPU-heavy
    * sketching parallelizes even when the source is one small file.
    */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    parallelize(docs)
      .select(col(idCol).as("id"), wordTokens(col(textCol)).as("__words"))
      .select(col("id"), shinglesFromWords(col("__words"), k).as("sh"))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the shingle set. Native codegen'd expression — one pass
    * over the shingle set updates all `numHashes` mins.
    */
  def minhashSignature(shingleSet: Column, numHashes: Int = 64): Column =
    VectorFunctions.minhashSignature(shingleSet, numHashes)

  /** MinHash + banded LSH near-dup candidate pairs with Jaccard estimate.
    *
    * @return (a_id, b_id, est_jaccard) with a_id < b_id, deduped across
    *         bands, filtered to `minJaccard`.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.5,
      shingleK: Int = 3): DataFrame =
    minhashLshFromShingles(shingleSets(docs, idCol, textCol, shingleK), numHashes, bands, minJaccard)

  /** [[minhashLsh]] over a pre-staged (id, sh) shingle-set DataFrame — use
    * this form when the same shingle sets also feed a verification stage
    * (persist the staged frame once instead of re-tokenizing the corpus).
    */
  def minhashLshFromShingles(
      shingled: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = shingled
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    // Explode into (band, bucket=hash(band rows)) — one shuffle on the
    // bucket key; bucket groups are small so the self-join never blows up.
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    // Self-join with IDENTICAL child plans on both sides (rename only
    // after the join): the two shuffles canonicalize equal, so
    // ReuseExchange computes the tokenize→shingle→minhash→band stage ONCE
    // and replays the exchange output for the build side. Renaming before
    // the join (a_id/b_id projections) defeats the reuse and doubles the
    // most expensive stage of the pipeline. The shuffle_hash hint keeps the
    // join shuffled even when the planner would broadcast (a broadcast side
    // is a separate computation — no reuse, sketch stage runs twice); at
    // real scale the join is shuffled regardless, and bucket groups are
    // tiny by construction so hash beats sort-merge.
    banded.alias("l").hint("shuffle_hash")
      .join(banded.alias("r").hint("shuffle_hash"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"),
        (size(filter(zip_with(col("l.sig"), col("r.sig"), (x, y) => x === y), m => m))
          .cast("double") / numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= minJaccard)
      .dropDuplicates("a_id", "b_id")
  }

  /** 64-bit SimHash over word features: sign-sum of per-feature hash bits.
    * Docs with identical simhash are near-identical; bucketing by simhash
    * prefix gives a banded Hamming search at scale. Native expression:
    * each word hashes to 64 bits once (the HOF form re-hashed every word
    * per bit).
    */
  def simhashText(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    parallelize(docs)
      .select(col(idCol).as("id"), wordTokens(col(textCol)).as("__words"))
      .select(col("id"), VectorFunctions.simhash64(col("__words")).as("simhash"))

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (columns a_id, b_id) — the verification stage after LSH.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id", textCol: String = "text", k: Int = 3): DataFrame =
    ngramJaccardFromShingles(shingleSets(docs, idCol, textCol, k), pairs)

  /** [[ngramJaccard]] over a pre-staged (id, sh) shingle-set DataFrame.
    * Extra columns on `pairs` (e.g. an LSH estimate) pass through, between
    * the ids and the computed `jaccard`.
    */
  def ngramJaccardFromShingles(shingled: DataFrame, pairs: DataFrame): DataFrame = {
    val joined = pairs
      .join(shingled.select(col("id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(shingled.select(col("id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("jaccard",
        // two empty shingle sets (both docs under k words) define 0.0,
        // guarding the 0/0 division
        when(size(array_union(col("a_sh"), col("b_sh"))) > 0,
          size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
            size(array_union(col("a_sh"), col("b_sh"))))
          .otherwise(0.0))
    val extras = pairs.columns.filterNot(Set("a_id", "b_id"))
    joined.select(("a_id" +: "b_id" +: extras :+ "jaccard").map(col): _*)
  }

  /** The full near-dup composite: LSH candidate generation + exact Jaccard
    * verification, with the tokenize→shingle stage computed ONCE and
    * persisted across both uses (unstaged, each side would re-shingle the
    * whole corpus — the most expensive part of the pipeline). The staged
    * frame stays persisted for the lifetime of the returned (lazy) result;
    * callers looping over many corpora should `spark.catalog.clearCache()`
    * or persist/unpersist around materialization.
    *
    * @return (a_id, b_id, est_jaccard, jaccard) — LSH estimate next to the
    *         exact verified value for every surviving candidate pair.
    */
  def lshVerifiedPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.5,
      shingleK: Int = 3): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ngramJaccardFromShingles(sh, minhashLshFromShingles(sh, numHashes, bands, minJaccard))
  }

  /** Keep/drop resolution over near-dup candidate pairs: connected
    * components of the pair graph ([[Components.connectedComponents]],
    * O(log n) contraction rounds), minimum-id representative survives,
    * every other member is dropped. The anti-join build side carries only
    * (id) — document bodies never shuffle.
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.join(
      Components.connectedComponents(pairs)
        .where(col("id") =!= col("component"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Embedding near-dup: cosine ≥ threshold pairs found via banded
    * random-hyperplane LSH buckets (OR-amplification: a pair is a candidate
    * if it collides in ANY band), so no all-pairs join ever happens. Raise
    * `nBits` / lower `bands` as the corpus grows to keep buckets small.
    */
  def embeddingNearDup(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.95,
      nBits: Int = 8,
      bands: Int = 4): DataFrame = {
    // Unit-normalize once per row (bucket signs are scale-invariant), so
    // each within-bucket pair costs one dot instead of dot + two norms.
    val bucketed = emb
      .select(col(idCol).as("id"), col(vecCol).as("__v"), VectorFunctions.norm(col(vecCol)).as("__n"))
      .select(col("id"), VectorFunctions.unitizeWith(col("__v"), col("__n")).as("vec"))
      .select(
        col("id"), col("vec"),
        posexplode(array((0 until bands).map(bd =>
          VectorFunctions.simhashBucket(col("vec"), nBits, seed = bd)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    // Identical-child self-join (rename after the join) + shuffle_hash →
    // ReuseExchange computes the normalize+bucket stage once; see
    // minhashLshFromShingles for the full rationale.
    bucketed.alias("l").hint("shuffle_hash")
      .join(bucketed.alias("r").hint("shuffle_hash"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"),
        VectorFunctions.dot(col("l.vec"), col("r.vec")).as("cosine"))
      .where(col("cosine") >= threshold)
      .dropDuplicates("a_id", "b_id")
  }

  /** Edit-distance-verified near-duplicate pairs under blocking: candidate
    * pairs form only within a block (same `blockCols` values), then a
    * cheap length-band test, then the O(len²) Levenshtein on a bounded
    * prefix decides.
    *
    * This is the third verification family beside n-gram Jaccard
    * ([[ngramJaccard]]) and embedding cosine — the one that catches
    * small-edit duplicates (typo fixes, template fills) that shingle sets
    * blur. Scale shape: the quadratic term is bounded per block (pick
    * blocking keys so blocks stay ~10²–10³ docs), the self-join shuffles
    * only (block key, id, prefix, length) — never full documents — and
    * the length-band filter prunes pairs BEFORE the DP runs: two strings
    * whose lengths differ by more than `maxDist` cannot be within
    * `maxDist` edits, and the band test is free.
    *
    * @param prefixLen chars of normalized text the DP runs on — caps the
    *                  per-pair cost at prefixLen²; distances are over
    *                  prefixes, exact for texts shorter than the cap
    * @param maxDist   inclusive edit-distance threshold for a pair to
    *                  count as a near-duplicate
    */
  def editDistancePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      prefixLen: Int = 80,
      maxDist: Int = 30): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — unblocked edit distance is all-pairs")
    // Explicit REPARTITION_BY_NUM on the block key: the pair stream is
    // tiny in BYTES but quadratic in CPU (a ~30 µs DP per pair), so AQE's
    // byte-based coalescing would fold the join's post-shuffle partitions
    // onto one core and serialize the whole DP stage. A user repartition
    // is exempt from coalescing, the self-join reuses the one exchange
    // for both sides, and the DP then runs at full width inside the join
    // stage. (A post-join repartition would NOT work: the distance filter
    // is deterministic, so Catalyst pushes it straight back through the
    // exchange onto the coalesced side.)
    val keyed = docs.select(
      blockCols.map(col) :+ col(idCol).as("id") :+
        substring(regexp_replace(trim(lower(col(textCol))), "\\s+", " "), 1, prefixLen).as("p"): _*)
      .withColumn("len", length(col("p")))
    val spread = keyed.repartition(
      keyed.sparkSession.sparkContext.defaultParallelism, blockCols.map(col): _*)
    val blockKey = blockCols.map(c => col("l." + c) === col("r." + c)).reduce(_ && _)
    // The threshold'd levenshtein fills at most a maxDist-wide DP band
    // and bails early for far-apart pairs (the overwhelming majority),
    // returning the exact distance for everything within the threshold.
    spread.alias("l").hint("shuffle_hash")
      .join(spread.alias("r").hint("shuffle_hash"),
        blockKey && col("l.id") < col("r.id") &&
          abs(col("l.len") - col("r.len")) <= maxDist)
      .withColumn("dist", levenshtein(col("l.p"), col("r.p"), maxDist))
      .where(col("dist") >= 0)
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"), col("dist"))
  }
}

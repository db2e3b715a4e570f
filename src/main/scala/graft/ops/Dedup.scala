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
    // array_remove(split, "") ≡ filter(length > 0) here (split("\\s+") can
    // only emit "" for an empty input), but it stays inside whole-stage
    // codegen where the lambda form falls back to interpreted eval — this
    // tokenizer sits in the hot path of every text query (q13-q15, q47,
    // q64, BM25, KN, …).
    array_remove(split(trim(lower(text)), "\\s+"), "")

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

  /** Banded Hamming near-duplicate pairs over ANY 64-bit fingerprint
    * column (SimHash, image dHash): split the hash into `bands` equal
    * bit slices — by pigeonhole, two hashes at Hamming distance
    * ≤ bands − 1 agree on at least one complete band, so the equi-join
    * on (band index, band bits) finds EVERY qualifying pair (the
    * completeness condition `maxHamming ≤ bands − 1` is enforced) —
    * then verify exactly with `bit_count(xor)`. Returns
    * `(a_id, b_id, hamming)`, a_id < b_id.
    *
    * Scale shape: fingerprints fan out ×bands (tiny rows), candidates =
    * Σ_bucket |bucket|² — the banded-LSH shape of [[lshVerifiedPairs]],
    * never all-pairs; the popcount verify is a codegen'd scalar on the
    * candidate stream.
    */
  def hammingPairs(
      hashes: DataFrame,
      idCol: String = "id",
      hashCol: String = "hash",
      maxHamming: Int = 7,
      bands: Int = 8): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64: $bands")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"completeness needs maxHamming <= bands - 1: $maxHamming vs ${bands - 1}")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val banded = hashes
      .select(col(idCol).cast("long").as("id"), col(hashCol).cast("long").as("hash"))
      .select(col("id"), col("hash"),
        explode(sequence(lit(0), lit(bands - 1))).as("b"))
      // arithmetic shift + mask == unsigned shift + mask for every band
      .withColumn("bits", expr(s"shiftright(hash, b * $width) & ${mask}L"))
    banded.alias("x").join(banded.alias("y"),
        col("x.b") === col("y.b") && col("x.bits") === col("y.bits") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.hash").as("a_hash"), col("y.hash").as("b_hash"))
      .distinct() // a pair may collide in several bands
      .select(col("a_id"), col("b_id"),
        expr("cast(bit_count(a_hash ^ b_hash) as bigint)").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Banded-Hamming RETRIEVAL over 64-bit fingerprints — [[hammingPairs]]
    * turned into a top-k index: per query fingerprint, rank the
    * candidates that share at least one band by exact Hamming distance
    * (ties to the smaller neighbor id) and keep the first `k`. The band
    * structure IS the approximation: a true neighbor sharing no band is
    * unreachable (guaranteed reachable only at hamming ≤ bands−1, the
    * pigeonhole bound) — [[graft.ops.Similarity.recallAt]] against
    * [[hammingBruteTopK]] measures exactly what that costs, the number a
    * user tuning `bands` needs.
    *
    * Scale shape: the corpus fans out ×bands (tiny rows); the banded
    * QUERY side is broadcast (query sets are small by definition), so
    * candidate generation is a map-side hash join over the corpus scan —
    * no corpus shuffle; the only shuffle is the per-query top-k window
    * over candidates.
    */
  def hammingTopK(
      hashes: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      bands: Int = 4,
      idCol: String = "id",
      hashCol: String = "hash",
      queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64: $bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    def banded(df: DataFrame, id: String, outId: String, outHash: String) = df
      .select(col(id).cast("long").as(outId), col(hashCol).cast("long").as(outHash))
      .select(col(outId), col(outHash),
        explode(sequence(lit(0), lit(bands - 1))).as("b"))
      .withColumn("bits", expr(s"shiftright($outHash, b * $width) & ${mask}L"))
    val c = banded(hashes, idCol, "neighbor_id", "__h")
    val q = banded(queries, queryIdCol, "query_id", "__qh")
    val w = Window.partitionBy("query_id").orderBy(col("hamming"), col("neighbor_id"))
    c.join(broadcast(q),
        c("b") === q("b") && c("bits") === q("bits") &&
          col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("__h"), col("__qh"))
      .distinct() // a candidate may collide in several bands
      .select(col("query_id"), col("neighbor_id"),
        expr("cast(bit_count(__h ^ __qh) as bigint)").as("hamming"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** EXACT Hamming top-k — the brute-force baseline [[hammingTopK]]'s
    * recall is measured against: every (query, corpus) distance, ranked
    * the same way. The scan is queries × corpus by construction (that is
    * what makes it exact); the query set is broadcast and small, so the
    * corpus is touched once, map-side, and only the per-query top-k
    * window shuffles.
    */
  def hammingBruteTopK(
      hashes: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      idCol: String = "id",
      hashCol: String = "hash",
      queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val c = hashes.select(
      col(idCol).cast("long").as("neighbor_id"), col(hashCol).cast("long").as("__h"))
    val q = queries.select(
      col(queryIdCol).cast("long").as("query_id"), col(hashCol).cast("long").as("__qh"))
    val w = Window.partitionBy("query_id").orderBy(col("hamming"), col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("cast(bit_count(__h ^ __qh) as bigint)").as("hamming"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

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
    // [[graft.functions.expressions.ShingleHashes]] emits sorted distinct
    // arrays, so |A∩B| is one native merge pass per pair and |A∪B| is
    // arithmetic — same values as the array_intersect/array_union
    // formulation, without two hash-set builds per candidate pair.
    val inter = VectorFunctions.sortedIntersectCount(col("a_sh"), col("b_sh"))
    val joined = pairs
      .join(shingled.select(col("id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(shingled.select(col("id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("__i", inter)
      .withColumn("jaccard",
        // two empty shingle sets (both docs under k words) define 0.0,
        // guarding the 0/0 division
        when(size(col("a_sh")) + size(col("b_sh")) - col("__i") > 0,
          col("__i").cast("double") /
            (size(col("a_sh")) + size(col("b_sh")) - col("__i")))
          .otherwise(0.0))
      .drop("__i")
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

  /** EXACT set-similarity self-join via prefix filtering (the AllPairs /
    * PPJoin candidate scheme): every document pair whose word-SET Jaccard
    * is ≥ `thresholdPpm/1e6`, with no false negatives — the deterministic
    * complement to [[minhashLsh]] (probabilistic recall) when the dedup
    * policy must be auditable ("ALL pairs above t were merged").
    *
    * Candidate generation: tokens are globally ordered rarest-first
    * (document frequency asc, word asc — a total order, so results are
    * partitioning-independent); each document exposes only its first
    * `|s| − ⌈t·|s|⌉ + 1` tokens under that order. Any pair with
    * J ≥ t shares ≥ ⌈t·|s|⌉ tokens, hence at least one EXPOSED token
    * (pigeonhole) — so joining on exposed tokens alone loses nothing,
    * while the rarest-first order makes the join key selective exactly
    * where it matters (frequent tokens almost never land in a prefix).
    * A size filter (`t·|a| ≤ |b| ∧ t·|b| ≤ |a|`, necessary for J ≥ t)
    * prunes candidates before any verification.
    *
    * Scale shape: one vocabulary-sized frequency aggregation, one
    * rank window per document (narrow (id, word, df) rows), an equi-join
    * on the exposed-token key, then exact verification that touches ONLY
    * surviving candidate pairs (token arrays join in by id — two hash
    * joins). The quadratic blow-up of a naive similarity join is confined
    * to documents sharing a rare prefix token; corpus bodies never
    * shuffle. Verification is `|A∩B|` on distinct-token arrays with
    * `|A∪B| = |A|+|B|−|A∩B|`, all integer.
    *
    * @param thresholdPpm inclusive Jaccard threshold in parts-per-million
    *                     (e.g. 300000 ⇒ J ≥ 0.3)
    */
  def prefixFilterPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdPpm: Long = 500000L): DataFrame = {
    require(thresholdPpm >= 1 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be in [1, 1000000]: $thresholdPpm")
    // Sorted (binary order) distinct-token arrays: sortedness is what the
    // O(|A|+|B|) native merge-intersection verification kernel needs.
    // Persisted: the tokenized sets feed FOUR plan branches (two prefix
    // sides of the candidate self-join, two verification attach sides) —
    // unstaged, the corpus would re-tokenize once per branch. Lazy,
    // fault-tolerant; blocks release via LRU/context GC with the plan.
    // MEMORY_AND_DISK means at corpus scale this stages distinct-token
    // arrays (≈ the deduped token footprint) to local disk rather than
    // caching nothing — the 4× re-tokenization it avoids costs more than
    // the spill; callers that prefer recompute can pre-stage `docs`.
    val sets = parallelize(docs)
      .select(col(idCol).cast("long").as("id"),
        array_sort(array_distinct(wordTokens(col(textCol)))).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("n", size(col("toks")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tokens = sets.select(col("id"), col("n"), explode(col("toks")).as("word"))
    // Global document frequency — the prefix order key. Vocabulary-sized,
    // map-side combined, broadcast back onto the token stream.
    val df = tokens.groupBy("word").agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col("id")).orderBy(col("__df"), col("word"))
    // prefix length = n − ⌈t·n⌉ + 1, with ⌈t·n⌉ = (t_ppm·n + 999999) div 1e6
    // (the `div` is exact: the numerator is ≤ 1e12, well inside double)
    val needed = (col("n") * thresholdPpm + lit(999999L)) / lit(1000000L)
    // Persisted for the same reason: both sides of the candidate
    // self-join read the prefix stream — one df-join + rank window
    // instead of two. Measured (r8): dropping this persist and leaning
    // on exchange reuse costs ~20% at sf0.1 isolated and 2.0× at the
    // sf1 smoke (36.6 s → 71.6 s) — the reused exchange sits below the
    // rank window, so the window re-evaluates per side. The persist
    // stays.
    val prefixes = tokens
      .join(broadcast(df), Seq("word"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .where(col("__rk") <= col("n") - floor(needed).cast("long") + lit(1L))
      .select(col("id"), col("n"), col("word"), col("__rk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Positional filter (PPJoin): a shared token at prefix positions
    // (rkₐ, rk_b) caps the overlap at 1 + min(n_a−rkₐ, n_b−rk_b); J ≥ t
    // forces overlap ≥ ⌈t·(n_a+n_b)/(1+t)⌉. The TRUE first shared token
    // of a qualifying pair always passes, so per-row pruning before the
    // pair-distinct drops only rows, never pairs — exactness holds.
    val alphaNum = lit(thresholdPpm) * (col("a.n") + col("b.n"))
    val alphaDen = lit(1000000L + thresholdPpm)
    val overlapUb = lit(1L) + least(col("a.n") - col("a.__rk"), col("b.n") - col("b.__rk"))
    val candidates = prefixes.alias("a")
      .join(prefixes.alias("b"),
        col("a.word") === col("b.word") && col("a.id") < col("b.id") &&
          col("a.n") * thresholdPpm <= col("b.n") * 1000000L &&
          col("b.n") * thresholdPpm <= col("a.n") * 1000000L &&
          overlapUb * alphaDen >= alphaNum)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    val nCommon = VectorFunctions.sortedIntersectCount(col("a_toks"), col("b_toks"))
    candidates
      .join(sets.select(col("id").as("a_id"), col("toks").as("a_toks"), col("n").as("n_a")), Seq("a_id"))
      .join(sets.select(col("id").as("b_id"), col("toks").as("b_toks"), col("n").as("n_b")), Seq("b_id"))
      .withColumn("n_common", nCommon)
      .where(col("n_common") * 1000000L >= lit(thresholdPpm) * (col("n_a") + col("n_b") - col("n_common")))
      .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"), col("n_common"),
        floor(lit(1000000L) * col("n_common") / (col("n_a") + col("n_b") - col("n_common"))).as("jaccard_ppm"))
  }

  /** Asymmetric CONTAINMENT pairs — `|A∩B| / |A| ≥ t` over distinct-token
    * sets: the quote/subset detector [[prefixFilterPairs]]' symmetric
    * Jaccard cannot see (a short doc fully quoted inside a long one has
    * containment ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0). Emits ORDERED pairs
    * (a contained-in b, a ≠ b) with the exact integer evidence:
    * (a_id, b_id, n_a, n_b, n_common, containment_ppm).
    *
    * Exactness: the prefix-filter theorem in its directional form — if
    * |A∩B| ≥ ⌈t·|A|⌉, then A's first `|A| − ⌈t·|A|⌉ + 1` tokens in the
    * global rare-first (df, word) order must intersect B somewhere. So
    * candidates come from joining A-PREFIX tokens against B's FULL token
    * stream; no qualifying pair can escape. Verification is the native
    * O(|A|+|B|) sorted-merge intersection.
    *
    * Scale shape: [[prefixFilterPairs]]' cost model, asymmetric: the
    * join is prefix-stream × full-stream on rare-first tokens (the rare
    * end of the vocabulary carries few rows per word — the same df-skew
    * argument), candidates dedup to ordered pairs before verification,
    * and bodies never shuffle (token arrays only, persisted once into
    * the shared stage feeding candidate and verify branches).
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdPpm: Long = 800000L): DataFrame = {
    require(thresholdPpm >= 1 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be in [1, 1000000]: $thresholdPpm")
    val sets = parallelize(docs)
      .select(col(idCol).cast("long").as("id"),
        array_sort(array_distinct(wordTokens(col(textCol)))).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("n", size(col("toks")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tokens = sets.select(col("id"), col("n"), explode(col("toks")).as("word"))
    val df = tokens.groupBy("word").agg(count(lit(1)).as("__df"))
    val ranked = tokens
      .join(broadcast(df), Seq("word"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("id")).orderBy(col("__df"), col("word"))
    // ⌈t·n⌉ = (t_ppm·n + 999999) div 1e6, exact in Long
    val needed = expr(s"($thresholdPpm * n + 999999) div 1000000")
    // explicit core-count partitioning for the prefix window (r17): the
    // (id, word, df) rows are skinny, so AQE coalesced the window's
    // exchange to ONE partition and the per-doc sort ran single-threaded
    // (profiled 2.1 s/1 task at sf0.1). Same layout the window requires.
    val prefixes = ranked
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("id"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .where(col("__rk") <= col("n") - needed + lit(1L))
      .select(col("id"), col("word"))
    val candidates = prefixes.alias("a")
      .join(ranked.select(col("id"), col("word")).alias("b"),
        col("a.word") === col("b.word") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
      // explicit core-count partitioning (r17 optimization): the candidate
      // pair frame is tiny in BYTES, so AQE coalesced the verify join to
      // ONE partition — and sortedIntersectCount over full token arrays
      // then ran single-threaded (profiled: a 3.6 s 1-task stage at
      // sf0.1/local[32]). An explicit count is exempt from coalescing and
      // the a_id verify join reuses the layout. No-op semantically.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("a_id"))
    candidates
      .join(sets.select(col("id").as("a_id"), col("toks").as("a_toks"), col("n").as("n_a")), Seq("a_id"))
      .join(sets.select(col("id").as("b_id"), col("toks").as("b_toks"), col("n").as("n_b")), Seq("b_id"))
      .withColumn("n_common",
        VectorFunctions.sortedIntersectCount(col("a_toks"), col("b_toks")))
      .where(col("n_common") * 1000000L >= lit(thresholdPpm) * col("n_a"))
      .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"), col("n_common"),
        floor(lit(1000000L) * col("n_common") / col("n_a")).as("containment_ppm"))
  }

  /** Corpus-wide segment-level dedup — the C4/RefinedWeb "line dedup"
    * adapted to unstructured text: deterministically segment every
    * document into consecutive `segWords`-word blocks, fingerprint each
    * block, keep only its corpus-wide FIRST occurrence (smallest
    * (doc id, segment index)), and reassemble the survivors in order.
    * Docs whose every segment was seen earlier survive as empty strings
    * (auditable, not silently dropped).
    *
    * Scale shape: the first-occurrence election shuffles only
    * (fingerprint, id, idx) — segment STRINGS never cross that exchange
    * (fingerprints are computed in the same projection that builds the
    * segments, map-side). Reassembly joins the narrow per-doc keep-index
    * arrays back to the source docs and re-slices the token array, so
    * document bodies move through exactly ONE exchange (the reassembly
    * join) regardless of duplication rate.
    */
  def segmentDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      segWords: Int = 16): DataFrame = {
    require(segWords > 0, "segWords must be positive")
    val sw = lit(segWords)
    val base = parallelize(docs)
      .select(col(idCol), wordTokens(col(textCol)).as("__w"))
    val segs = segmentFingerprints(base, idCol, segWords)
    val elected = segs
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__fp")).orderBy(col(idCol), col("__idx"))))
    val perDoc = elected.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_segments"),
      count(when(col("__rn") > 1, 1)).as("n_dropped"),
      sort_array(collect_list(when(col("__rn") === 1, col("__idx")))).as("__keep"))
    base.join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(
          concat_ws(" ",
            flatten(transform(col("__keep"),
              i => slice(col("__w"), i * sw + 1, lit(segWords))))),
          lit("")).as("clean_text"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** (id, __idx, __fp) segment fingerprints of a (id, __w token array)
    * frame: fingerprints only — segment text dies map-side. The size>0
    * guard matters: sequence(0, -1) counts DOWN (step is inferred), so an
    * unguarded empty doc would fabricate segments; posexplode drops the
    * guarded empty arrays.
    */
  private def segmentFingerprints(
      base: DataFrame,
      idCol: String,
      segWords: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val sw = lit(segWords)
    base.select(
      (col(idCol) +: carry.map(col)) :+
        posexplode(
          when(size(col("__w")) > 0,
            transform(
              sequence(lit(0), (ceil(size(col("__w")) / sw.cast("double")) - 1).cast("int")),
              i => md5(concat_ws(" ", slice(col("__w"), i * sw + 1, lit(segWords))))))
            .otherwise(array())): _*)
      .toDF((idCol +: carry) ++ Seq("__idx", "__fp"): _*)
  }

  /** Corpus duplication profile at SEGMENT granularity: for each
    * segment-cluster size (number of places an identical `segWords`-word
    * block occurs), how many distinct blocks and how many total
    * occurrences — the "how much of my corpus is boilerplate" report that
    * motivates running [[segmentDedup]] at all (doc-level exact dup rates
    * understate template reuse by orders of magnitude).
    *
    * Scale shape: two stacked narrow aggs over (fingerprint) then
    * (cluster size) — the first benefits from partial map-side combine,
    * the second is tiny.
    */
  def segmentDupProfile(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      segWords: Int = 16): DataFrame = {
    require(segWords > 0, "segWords must be positive")
    val base = parallelize(docs)
      .select(col(idCol), wordTokens(col(textCol)).as("__w"))
    segmentFingerprints(base, idCol, segWords)
      .groupBy(col("__fp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_segments"))
  }

  /** Cross-group content overlap at segment granularity: for each pair of
    * groups (sources, crawls, snapshots), the number of distinct
    * `segWords`-word blocks present in BOTH — the corpus Venn diagram
    * that decides which sources are worth cross-deduping.
    *
    * Scale shape: distinct (group, fingerprint) pairs, then a fingerprint
    * self-join with identical child plans (ReuseExchange computes the
    * distinct stage once); group count bounds the output at |G|²/2 rows.
    */
  def crossGroupOverlap(
      docs: DataFrame,
      groupCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      segWords: Int = 16): DataFrame = {
    require(segWords > 0, "segWords must be positive")
    val base = parallelize(docs)
      .select(col(idCol), col(groupCol), wordTokens(col(textCol)).as("__w"))
    val gfp = segmentFingerprints(base, idCol, segWords, carry = Seq(groupCol))
      .select(col(groupCol), col("__fp")).distinct()
    gfp.alias("a").hint("shuffle_hash")
      .join(gfp.alias("b").hint("shuffle_hash"),
        col("a.__fp") === col("b.__fp") &&
          col(s"a.$groupCol") < col(s"b.$groupCol"))
      .groupBy(col(s"a.$groupCol").as(s"${groupCol}_a"), col(s"b.$groupCol").as(s"${groupCol}_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Cross-corpus exact dedup: the `target` docs whose content fingerprint
    * does NOT appear anywhere in `reference` — the "what's new in this
    * crawl" primitive (dedup against last month's corpus, against an
    * already-trained-on corpus, …).
    *
    * Scale shape: a bloom sketch of the reference fingerprints (one
    * narrow distributive agg, bounded driver bytes) splits the target
    * map-side — rows the bloom rejects are DEFINITELY novel and bypass
    * the join entirely (no false negatives), so the exact anti-join
    * shuffles only the ~dup-rate fraction the bloom couldn't clear.
    * For a mostly-novel crawl that is a >90% shuffle-volume cut.
    */
  def crossCorpusNovel(
      target: DataFrame,
      reference: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      expectedItems: Long = 1 << 20): DataFrame = {
    val refFps = reference
      .select(TextFunctions.fingerprint(col(textCol)).as("__fp"))
    val bf = RuntimeFilter.bloomBytes(refFps, "__fp", expectedItems)
    val t = parallelize(target)
      .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
    val probe = RuntimeFilter.mightContain(bf, col("__fp"))
    val definitelyNovel = t.where(!probe)
    val maybeDup = t.where(probe)
      .join(refFps.distinct(), Seq("__fp"), "left_anti")
    definitelyNovel.unionByName(maybeDup).drop("__fp")
  }

  /** Novel-vs-duplicate accounting per period: for each period, how many
    * rows carried content FIRST seen in that period (`novel_rows`,
    * including every repeat within the first period itself), how many
    * repeated earlier periods' content (`dup_rows`), and how many
    * distinct new contents arrived (`new_contents`). The crawl-snapshot
    * dedup report — "is this feed still delivering new material, or
    * re-sending last week's" — and the numerator of an incremental-
    * ingest skip rate.
    *
    * Scale shape: content collapses to a 16-byte digest at the map side,
    * so the (period, digest) pre-aggregation — map-side combined — and
    * the per-digest min-period reduction shuffle digests and counts,
    * never bodies ([[exact]]'s contract). The digest→first-period table
    * joins back on digest (hash join, key-sized), and the final
    * period-level rollup is period-cardinality-sized.
    */
  def noveltyByPeriod(
      df: DataFrame,
      periodCol: String,
      contentCol: String): DataFrame = {
    val perPeriod = parallelize(df)
      .select(col(periodCol).as("period"), md5(col(contentCol).cast("string")).as("__d"))
      .groupBy(col("period"), col("__d")).agg(count(lit(1)).as("__n"))
    val firstSeen = perPeriod.groupBy(col("__d")).agg(min(col("period")).as("__first"))
    perPeriod.join(firstSeen, Seq("__d"))
      .groupBy(col("period"))
      .agg(
        sum(col("__n")).as("n_rows"),
        sum(when(col("period") === col("__first"), col("__n")).otherwise(0L)).as("novel_rows"),
        sum(when(col("period") =!= col("__first"), col("__n")).otherwise(0L)).as("dup_rows"),
        count_if(col("period") === col("__first")).as("new_contents"))
  }

  /** Bottom-k sketch Jaccard between every pair of corpora — the
    * fixed-memory estimate of the exact vocabulary overlap: per group,
    * keep the `k` lexicographically smallest md5 prefixes of its distinct
    * elements ("k minimum values"); for a pair (A, B) the estimator is
    * `|B_k(A ∪ B) ∩ A ∩ B| / |B_k(A ∪ B)|` — how many of the union's k
    * smallest hashes both sides saw. Deterministic given md5 (no seeded
    * permutations), so the whole pipeline — sketch, union rank, count —
    * is exact-integer reproducible cross-engine; the ESTIMATE vs the
    * exact Jaccard is the only approximation, with standard error
    * ~1/√k.
    *
    * Scale shape: the full-data pass is one distinct (group, element)
    * agg that collapses each element to a 16-hex-char digest; everything
    * after runs on G·k sketch rows (G = group count). The per-pair union
    * rank is a window PARTITIONED BY pair over ≤ 2k rows. Quadratic in
    * G only — built for corpus/source-level comparison (G to ~10³),
    * where the exact [[graft.ops.Lexical]] vocabulary join would
    * re-shuffle the full token table per pair.
    */
  def bottomKJaccard(
      df: DataFrame,
      groupCol: String,
      elemCol: Column,
      k: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val sk = df
      .select(col(groupCol).as("__g"), substring(md5(elemCol.cast("string")), 1, 16).as("__h"))
      .distinct()
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__g")).orderBy(col("__h"))))
      .where(col("__rn") <= k)
      .select(col("__g"), col("__h"))
    val groups = sk.select(col("__g")).distinct()
    val pairs = groups.select(col("__g").as("g_a"))
      .join(broadcast(groups.select(col("__g").as("g_b"))), col("g_a") < col("g_b"))
    // Fan each pair's two sketches into one rail: (pair, hash, side flags),
    // collapse same-hash rows, rank the union, keep its k smallest.
    val membership = pairs
      .select(col("g_a"), col("g_b"), explode(array(col("g_a"), col("g_b"))).as("__g"))
    val unioned = membership.join(sk, Seq("__g"))
      .groupBy(col("g_a"), col("g_b"), col("__h"))
      .agg(max(when(col("__g") === col("g_a"), 1L).otherwise(0L)).as("__ina"),
        max(when(col("__g") === col("g_b"), 1L).otherwise(0L)).as("__inb"))
    unioned
      .withColumn("__rn", row_number()
        .over(Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("__h"))))
      .where(col("__rn") <= k)
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("k_used"),
        sum(col("__ina") * col("__inb")).as("n_common"))
      .withColumn("jaccard_ppm", expr("(1000000L * n_common) div k_used"))
  }
}

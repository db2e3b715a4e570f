package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution primitive: find
  * record pairs whose names are within an edit-distance budget WITHOUT
  * the all-pairs comparison that is quadratic in the table size.
  *
  * Standard blocking architecture: a cheap deterministic key (here: any
  * caller-supplied expression — a prefix, a phonetic code, a token)
  * partitions records into candidate blocks; the expensive verifier
  * (Levenshtein) runs only WITHIN blocks. Cost falls from O(n²) to
  * Σ_b |b|² — the same candidate-pruning shape as [[Dedup]]'s LSH bands
  * and [[IntervalJoin]]'s buckets, applied to string identity. Recall is
  * bounded by the blocking key (pairs split across blocks are never
  * compared) — the classic precision/recall lever; run multiple blocking
  * passes and union for higher recall.
  */
object FuzzyJoin {

  /** Within-block near-match pairs of one table against itself:
    * (a_id, b_id, a_name, b_name, dist) with a_id < b_id and
    * `dist = metric(a_name, b_name) ≤ maxDist` — `metric` defaults to
    * `levenshtein`; pass [[graft.functions.TextFunctions.damerau]] for
    * true transposition-cost-1 linkage (the length guard below is a
    * valid lower bound for any unit-cost edit metric with
    * transpositions, since no operation changes length by more than 1).
    *
    * Scale shape: an equi-join on the block key (shuffle carries only
    * id + name + block), verification is codegen'd `levenshtein` inside
    * the join — no UDF, no cross join; a length guard in the join
    * condition skips pairs whose distance provably exceeds the budget
    * (|len(a)−len(b)| > k ⇒ dist > k) before any DP runs.
    *
    * Hot blocks — the known failure mode of key blocking — are handled
    * by GRID SALTING (`saltBuckets` = g > 1): each row joins under a
    * (block, roleᵢ, roleⱼ) key built from its id-hash bucket, so a block
    * with m members becomes g² balanced sub-joins of (m/g)² pairs on
    * DISTINCT reducer keys instead of one reducer computing m²/2. Each
    * unordered pair is produced under exactly one (bucketₐ, bucket_b)
    * key, so results are IDENTICAL for any g — replication factor g per
    * side buys g² more parallelism. Size g so a hot block's m/g fits a
    * task comfortably; g=1 is the plain join for well-spread keys.
    */
  def selfPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      maxDist: Int,
      saltBuckets: Int = 1,
      metric: (Column, Column) => Column = levenshtein(_, _)): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1: $saltBuckets")
    val g = saltBuckets
    val side = df.select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("block"))
    val guard = abs(length(col("a.name")) - length(col("b.name"))) <= maxDist
    // Explicit core-count partitioning on the join key (r17 optimization):
    // the block-keyed sides are skinny (id + name + block), so AQE
    // coalesced the self-join's exchanges to ONE partition — and the DP
    // verifier (levenshtein/damerau, the expensive part) then ran
    // single-threaded over every candidate pair (profiled: 3.2 s/1 task
    // at sf0.1/local[32]). An explicit count is exempt from coalescing and
    // the join reuses the layout, so no exchange is added. Parallelism is
    // min(#blocks, cores) — at real scale blocks are plentiful.
    val p = df.sparkSession.sparkContext.defaultParallelism
    val joined =
      if (g == 1) {
        val keyed = side.repartition(p, col("block"))
        keyed.alias("a").join(keyed.alias("b"),
          col("a.block") === col("b.block") && col("a.id") < col("b.id") && guard)
      } else {
        val withB = side.withColumn("__b", pmod(xxhash64(col("id")), lit(g)).cast("int"))
        val roles = array((0 until g).map(lit): _*)
        val a = withB.withColumn("__j", explode(roles))
          .repartition(p, col("block"), col("__b"), col("__j")).alias("a")
        val b = withB.withColumn("__i", explode(roles))
          .repartition(p, col("block"), col("__i"), col("__b")).alias("b")
        // a plays role (own bucket, j); b plays role (i, own bucket) —
        // they meet exactly when (i, j) = (bucket_a, bucket_b).
        a.join(b,
          col("a.block") === col("b.block") &&
            col("a.__b") === col("b.__i") && col("a.__j") === col("b.__b") &&
            col("a.id") < col("b.id") && guard)
      }
    joined
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.name").as("a_name"), col("b.name").as("b_name"),
        metric(col("a.name"), col("b.name")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** [[selfPairs]] for SIMILARITY metrics (higher = closer, no
    * length-difference pruning bound): within-block pairs scored by
    * `sim` and kept at `sim ≥ minSim` — the Jaro–Winkler linkage shape.
    * Same blocked equi-join scale posture; the verifier is a codegen'd
    * column expression in the join projection.
    */
  def similarityPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      minSim: Double,
      sim: (Column, Column) => Column): DataFrame = {
    // same explicit block-key partitioning as [[selfPairs]] (r17): the
    // similarity kernel otherwise runs in the AQE-coalesced single task
    val side = df.select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("block"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("block"))
    side.alias("a").join(side.alias("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.name").as("a_name"), col("b.name").as("b_name"),
        sim(col("a.name"), col("b.name")).as("sim"))
      .where(col("sim") >= minSim)
  }

  /** Sorted-neighborhood candidate pairs: within each block, sort by
    * `nameCol` and pair every record with its `w` successors in sort
    * order — the OTHER classic blocking scheme, catching near-matches
    * that SORT adjacently even when no single blocking key collides
    * (typo'd prefixes, transposed tokens). Candidate count is ≤ w·n,
    * LINEAR in the table — vs Σ|b|² for key blocking — at the cost of
    * missing pairs that sort far apart; production ER runs both and
    * unions (multi-pass SNM).
    *
    * Emits `(block, a_id, b_id, a_name, b_name, rank_gap, dist)` — all
    * candidates with their Levenshtein distance, unfiltered: thresholding
    * is the verifier's policy decision, not the blocker's.
    *
    * Scale shape: NO self-join — each record's `w` successors come from
    * `lead(g)` over the same per-block sort (parallel across blocks,
    * never a global row_number), then one `explode` fans the w gap
    * structs into pair rows. ONE shuffle total, and the sorted run is
    * read once instead of being materialized twice as join inputs.
    */
  def sortedNeighborhood(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1: $w")
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("block")).orderBy(col("name"), col("id"))
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("block"))
    val withLeads = (1 to w).foldLeft(base) { (acc, g) =>
      acc.withColumn(s"__l$g",
        struct(lead(col("id"), g).over(win).as("id"),
          lead(col("name"), g).over(win).as("name"),
          lit(g.toLong).as("gap")))
    }
    withLeads
      .withColumn("__s", explode(array((1 to w).map(g => col(s"__l$g")): _*)))
      .where(col("__s.id").isNotNull)
      .select(col("block"), col("id").as("a_id"), col("__s.id").as("b_id"),
        col("name").as("a_name"), col("__s.name").as("b_name"),
        col("__s.gap").as("rank_gap"),
        levenshtein(col("name"), col("__s.name")).cast("long").as("dist"))
  }

  /** Blocking-key COST PROFILE — the planner's question before any
    * blocked fuzzy join runs: how big are the blocks this key produces,
    * and how many candidate pairs (Σ|b|·(|b|−1)/2, the join's actual
    * work) does each size class contribute? Block sizes roll up into
    * power-of-two classes (`⌊log2(size)⌋`, exact integer bit length) so
    * the report stays bounded however skewed the key is; a single hot
    * class carrying most of `n_pairs` says "salt or refine this key"
    * before the quadratic join is ever attempted.
    *
    * Scale shape: one count agg on the block key (map-side combined) +
    * a log-bounded rollup. The profiled table never self-joins.
    */
  def blockProfile(df: DataFrame, blockKey: Column): DataFrame = {
    df.select(blockKey.as("__b"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__size"))
      // ⌊log2(size)⌋ via binary-digit count — exact integer string math
      // in every engine, where float log2 formulations differ in ulps
      .withColumn("size_class", (length(bin(col("__size"))) - 1).cast("long"))
      .groupBy(col("size_class"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("__size")).as("n_rows"),
        sum(expr("(__size * (__size - 1)) div 2")).as("n_pairs"))
  }

  /** Fellegi–Sunter-style agreement scoring over blocked candidate
    * pairs: within each block, every a_id < b_id pair is scored
    * `Σ_field (agree ? +w_agree : −w_disagree)` and classified
    * `is_match = score ≥ minScore` — the probabilistic-record-linkage
    * decision rule with caller-supplied integer log-odds weights (rare
    * fields like a phone prefix get big weights, common ones like a
    * region small; calibrate offline from labeled pairs). Field
    * agreement is NULL-SAFE equality, so two missing values AGREE — the
    * conventional ER treatment of "no evidence either way" fields is to
    * give them small weights, not to special-case NULL.
    *
    * Scale shape: the same blocked equi-join as [[selfPairs]] — shuffle
    * carries only id + the compared fields, cost Σ_b |b|², no cross
    * join — with the scoring a pure codegen'd column expression in the
    * join's projection. Hot blocks take the same remedies (grid salting,
    * finer keys); emitted pairs keep both field values for downstream
    * clerical review.
    *
    * @param fields (column, agreeWeight, disagreeWeight) per compared
    *               field; weights are positive integers
    */
  def agreementPairs(
      df: DataFrame,
      idCol: String,
      blockKey: Column,
      fields: Seq[(String, Long, Long)],
      minScore: Long): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    require(fields.forall { case (_, aw, dw) => aw > 0 && dw > 0 },
      "agree/disagree weights must be positive")
    val side = df.select(
      (col(idCol).as("id") +: blockKey.as("block") +:
        fields.map { case (f, _, _) => col(f).as(f) }): _*)
    val score = fields.map { case (f, aw, dw) =>
      when(col(s"a.$f") <=> col(s"b.$f"), lit(aw)).otherwise(lit(-dw))
    }.reduce(_ + _)
    side.alias("a")
      .join(side.alias("b"), col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(
        (col("a.id").as("a_id") +: col("b.id").as("b_id") +:
          fields.flatMap { case (f, _, _) =>
            Seq(col(s"a.$f").as(s"a_$f"), col(s"b.$f").as(s"b_$f"))
          } :+ score.as("score") :+ (score >= minScore).as("is_match")): _*)
  }
}

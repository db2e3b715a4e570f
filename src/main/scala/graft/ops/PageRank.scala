package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — graph centrality over an edge list,
  * companion to [[Components]] in the graph-resolution toolkit (e.g.
  * weighting near-duplicate clusters, ranking domains in a link graph
  * before corpus sampling).
  *
  * All arithmetic is INTEGER (ranks scaled by `scale`, per-edge
  * contributions floored): integer sums are associative-commutative
  * regardless of partitioning or merge order, so the result is exactly
  * reproducible across engines, partition counts and retries — float
  * PageRank differs in the last ulps between runs, which poisons
  * hash-based regression gates. The cost is a deterministic rounding-down
  * of ≤ 1/scale per edge per iteration; with scale = 10⁶ that is noise
  * for any ranking use.
  *
  * Scale shape per iteration: one equi-join of the (static) out-degree
  * edge list with the current ranks on the source id + one aggregation on
  * the destination id — both shuffle on node ids, exactly like any wide
  * join; ranks are staged every few rounds ([[Staging.stage]], caller-
  * selectable fault tolerance via `reliable`) so the plan stays flat
  * instead of growing a deep lineage. No driver-side state; edge
  * degrees are computed once and reused.
  *
  * Simplification (documented contract): dangling-node mass is NOT
  * redistributed — a node with no out-edges simply absorbs rank. Callers
  * wanting classic PageRank normalization should add reverse edges or a
  * sink node. Iteration count is a parameter (fixed-horizon, not
  * convergence-tested) so the output is a pure function of the input.
  */
object PageRank {

  /** (id, rank) after `iterations` rounds of
    * `rank = (1-d)·scale + Σ_incoming ⌊d · rank_src / outdeg_src⌋`,
    * with d = dampingNum/100, rank₀ = scale.
    */
  def ranksFixedPoint(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      scale: Long = 1000000L,
      dampingNum: Long = 85L,
      reliable: Boolean = false): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    require(scale % 100 == 0, s"scale must be a multiple of 100 for an exact teleport term: $scale")
    require(dampingNum >= 0 && dampingNum <= 100, s"dampingNum must be in [0,100]: $dampingNum")
    // Materialize the (possibly expensive) upstream edge computation
    // once — nodes, degrees and the degree-joined edge list all derive
    // from it, and without this each derivation re-runs the caller's
    // whole edge-building plan. Posture is caller-selectable
    // ([[Staging.stage]]): `reliable = true` keeps lineage so a lost
    // executor recomputes instead of failing — the preemptible-cluster
    // posture; the loop below is integer-exact, so recompute reproduces
    // every partition bit-identically.
    val e = Staging.stage(
      edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d")),
      reliable)
    // Partition the loop-invariant sides ONCE and CACHE them: an
    // InMemoryRelation keeps its outputPartitioning through planning
    // (localCheckpoint would not — RDD-backed plans lose partitioning
    // AND statistics, which made every iteration re-shuffle the full
    // edge list). With edges cached hash(s) and nodes cached hash(id),
    // each iteration exchanges only the narrow ranks rows plus the
    // contribution aggregation — the irreducible PageRank shuffle. The
    // caches are dropped before returning; the returned ranks are
    // checkpoint-materialized and independent of them.
    val p = e.sparkSession.sparkContext.defaultParallelism
    val nodes = e.select(col("s").as("id")).union(e.select(col("d").as("id")))
      .distinct().repartition(p, col("id")).cache()
    val deg = e.groupBy("s").agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(deg, "s").repartition(p, col("s")).cache()
    val teleport = scale * (100 - dampingNum) / 100
    var ranks = nodes.withColumn("rank", lit(scale))
    val staged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- 1 to iterations) {
      val contribs = contributions(withDeg, ranks, dampingNum)
      val next = nodes.join(contribs.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"), (lit(teleport) + coalesce(col("c"), lit(0L))).as("rank"))
      // Rank lineage grows LINEARLY (each iteration references the prior
      // ranks exactly once), so staging every iteration buys nothing
      // structurally while costing one materialization each round. Stage
      // every 4th round and always on the last. Plan depth per posture:
      // localCheckpoint and the reliablePin checkpoint() truncate to a
      // leaf; the lineage-keeping reliable persist leaves the analyzed
      // tree linear in rounds (execution stays flat — cache substitution
      // plans each persisted subtree as a leaf; see [[Staging]]).
      if (i == iterations || i % 4 == 0) {
        ranks = Staging.stage(next, reliable)
        staged += ranks
      } else ranks = next
    }
    // The reliable persist is LAZY — force the final ranks onto disk now,
    // while the loop-invariant caches are still alive (otherwise the
    // caller's first action re-derives nodes/degrees once per iteration),
    // then drop the intermediate staged frames (each referenced exactly
    // once; only the final one backs the returned plan).
    if (reliable) {
      // no `iterations > 0` guard: a zero-iteration call must still
      // release the staged input (it otherwise outlives the call in the
      // CacheManager) — but then `ranks` was never staged by the loop,
      // so stage it first or the count materializes nothing durable and
      // every caller action re-derives the edge plan from source
      if (iterations == 0) ranks = Staging.stage(ranks, reliable)
      ranks.count()
      staged.dropRight(1).foreach(_.unpersist())
      // staged input too: the pinned ranks read from disk, and lineage
      // is kept, so post-release block loss recomputes from source
      e.unpersist()
    }
    nodes.unpersist()
    withDeg.unpersist()
    ranks
  }

  /** Personalized (topic-sensitive) PageRank: identical fixed-point loop,
    * but the teleport term lands ONLY on the `seeds` — so rank mass
    * concentrates around the seed neighborhood and the output reads as
    * "proximity to the seeds", the seed-expansion primitive behind
    * crawl-frontier prioritization and "more like these" corpus sampling.
    * Convention (documented, part of the contract): each seed receives
    * the FULL per-node teleport `⌊scale·(100−d)/100⌋` rather than a
    * 1/|seeds| share — keeping the arithmetic integer-exact; ranks are
    * comparable within a run, as any PPR use wants. Non-seed rank₀ = 0,
    * seed rank₀ = scale.
    *
    * Scale shape: exactly [[ranksFixedPoint]] — cached edge layout, per
    * round one narrow rank join + one contribution aggregation; the seed
    * flag is a broadcast join onto the (cached) node list, applied once.
    */
  def personalizedFixedPoint(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iterations: Int,
      scale: Long = 1000000L,
      dampingNum: Long = 85L,
      reliable: Boolean = false): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    require(scale % 100 == 0, s"scale must be a multiple of 100 for an exact teleport term: $scale")
    require(dampingNum >= 0 && dampingNum <= 100, s"dampingNum must be in [0,100]: $dampingNum")
    val e = Staging.stage(
      edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d")),
      reliable)
    val p = e.sparkSession.sparkContext.defaultParallelism
    val seedFlag = seeds.select(col(seedCol).cast("long").as("id"))
      .distinct().withColumn("__seed", lit(true))
    val nodes = e.select(col("s").as("id")).union(e.select(col("d").as("id")))
      .distinct()
      .join(broadcast(seedFlag), Seq("id"), "left")
      .withColumn("__seed", coalesce(col("__seed"), lit(false)))
      .repartition(p, col("id")).cache()
    val deg = e.groupBy("s").agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(deg, "s").repartition(p, col("s")).cache()
    val teleport = scale * (100 - dampingNum) / 100
    var ranks = nodes.select(col("id"),
      when(col("__seed"), lit(scale)).otherwise(lit(0L)).as("rank"))
    val staged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- 1 to iterations) {
      val contribs = contributions(withDeg, ranks, dampingNum)
      val next = nodes.join(contribs.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"),
          (when(col("__seed"), lit(teleport)).otherwise(lit(0L)) +
            coalesce(col("c"), lit(0L))).as("rank"))
      if (i == iterations || i % 4 == 0) {
        ranks = Staging.stage(next, reliable)
        staged += ranks
      } else ranks = next
    }
    // Same materialize-then-release dance as [[ranksFixedPoint]],
    // staged input included (and released even at zero iterations,
    // staging the never-looped ranks first so the pin holds something).
    if (reliable) {
      if (iterations == 0) ranks = Staging.stage(ranks, reliable)
      ranks.count()
      staged.dropRight(1).foreach(_.unpersist())
      e.unpersist()
    }
    nodes.unpersist()
    withDeg.unpersist()
    ranks
  }

  /** One iteration's incoming-contribution aggregation — split out so the
    * plan-shape suite can assert the cached edge layout is joined with NO
    * edge-side exchange (the scale contract of the whole loop). Build
    * side = ranks (one narrow row per node); the hint pins the
    * shuffled-hash strategy where checkpointed stats can't guide it.
    */
  private[graft] def contributions(
      withDeg: DataFrame,
      ranks: DataFrame,
      dampingNum: Long): DataFrame =
    withDeg.join(ranks.hint("shuffle_hash"), col("s") === col("id"))
      .select(col("d").as("id"),
        expr(s"(rank * $dampingNum) div (100 * outdeg)").as("c"))
      .groupBy("id").agg(sum("c").as("c"))

  /** WEIGHTED PageRank: [[ranksFixedPoint]]'s loop with integer edge
    * weights — a node's rank splits proportionally over its out-weights,
    * `contribution = ⌊d · rank · w / (100 · wsum_src)⌋`. The link-graph
    * ranking when edges carry multiplicities (co-order counts, citation
    * counts, dedup-cluster sizes) instead of presence bits. Duplicate
    * (src, dst) rows fold by SUMMING weights upfront, so a multigraph
    * input ranks identically to its weighted-simple-graph collapse;
    * weights must be ≥ 1 (probed with a bounded limit-1 fetch, the
    * [[Paths.weightedSssp]] contract). The per-edge product
    * rank·d·w needs more than 64 bits once rank mass meets large
    * weights, so it is computed in decimal(38,0) with integral div —
    * same overflow posture as [[Ngrams.skipGramLift]]. Dangling
    * contract, staging cadence and scale shape are [[ranksFixedPoint]]'s
    * (the weight fold rides the one degree aggregation).
    */
  def weightedRanksFixedPoint(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iterations: Int,
      scale: Long = 1000000L,
      dampingNum: Long = 85L,
      reliable: Boolean = false): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    require(scale % 100 == 0, s"scale must be a multiple of 100 for an exact teleport term: $scale")
    require(dampingNum >= 0 && dampingNum <= 100, s"dampingNum must be in [0,100]: $dampingNum")
    val raw = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"), col(weightCol).cast("long").as("w"))
    // The weight-quality probe RIDES the weight-fold aggregation (min
    // weight + null census per folded edge) instead of scanning the raw
    // edge plan separately — a standalone limit-1 probe would execute
    // the caller's whole upstream join once just to check signs, then
    // staging would execute it again.
    val eAll = Staging.stage(
      raw.groupBy(col("s"), col("d")).agg(sum(col("w")).as("w"),
        min(col("w")).as("__mn"),
        (count(lit(1)) - count(col("w"))).as("__nn")),
      reliable)
    // bounded driver fetch (<= 1 row, on the staged leaf): name a
    // non-positive or null weight now instead of silently mis-splitting
    // rank mass
    val bad = eAll.where(col("__mn") <= 0L || col("__nn") > 0L).limit(1).collect()
    require(bad.isEmpty,
      s"weightedRanksFixedPoint: non-positive or null weight on edge ${bad.headOption.map(r => (r.get(0), r.get(1))).getOrElse("")} — weights must be >= 1")
    val e = eAll.select(col("s"), col("d"), col("w"))
    val p = e.sparkSession.sparkContext.defaultParallelism
    val nodes = e.select(col("s").as("id")).union(e.select(col("d").as("id")))
      .distinct().repartition(p, col("id")).cache()
    val wsum = e.groupBy("s").agg(sum(col("w")).as("wsum"))
    val withW = e.join(wsum, "s").repartition(p, col("s")).cache()
    val teleport = scale * (100 - dampingNum) / 100
    // Adaptive precision: total rank mass is invariant-bounded by
    // n·scale (teleport injects n·(1−d)·scale per round, damping keeps
    // ≤ d of the rest), so the per-edge product rank·d·w is bounded by
    // n·scale·d·maxW. Probe n and maxW once (two bounded one-row
    // fetches on cached frames) and take the codegen'd Long path when
    // the bound clears 2^62 — decimal(38,0) otherwise (the correctness
    // floor; same overflow posture as skipGramLift). Identical values
    // either way: exact integer floor division on both paths.
    val nNodes = nodes.count()
    val maxW = withW.agg(max(col("w"))).head().getLong(0)
    val longSafe =
      BigInt(nNodes) * scale * dampingNum.max(1L) * maxW < BigInt(1L << 62)
    val contribExpr =
      if (longSafe) s"(rank * $dampingNum * w) div (100 * wsum)"
      else s"cast((cast(rank as decimal(38,0)) * $dampingNum * w) div (100 * cast(wsum as decimal(38,0))) as bigint)"
    var ranks = nodes.withColumn("rank", lit(scale))
    val staged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- 1 to iterations) {
      val contribs = withW.join(ranks.hint("shuffle_hash"), col("s") === col("id"))
        .select(col("d").as("id"), expr(contribExpr).as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      val next = nodes.join(contribs.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"), (lit(teleport) + coalesce(col("c"), lit(0L))).as("rank"))
      if (i == iterations || i % 4 == 0) {
        ranks = Staging.stage(next, reliable)
        staged += ranks
      } else ranks = next
    }
    if (reliable) {
      if (iterations == 0) ranks = Staging.stage(ranks, reliable)
      ranks.count()
      staged.dropRight(1).foreach(_.unpersist())
      // the staged frame is eAll — e is a projection of it, and uncache
      // matches by sameResult, so releasing the projection would no-op
      eAll.unpersist()
    }
    nodes.unpersist()
    withW.unpersist()
    ranks
  }
}

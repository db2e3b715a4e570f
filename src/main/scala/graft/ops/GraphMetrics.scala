package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected pair list — the graph-density
  * metric that complements [[Components]] (who is connected) and
  * [[PageRank]] (who is central): how CLUSTERED the neighborhood is.
  * On a near-duplicate candidate graph, triangle-rich nodes are template
  * families (every member pairs with every other); on an entity
  * co-occurrence graph, triangles expose tightly-coupled groups.
  *
  * Algorithm: canonicalize edges to u < v, then count each triangle once
  * at its ordered orientation u < v < w via two hash joins —
  * e₁(u,v) ⋈ e₂(v,w) builds wedges, ⋈ e₃(u,w) closes them. Three
  * shuffles on node ids, no driver state. The id-ordering means each
  * wedge/triangle materializes exactly once (not 3× or 6×). The wedge
  * intermediate is Σ_v deg⁺(v)² — bounded by canonical orientation; for
  * power-law graphs at extreme scale the standard refinement is ordering
  * by (degree, id) instead of raw id, which this API permits by
  * pre-mapping ids.
  */
object GraphMetrics {

  /** Canonical undirected edge set (u < v, long ids): direction,
    * duplicates, self-loops and nulls cleaned — the shared front door of
    * every graph op here (and of [[Components]], which carries its own
    * copy to stay self-contained).
    */
  private def canonicalEdges(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .distinct()

  /** Per-node triangle participation: (id, n_triangles) for every node in
    * at least one triangle. Input direction/self-loops/duplicates are
    * cleaned here; ids must be numeric.
    */
  def nodeTriangles(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val e = canonicalEdges(pairs, aCol, bCol)
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.v") === col("e2.u"))
      .join(e.alias("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Synchronous mode-based label propagation — the lightweight community
    * detector: after `rounds` rounds, densely connected neighborhoods
    * converge onto shared labels, without the full contraction machinery
    * of [[Components]] (LPA labels ≠ connected components: a bridge node
    * adopts whichever side dominates its neighborhood).
    *
    * Round semantics (fully deterministic, partitioning-independent):
    * every node simultaneously adopts the most frequent label among its
    * NEIGHBORS, ties broken toward the smallest label; labels start as
    * the node's own id. Integer counts + a total tie order make the
    * result a pure function of the edge set — no RNG, no update-order
    * dependence (the classic async formulation is update-order-sensitive,
    * which would poison cross-engine checks).
    *
    * Scale shape per round: one join of the (cached, layout-pinned)
    * symmetrized edge list with the narrow labels table + two
    * aggregations on node ids — the same per-round cost model as
    * [[PageRank]], with the edge list never re-shuffling after setup.
    */
  def labelPropagation(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      rounds: Int = 2): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val e = canonicalEdges(pairs, aCol, bCol).localCheckpoint()
    val p = e.sparkSession.sparkContext.defaultParallelism
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .toDF("src", "dst")
      .repartition(p, col("dst")).cache()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    for (_ <- 1 to rounds) {
      // Neighbor-label tally: join on the label-carrier side (dst), so
      // the cached dst-hashed edge layout is reused every round and only
      // the narrow labels table moves.
      val tally = sym.join(labels.hint("shuffle_hash"), col("dst") === col("id"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("n"))
      // argmax by (count desc, label asc) via struct max: among equal
      // counts, the largest negated label is the smallest label.
      labels = tally
        .groupBy(col("src"))
        .agg(max(struct(col("n"), (-col("label")).as("nl"))).as("m"))
        .select(col("src").as("id"), (-col("m.nl")).as("label"))
        .localCheckpoint()
    }
    sym.unpersist()
    labels
  }

  /** Exact 2-hop neighborhood size per node: (id, n_1hop, n_2hop) where
    * n_2hop counts DISTINCT nodes reachable in ≤2 hops (self excluded) —
    * the local-reach metric behind influence scoring and crawl frontier
    * sizing, and the exact quantity the degeneracy of a near-dup graph
    * shows up in first (template families have 2-hop ≈ 1-hop ≈ family
    * size).
    *
    * Scale shape: one self-join of the symmetrized edge list on the
    * middle node builds 2-hop paths; a distinct + count on (src, dst)
    * collapses them. The wedge intermediate is Σ_v deg(v)² — same bound
    * as [[nodeTriangles]]; for power-law graphs cap or sample hub
    * neighborhoods upstream. No driver state, no iteration.
    */
  def neighborhoodSize(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val e = canonicalEdges(pairs, aCol, bCol)
    val sym = e.select(col("u").as("src"), col("v").as("dst"))
      .union(e.select(col("v").as("src"), col("u").as("dst")))
    // Materialize the deduped adjacency once: it feeds BOTH sides of the
    // wedge join, the union and the 1-hop count — without this the
    // caller's (possibly expensive) pair-building plan re-runs four
    // times. localCheckpoint trades re-partitioning two small edge-list
    // shuffles for not re-running the upstream join 4×.
    val oneHop = sym.distinct().localCheckpoint()
    val twoHop = oneHop.alias("p")
      .join(oneHop.alias("q"), col("p.dst") === col("q.src"))
      .select(col("p.src").as("src"), col("q.dst").as("dst"))
      .where(col("src") =!= col("dst"))
      .union(oneHop)
      .distinct()
    oneHop.groupBy("src").agg(count(lit(1)).as("n_1hop"))
      .join(twoHop.groupBy("src").agg(count(lit(1)).as("n_2hop")), Seq("src"))
      .withColumnRenamed("src", "id")
  }
}

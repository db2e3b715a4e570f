package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Borůvka minimum spanning forest over a weighted pair list — the
  * cheapest-connection skeleton of a similarity/affinity graph: the MSF
  * of a near-duplicate candidate graph (weight = distance) is its
  * single-linkage dendrogram backbone, and cutting it at a threshold IS
  * single-linkage clustering at that threshold.
  *
  * Algorithm (classic distributed Borůvka): every component elects its
  * minimum outgoing edge (total order `(w, u, v)` — deterministic under
  * ties), elected edges join the forest, touched components contract
  * (via [[Components.connectedComponents]] on the component-level edge
  * graph — O(log) star-contraction rounds inside each Borůvka round),
  * repeat. Components at least halve per round, so O(log n) rounds
  * regardless of topology — the property that makes Borůvka (and not
  * Prim/Kruskal, both inherently sequential) THE distributed MSF
  * algorithm.
  *
  * Determinism: the elected edge per component is the minimum of a
  * total order, so the returned forest is a pure function of the input;
  * with distinct weights it is THE unique MSF. With tied weights the
  * edge CHOICE may differ from other correct algorithms, but every MSF
  * of a graph has the same multiset of weights — per-component edge
  * count and total weight are invariants any reference implementation
  * must agree on (what q305's oracle checks).
  *
  * Scale shape per round: two label joins on node ids + one
  * per-component min aggregation (map-side combined: one candidate row
  * per component per partition) + the component contraction; per-round
  * state (labels, forest) is staged ([[Staging.stage]], caller-
  * selectable fault tolerance via `reliable`). Nothing ever collects.
  */
object SpanningForest {

  /** Forest edges `(a_id, b_id, weight)` (canonical a < b). Multi-edges
    * collapse to their minimum weight first; self-loops drop. Fails
    * loudly if `maxRounds` is hit — O(log n) suffices, so that is a bug,
    * not a big graph.
    */
  def boruvka(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      wCol: String = "weight",
      maxRounds: Int = 50,
      reliable: Boolean = false): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val e = Staging.stage(pairs
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"),
        col(wCol).cast("long").as("w"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"), col("w"))
      .groupBy("u", "v").agg(min(col("w")).as("w")),
      reliable)
    val spark = e.sparkSession
    var labels = Staging.stage(
      e.select(col("u").as("id")).union(e.select(col("v").as("id")))
        .distinct().select(col("id"), col("id").as("comp")),
      reliable)
    var forest = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("a_id BIGINT, b_id BIGINT, weight BIGINT"))
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // label both endpoints; only inter-component edges are candidates.
      // Staged: el is read three times (the convergence probe + both
      // branches of the election union) — unstaged, the dominant
      // two-join plan would execute three times per round.
      val el = Staging.stage(e
        .join(labels.select(col("id").as("u"), col("comp").as("cu")), Seq("u"))
        .join(labels.select(col("id").as("v"), col("comp").as("cv")), Seq("v"))
        .where(col("cu") =!= col("cv")),
        reliable)
      if (el.isEmpty) { converged = true; if (reliable) el.unpersist() }
      else {
        // per-component minimum outgoing edge, total order (w, u, v)
        val sel = Staging.stage(el
          .select(col("cu").as("comp"),
            struct(col("w"), col("u"), col("v"), col("cu"), col("cv")).as("pick"))
          .union(el.select(col("cv").as("comp"),
            struct(col("w"), col("u"), col("v"), col("cu"), col("cv")).as("pick")))
          .groupBy("comp").agg(min(col("pick")).as("m"))
          .select(col("m.w").as("w"), col("m.u").as("u"), col("m.v").as("v"),
            col("m.cu").as("cu"), col("m.cv").as("cv"))
          .distinct(),
          reliable)
        forest = forest.unionByName(
          sel.select(col("u").as("a_id"), col("v").as("b_id"), col("w").as("weight")))
        // contract the touched components: star contraction on the
        // component-level edge graph, then relabel
        val merged = Components.connectedComponents(
          sel.select(col("cu").as("a_id"), col("cv").as("b_id")),
          reliable = reliable)
        val next = Staging.stage(labels
          .join(merged.withColumnRenamed("id", "comp"), Seq("comp"), "left")
          .select(col("id"), coalesce(col("component"), col("comp")).as("comp")),
          reliable)
        next.count()
        if (reliable) { labels.unpersist(); el.unpersist() }
        labels = next
      }
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"boruvka did not converge in $maxRounds rounds — components at " +
          "least halve per round, so this is a bug, not a big graph")
    Staging.stage(forest, reliable)
  }
}

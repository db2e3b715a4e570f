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

  /** Per-node triangle participation: (id, n_triangles) for every node in
    * at least one triangle. Input direction/self-loops/duplicates are
    * cleaned here; ids must be numeric.
    */
  def nodeTriangles(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val e = pairs
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .distinct()
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.v") === col("e2.u"))
      .join(e.alias("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }
}

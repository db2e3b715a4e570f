package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted path primitives over edge tables. */
object Paths {

  /** Multi-source WEIGHTED shortest paths by distributed Bellman–Ford:
    * per round, every tentative distance relaxes across every out-edge
    * (`new(v) = min(dist(v), min_u dist(u) + w(u,v))`) until no
    * distance improves — rounds = the hop count of the deepest
    * shortest path, NOT the node count (the classic distributed SSSP
    * on nonnegative integer weights; Dijkstra's priority queue is
    * inherently sequential and has no place here). Parallel edges
    * collapse to their minimum weight (the only weight a shortest path
    * can use). Returns `(source, node, dist)` for every reached node;
    * exact Long arithmetic end to end.
    *
    * Scale shape per round: ONE node-keyed equi-join (distance
    * frontier × staged edge list) + a map-side-combined min-agg;
    * change detection is a limit-1 probe on the staged merge. The
    * distance table is sources × reachable nodes — callers bound the
    * source set, exactly as [[GraphMetrics.betweennessSampled]]
    * documents for its balls. `maxIter` caps the rounds and THROWS on
    * exhaustion (negative weights are rejected upfront; with them
    * Bellman–Ford's fixpoint is not a shortest path).
    */
  def weightedSssp(
      edges: DataFrame,
      sources: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      weightCol: String = "w",
      sourceCol: String = "id",
      maxIter: Int = 60,
      reliable: Boolean = false): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1: $maxIter")
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def staged(df: DataFrame): DataFrame = {
      val s = Staging.stage(df, reliable); frames += s; s
    }
    val raw = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"), col(weightCol).cast("long").as("w"))
    // bounded driver fetch (<= 1 row): fail loudly on negative weights
    val neg = raw.where(col("w") < 0L).limit(1).collect()
    require(neg.isEmpty,
      s"weightedSssp: negative weight ${neg.headOption.map(_.getLong(2)).getOrElse(0L)} " +
        s"on edge ${neg.headOption.map(r => s"${r.getLong(0)}->${r.getLong(1)}").getOrElse("")}")
    val e = staged(raw.where(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w")))
    var dist = staged(sources.select(col(sourceCol).cast("long").as("source")).distinct()
      .select(col("source"), col("source").as("node"), lit(0L).as("dist")))
    var spent = 0
    var changed = !dist.isEmpty
    while (changed) {
      val relaxed = dist.join(e, col("node") === col("src"))
        .groupBy(col("source"), col("dst"))
        .agg(min(col("dist") + col("w")).as("cand"))
        .select(col("source"), col("dst").as("node"), col("cand"))
      val merged = staged(dist.join(relaxed, Seq("source", "node"), "full")
        .select(col("source"), col("node"), col("dist"), col("cand"),
          least(coalesce(col("dist"), col("cand")),
            coalesce(col("cand"), col("dist"))).as("nd")))
      changed = !merged.where(col("dist").isNull || col("nd") < col("dist")).isEmpty
      if (changed) {
        spent += 1
        if (spent > maxIter) throw new IllegalStateException(
          s"weightedSssp: no fixpoint within maxIter=$maxIter relaxation rounds — " +
            "deepest shortest path exceeds the budget (raise maxIter)")
      }
      dist = staged(merged.select(col("source"), col("node"), col("nd").as("dist")))
    }
    val out = Staging.stage(dist, reliable)
    if (reliable) {
      out.count()
      frames.foreach(_.unpersist())
    }
    out
  }

}

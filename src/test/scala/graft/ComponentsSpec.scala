package graft

import org.apache.spark.sql.functions._
import graft.ops.{Components, Dedup}

/** Star-contraction connected components cross-checked against a
  * driver-side union-find on random graphs (the reference algorithm can't
  * be wrong), plus the near-dup keep/drop composition.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val roots = nodes.groupBy(x => find(x.toInt))
    roots.flatMap { case (_, members) => members.map(_ -> members.min) }
  }

  test("random graphs match union-find exactly") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 120
      val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val got = Components.connectedComponents(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(n, edges), s"trial $trial diverged")
    }
  }

  test("long chain converges (O(log n) rounds, not O(diameter))") {
    // a 400-node path: min-label propagation would need ~400 rounds;
    // star contraction must finish well inside the 50-round bound
    val edges = (0L until 399L).map(i => (i, i + 1))
    val got = Components.connectedComponents(edges.toDF("a_id", "b_id"))
      .agg(count(lit(1)), count_distinct(col("component")), min(col("component"))).head()
    assert(got.getLong(0) == 400 && got.getLong(1) == 1 && got.getLong(2) == 0)
  }

  test("dropNearDuplicates keeps exactly the min-id representative per cluster") {
    val docs = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters {1,3,5}, {6,7}; 0,2,4,8,9 untouched
    val pairs = Seq((3L, 1L), (3L, 5L), (6L, 7L)).toDF("a_id", "b_id")
    val kept = Dedup.dropNearDuplicates(docs, pairs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 1L, 2L, 4L, 6L, 8L, 9L))
  }

  test("mergeIncrement == from-scratch recompute on random edge splits") {
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 3) {
      val edges = Seq.fill(70)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2).distinct
      val (old, fresh) = edges.splitAt(edges.size / 2)
      val prev = Components.connectedComponents(old.toDF("a_id", "b_id"))
      val got = Components.mergeIncrement(prev, fresh.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Components.connectedComponents(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // old-graph nodes isolated in the union graph (all their edges were
      // in `old` and none survive dedup... they do survive) — want covers
      // every edge endpoint; got additionally keeps prev-only singletons
      assert(got.view.filterKeys(want.contains).toMap == want, s"trial $trial diverged")
      assert(got.keySet == want.keySet ++ prev.collect().map(_.getLong(0)),
        s"trial $trial coverage wrong")
    }
  }

  test("mergeIncrement: untouched singletons keep labels; new nodes enter; empty increment is identity") {
    // prev: component {1,2} labeled 1, singleton {9}
    val prev = Seq((1L, 1L), (2L, 1L), (9L, 9L)).toDF("id", "component")
    // new edges: 2—3 (extends old component), 20—21 (brand-new nodes)
    val fresh = Seq((2L, 3L), (20L, 21L)).toDF("a_id", "b_id")
    val got = Components.mergeIncrement(prev, fresh)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L, 20L -> 20L, 21L -> 20L))
    val idGot = Components.mergeIncrement(prev,
      Seq.empty[(Long, Long)].toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idGot == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
  }
}

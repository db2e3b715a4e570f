package graft

import graft.ops.{Matching, Paths}

/** Weighted SSSP vs an in-memory Dijkstra, and distributed greedy
  * matching vs the sequential greedy it must equal exactly.
  */
class PathsAndMatchingSpec extends SparkSpec {
  import spark.implicits._

  // ---- weightedSssp -------------------------------------------------------

  private def dijkstra(
      edges: Seq[(Long, Long, Long)], s: Long): Map[Long, Long] = {
    val adj = edges.filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (k, v) =>
        (k, v.groupBy(_._2).map { case (d, es) => (d, es.map(_._3).min) }.toSeq)
      }
    val dist = scala.collection.mutable.Map(s -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, s))(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u)) {
        for ((v, w) <- adj.getOrElse(u, Seq.empty)) {
          if (dist.get(v).forall(_ > d + w)) { dist(v) = d + w; pq.enqueue((d + w, v)) }
        }
      }
    }
    dist.toMap
  }

  private def sssp(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      maxIter: Int = 60): Map[(Long, Long), Long] =
    Paths.weightedSssp(edges.toDF("src", "dst", "w"), sources.toDF("id"), maxIter = maxIter)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

  test("weightedSssp: hand case where fewer hops is NOT shorter") {
    // 1→3 direct costs 10; 1→2→3 costs 3
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 2L))
    assert(sssp(edges, Seq(1L)) ==
      Map((1L, 1L) -> 0L, (1L, 2L) -> 1L, (1L, 3L) -> 3L))
  }

  test("weightedSssp agrees with Dijkstra on random weighted digraphs, multi-source") {
    val rnd = new scala.util.Random(59)
    for (trial <- 0 until 3) {
      val edges = Seq.fill(60)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong,
        1L + rnd.nextInt(9).toLong)).filter(e => e._1 != e._2)
      val sources = Seq(0L, 7L)
      val want = sources.flatMap(s =>
        dijkstra(edges, s).map { case (n, d) => ((s, n), d) }).toMap
      assert(sssp(edges, sources) == want, s"trial $trial")
    }
  }

  test("weightedSssp: parallel edges collapse to min; negatives refused; maxIter throws") {
    val par = Seq((1L, 2L, 9L), (1L, 2L, 4L))
    assert(sssp(par, Seq(1L))((1L, 2L)) == 4L)
    val eNeg = intercept[IllegalArgumentException] {
      sssp(Seq((1L, 2L, -3L)), Seq(1L))
    }
    assert(eNeg.getMessage.contains("negative"))
    val eIter = intercept[IllegalStateException] {
      sssp(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L)), Seq(1L), maxIter = 1)
    }
    assert(eIter.getMessage.contains("maxIter"))
  }

  // ---- greedyMatching -----------------------------------------------------

  private def sequentialGreedy(
      edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2), e._3))
      .groupBy(e => (e._1, e._2)).map { case ((u, v), es) => (u, v, es.map(_._3).min) }
      .toSeq.sortBy(e => (e._3, e._1, e._2))
    val used = scala.collection.mutable.Set.empty[Long]
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for ((u, v, w) <- canon if !used(u) && !used(v)) {
      used += u; used += v; out += ((u, v, w))
    }
    out.toSet
  }

  private def matching(edges: Seq[(Long, Long, Long)], maxIter: Int = 60): Set[(Long, Long, Long)] =
    Matching.greedyMatching(edges.toDF("a_id", "b_id", "w"), maxIter = maxIter)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("matching equals the sequential greedy on a hand triangle + pendant") {
    // triangle 1-2 (w1), 2-3 (w2), 1-3 (w3) + pendant 3-4 (w4):
    // greedy takes 1-2, then 3-4
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L), (3L, 4L, 4L))
    assert(matching(edges) == Set((1L, 2L, 1L), (3L, 4L, 4L)))
  }

  test("matching equals the sequential greedy on random weighted graphs") {
    val rnd = new scala.util.Random(73)
    for (trial <- 0 until 4) {
      val edges = Seq.fill(50)((rnd.nextInt(16).toLong, rnd.nextInt(16).toLong,
        1L + rnd.nextInt(40).toLong)).filter(e => e._1 != e._2)
      assert(matching(edges) == sequentialGreedy(edges), s"trial $trial: $edges")
    }
  }

  test("matching is maximal and respects the one-partner invariant") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
      1L + rnd.nextInt(5).toLong)).filter(e => e._1 != e._2)
    val m = matching(edges)
    val touched = m.flatMap(e => Seq(e._1, e._2))
    assert(touched.size == m.size * 2, "a vertex appears in two matched edges")
    // maximal: no remaining edge has both endpoints free
    val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    assert(!canon.exists { case (u, v) => u != v && !touched(u) && !touched(v) })
  }

  test("matching: monotone path chain exhausts a tiny maxIter loudly") {
    val chain = (1L to 12L).sliding(2).map(p => (p(0), p(1), p(0))).toSeq
    val e = intercept[IllegalStateException] {
      matching(chain, maxIter = 1)
    }
    assert(e.getMessage.contains("maxIter"))
  }
}

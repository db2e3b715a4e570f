package graft

import graft.ops.GraphMetrics

/** Round-10 graph additions: deterministic random walks, double-sweep
  * eccentricity, resource-allocation link prediction and the temporal
  * relay census — hand-computed cases plus in-memory reference replays
  * (the walks reference re-implements the md5 argmin choice, so
  * agreement is exact, not statistical).
  */
class WalksAndMotifsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The operator's contract replayed in memory: at each step the walker
    * picks the neighbor minimizing (md5("walk:step:nbr"), nbr).
    */
  private def referenceWalks(
      edges: Seq[(Long, Long)], starts: Seq[Long], steps: Int): Set[(Long, Long, Long)] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    starts.distinct.flatMap { w =>
      var pos = w
      var alive = true
      val hops = (1 to steps).flatMap { i =>
        if (!alive) Seq.empty
        else adj.get(pos).filter(_.nonEmpty) match {
          case None => alive = false; Seq.empty[(Long, Long)]
          case Some(nbrs) =>
            val next = nbrs.toSeq.map(n => (md5hex(s"$w:$i:$n"), n)).min._2
            pos = next
            Seq((i.toLong, next))
        }
      }
      ((0L, w) +: hops).map { case (i, n) => (w, i, n) }
    }.toSet
  }

  /** Replay for the walkCol variant: the walk id keys the hash stream,
    * the start node is independent of it.
    */
  private def referenceWalksKeyed(
      edges: Seq[(Long, Long)], starts: Seq[(Long, Long)], steps: Int): Set[(Long, Long, Long)] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    starts.distinct.flatMap { case (w, s) =>
      var pos = s
      var alive = true
      val hops = (1 to steps).flatMap { i =>
        if (!alive) Seq.empty
        else adj.get(pos).filter(_.nonEmpty) match {
          case None => alive = false; Seq.empty[(Long, Long)]
          case Some(nbrs) =>
            val next = nbrs.toSeq.map(n => (md5hex(s"$w:$i:$n"), n)).min._2
            pos = next
            Seq((i.toLong, next))
        }
      }
      ((0L, s) +: hops).map { case (i, n) => (w, i, n) }
    }.toSet
  }

  private def md5p32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** node2vecWalks' contract replayed in memory: at each step the walker
    * from prev t standing on x picks the neighbor minimizing
    * (md5₃₂("walk:step:nbr") div classWeight, nbr) with the class from
    * the distance of nbr to t (return / near / far).
    */
  private def referenceBiasedWalks(
      edges: Seq[(Long, Long)], starts: Seq[Long], steps: Int,
      rw: Long, nw: Long, fw: Long): Set[(Long, Long, Long)] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    starts.distinct.flatMap { w =>
      var pos = w
      var prev = w
      var alive = true
      val hops = (1 to steps).flatMap { i =>
        if (!alive) Seq.empty
        else adj.get(pos).filter(_.nonEmpty) match {
          case None => alive = false; Seq.empty[(Long, Long)]
          case Some(nbrs) =>
            val next = nbrs.toSeq.map { n =>
              val cls =
                if (n == prev) rw
                else if (adj.get(prev).exists(_.contains(n))) nw
                else fw
              ((md5p32(s"$w:$i:$n") / cls, n), n)
            }.minBy(_._1)._2
            prev = pos; pos = next
            Seq((i.toLong, next))
        }
      }
      ((0L, w) +: hops).map { case (i, n) => (w, i, n) }
    }.toSet
  }

  test("node2vecWalks agrees exactly with the weighted-race reference on random graphs") {
    val rnd = new scala.util.Random(53)
    for (trial <- 0 until 3) {
      val edges = Seq.fill(40)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
        .filter(e => e._1 != e._2)
      val starts = (0L until 12L).filter(_ => rnd.nextBoolean())
      if (starts.nonEmpty) {
        val got = GraphMetrics.node2vecWalks(
          edges.toDF("a_id", "b_id"), starts.toDF("id"), steps = 4,
          returnWeight = 1L, nearWeight = 2L, farWeight = 4L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == referenceBiasedWalks(edges, starts, 4, 1L, 2L, 4L), s"trial $trial")
      }
    }
  }

  test("node2vecWalks: a dominant return weight makes the walker oscillate") {
    // path 1-2-3-4-5: from 2, with returnWeight huge the race value of
    // the return move is ~2^32/1e6 < 4300 while any other candidate's is
    // >= md5/4 — on this fixture every post-first hop returns, so the
    // walk alternates between the first two positions
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = GraphMetrics.node2vecWalks(
      edges.toDF("a_id", "b_id"), Seq(2L).toDF("id"), steps = 5,
      returnWeight = 1000000L, nearWeight = 1L, farWeight = 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(got == referenceBiasedWalks(edges, Seq(2L), 5, 1000000L, 1L, 1L)
      .map { case (_, s, n) => (s, n) }.toMap)
    assert(got(0L) == 2L)
    for (i <- 2L to 5L) assert(got(i) == got(i - 2L), s"step $i did not oscillate: $got")
  }

  test("randomWalks walkCol: k independent walks per start node, exact vs replay") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 1L))
    // two walk ids per start node — the documented id·k + r scheme
    val starts = Seq((10L, 1L), (11L, 1L), (40L, 4L), (41L, 4L))
    val got = GraphMetrics.randomWalks(
      edges.toDF("a_id", "b_id"), starts.toDF("w", "id"),
      steps = 6, walkCol = "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == referenceWalksKeyed(edges, starts, 6))
    // every walk starts at ITS start node (not at the walk id)
    for ((w, s) <- starts) assert(got.contains((w, 0L, s)), s"walk $w start")
    assert(got.map(_._1) == Set(10L, 11L, 40L, 41L))
  }

  test("random walks agree exactly with the md5-argmin reference on random graphs") {
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 3) {
      val edges = Seq.fill(40)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
        .filter(e => e._1 != e._2)
      val starts = (0L until 12L).filter(_ => rnd.nextBoolean())
      if (starts.nonEmpty) {
        val got = GraphMetrics.randomWalks(
          edges.toDF("a_id", "b_id"), starts.toDF("id"), steps = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == referenceWalks(edges, starts, 4))
      }
    }
  }

  test("random walks are a pure function of the graph (two runs identical)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a_id", "b_id")
    val starts = Seq(1L, 4L).toDF("id")
    val a = GraphMetrics.randomWalks(edges, starts, steps = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = GraphMetrics.randomWalks(edges, starts, steps = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // every consecutive hop is a real edge, every walk ran the full length
    // (no dead ends on a connected symmetric graph)
    val sym = Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L), (3L, 4L), (4L, 3L))
    val byWalk = a.groupBy(_._1)
    for ((_, rows) <- byWalk) {
      assert(rows.size == 7)
      val path = rows.toSeq.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { case Seq(x, y) => assert(sym.contains((x, y))) }
    }
  }

  test("isolated start stops at step 0") {
    val edges = Seq((1L, 2L)).toDF("a_id", "b_id")
    val got = GraphMetrics.randomWalks(edges, Seq(9L).toDF("id"), steps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((9L, 0L, 9L)))
  }

  test("double sweep on a path graph finds the exact diameter") {
    // path 1-2-3-4-5, start mid: ecc(3) = 2, farthest ties {1, 5} → 1,
    // ecc(1) = 4 = the true diameter
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a_id", "b_id")
    val r = GraphMetrics.doubleSweep(edges, startId = 3L).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
      == ((3L, 2L, 5L, 1L, 4L)))
  }

  test("double sweep is exact on trees and a valid lower bound on random graphs") {
    def refDists(edges: Seq[(Long, Long)], s: Long): Map[Long, Long] = {
      val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
      edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
      val dist = scala.collection.mutable.Map(s -> 0L)
      var frontier = Set(s)
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)).filterNot(dist.contains)
        frontier.foreach(dist(_) = d)
      }
      dist.toMap
    }
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 3) {
      val edges = Seq.fill(25)((rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val start = edges.head._1
        val comp = refDists(edges, start)
        val trueDiam = comp.keys.toSeq.map(v => refDists(edges, v).values.max).max
        val r = GraphMetrics.doubleSweep(edges.toDF("a_id", "b_id"), startId = start).head()
        assert(r.getLong(1) == comp.values.max) // ecc_start exact
        assert(r.getLong(2) == comp.size.toLong) // n_reached
        assert(r.getLong(4) <= trueDiam) // a LOWER bound…
        assert(r.getLong(4) >= comp.values.max) // …at least the first ecc
      }
    }
  }

  test("resource allocation weights rare shared neighbors above hubs") {
    // hub 0 — {1,2,3}; rare 9 — {1,2}. Pair (1,2) shares both: the rare
    // neighbor (deg 2) contributes 5e8, the hub (deg 3) only ~3.3e8.
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (9L, 1L), (9L, 2L))
    val got = GraphMetrics.linkResourceAllocation(
      edges.toDF("a_id", "b_id"), minCommon = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got((1L, 2L)) == ((2L, 1000000000L / 3 + 1000000000L / 2, false)))
    assert(got((1L, 3L)) == ((1L, 1000000000L / 3, false)))
    assert(got((0L, 9L)) == ((2L, 1000000000L / 2 * 2, false)))
    // an existing edge that also shares a neighbor is flagged, not dropped
    val withTri = edges :+ ((1L, 2L))
    val tri = GraphMetrics.linkResourceAllocation(
      withTri.toDF("a_id", "b_id"), minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(4)).toMap
    assert(tri((1L, 2L)))
  }

  test("temporal relay census: window strictness, u != w, earliest-first cap") {
    // through node 5: in (1, t=10); outs (2, t=12) inside (10, 15],
    // (3, t=20) outside, (1, t=11) excluded as u == w, (4, t=15) at the
    // inclusive boundary, (6, t=10) excluded by the strict lower bound
    val ev = Seq(
      (1L, 5L, 10L), (5L, 2L, 12L), (5L, 3L, 20L), (5L, 1L, 11L),
      (5L, 4L, 15L), (5L, 6L, 10L))
    val got = GraphMetrics.temporalRelayCount(ev.toDF("src", "dst", "t"), delta = 5L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(5L -> ((2L, 1L))))
    // cap = 1 keeps only the EARLIEST out event (t=10, peer 6) — no
    // relay survives, so the census is empty
    val capped = GraphMetrics.temporalRelayCount(
      ev.toDF("src", "dst", "t"), delta = 5L, maxEvents = 1)
      .collect()
    assert(capped.isEmpty)
  }
}

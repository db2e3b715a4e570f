package graft

import graft.ops.GraphMetrics

/** Modularity decomposition: hand-computed partitions + a driver-side
  * definition replay on random graphs (exact integer arithmetic via
  * BigInt, truncating division — the op's DECIMAL(38,0) contract).
  */
class ModularitySpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      edges: Seq[(Long, Long)], labels: Map[Long, Long]): Map[Long, (Long, Long, Long)] = {
    val es = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val m = BigInt(es.size)
    def c(x: Long) = labels.getOrElse(x, x)
    val deg = es.flatMap(e => Seq(c(e._1), c(e._2))).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val intl = es.filter(e => c(e._1) == c(e._2)).groupBy(e => c(e._1)).map { case (k, v) => k -> v.size.toLong }
    deg.map { case (comm, d) =>
      val in = intl.getOrElse(comm, 0L)
      val num = BigInt(1000000) * (4 * m * in - BigInt(d) * d)
      val den = 4 * m * m
      comm -> ((in, d, (num / den).toLong)) // BigInt '/' truncates toward zero
    }
  }

  test("two cliques joined by one bridge score near-maximal modularity") {
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) :+ ((3L, 10L))
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 0L), (10L, 1L), (11L, 1L), (12L, 1L))
    val got = GraphMetrics.modularity(
      edges.toDF("a_id", "b_id"), labels.toDF("id", "community"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // m = 7; each community: 3 internal edges, degree mass 7 →
    // q_c = 3/7 − (7/14)² = 3/7 − 1/4; ppm trunc = (1e6·(4·7·3 − 49)) div (4·49)
    assert(got == Map(0L -> ((3L, 7L, 178571L)), 1L -> ((3L, 7L, 178571L))))
  }

  test("unlabeled nodes fall back to singleton communities") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val labels = Seq((1L, 5L), (2L, 5L)).toDF("id", "community")
    val got = GraphMetrics.modularity(edges, labels)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // node 3 unlabeled → community 3 with 0 internal edges, degree 1:
    // q = −(1/4)² = −62500 ppm (truncation direction matters: div → 0-ward)
    assert(got(3L) == ((0L, 1L, -62500L)))
    assert(got(5L) == ((1L, 3L, (BigInt(1000000) * (4 * 2 * 1 - 9) / 16).toLong)))
  }

  test("matches the definition replay on random graphs and partitions") {
    val rnd = new scala.util.Random(37)
    for (trial <- 0 until 3) {
      val n = 16 + trial * 5
      val edges = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // random partition into ~4 blocks; leave ~a quarter unlabeled
      val labels = nodes.filter(_ => rnd.nextInt(4) > 0)
        .map(v => v -> rnd.nextInt(4).toLong).toMap
      val got = GraphMetrics.modularity(
        edges.toDF("a_id", "b_id"),
        labels.toSeq.toDF("id", "community"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == reference(edges, labels), s"trial $trial diverged from the definition")
    }
  }
}

package graft

import graft.ops.Coverage

/** Greedy max-coverage vs an in-memory sequential greedy. */
class CoverageSpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      pairs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long, Long)] = {
    val sets = pairs.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val covered = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var total = 0L
    var round = 0L
    var stop = false
    while (round < k && !stop) {
      round += 1
      val scored = sets.toSeq
        .map { case (id, s) => (id, (s -- covered).size.toLong) }
        .sortBy { case (id, g) => (-g, id) }
      // the operator never emits zero-gain picks: once everything
      // coverable is covered, the run ends early
      if (scored.isEmpty || scored.head._2 == 0L) stop = true
      else {
        val (id, g) = scored.head
        total += g
        out += ((round, id, g, total))
        covered ++= sets(id)
      }
    }
    out.toSeq
  }

  private def run(pairs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long, Long)] =
    Coverage.greedyMaxCoverage(pairs.toDF("doc_id", "token"), k)
      .orderBy("pick")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("hand case: the big-gain doc first, overlaps discounted, early stop at full coverage") {
    val pairs = Seq(
      (10L, "a"), (10L, "b"), (10L, "c"),       // 3 features
      (20L, "b"), (20L, "c"), (20L, "d"),       // gain 1 after 10
      (30L, "e"), (30L, "f"),                   // disjoint pair
      (40L, "e"), (40L, "f"))                   // identical to 30 → tie → 30
    // doc 40 would gain 0 → the run ends after 3 picks even with k = 4
    assert(run(pairs, 4) == Seq(
      (1L, 10L, 3L, 3L), (2L, 30L, 2L, 5L), (3L, 20L, 1L, 6L)))
  }

  test("agrees with the in-memory greedy on random doc-feature sets") {
    val rnd = new scala.util.Random(101)
    for (trial <- 0 until 3) {
      val pairs = Seq.fill(300)(
        (rnd.nextInt(25).toLong, s"f${rnd.nextInt(60)}"))
      assert(run(pairs, 8) == reference(pairs, 8), s"trial $trial")
    }
  }

  test("duplicate pairs are inert; reruns are identical") {
    val pairs = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"))
    val a = run(pairs, 3)
    assert(a == run(pairs ++ pairs, 3))
    assert(a.head == ((1L, 2L, 2L, 2L))) // doc 2 covers {x, y}
  }
}

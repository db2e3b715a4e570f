package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, GraphMetrics, Outliers}

/** Edit-distance near-dup, IQR outliers, triangle counting (round 3). */
class OutlierAndGraphSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------- edit distance

  test("editDistancePairs: finds small edits inside a block, never across blocks") {
    val docs = Seq(
      (1L, "b1", "the quick brown fox jumps over the lazy dog"),
      (2L, "b1", "the quick brown fox jumped over the lazy dog"), // 2 edits
      (3L, "b1", "completely different text with other words entirely here"),
      (4L, "b2", "the quick brown fox jumps over the lazy dog")   // = doc1, other block
    ).toDF("doc_id", "blk", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", Seq("blk"), prefixLen = 80, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq((1L, 2L, 2)))
  }

  test("editDistancePairs: distance matches a reference DP on random word soups") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(11)
    val words = Seq("spark", "data", "table", "row", "scan", "merge", "fast")
    def soup() = Seq.fill(8 + rnd.nextInt(5))(words(rnd.nextInt(words.size))).mkString(" ")
    val docs = (1L to 20L).map(i => (i, "b", soup())).toSeq
    val got = Dedup.editDistancePairs(docs.toDF("doc_id", "blk", "text"),
      "doc_id", "text", Seq("blk"), prefixLen = 60, maxDist = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val norm = docs.map { case (i, _, t) =>
      i -> t.trim.toLowerCase.replaceAll("\\s+", " ").take(60) }.toMap
    for (a <- 1L to 20L; b <- (a + 1) to 20L)
      if (math.abs(norm(a).length - norm(b).length) <= 100)
        assert(got((a, b)) == lev(norm(a), norm(b)), s"pair ($a,$b)")
  }

  // ---------------------------------------------------------- IQR outliers

  test("upperIqr flags exactly the values above Q3 + 1.5*IQR per group") {
    // g1: values 1..12 plus a 100 spike → q1=3, q3=9 (disc), fence 18
    val rows = ((1 to 12).map(v => ("g1", s"e$v", v.toLong)) :+ (("g1", "spike", 100L))) ++
      Seq(("g2", "a", 5L), ("g2", "b", 6L), ("g2", "c", 7L), ("g2", "d", 8L))
    val got = Outliers.upperIqr(rows.toDF("g", "entity", "n"), Seq("g"), "n")
      .select("g", "entity", "n").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq.sorted == Seq(("g1", "spike", 100L)))
  }

  test("upperIqr: constant groups produce no outliers (IQR = 0 fence holds)") {
    val rows = (1 to 50).map(i => ("g", s"e$i", 7L))
    assert(Outliers.upperIqr(rows.toDF("g", "entity", "n"), Seq("g"), "n").count() == 0L)
  }

  // ------------------------------------------------------------- triangles

  test("nodeTriangles counts a known graph exactly") {
    // K4 on {1,2,3,4}: 4 triangles, each node in 3; plus a pendant 5 and a
    // disconnected edge 6-7 (no triangles).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L)).toDF("a_id", "b_id")
    val got = GraphMetrics.nodeTriangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("nodeTriangles is direction/duplicate/self-loop insensitive") {
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 3L), (1L, 2L)).toDF("a_id", "b_id")
    val got = GraphMetrics.nodeTriangles(messy)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  // ------------------------------------------------------ label propagation

  test("labelPropagation: two cliques joined by a bridge edge converge to two communities") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4-10
    val cl = (for (s <- Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 11L, 12L, 13L));
                   a <- s; b <- s if a < b) yield (a, b)) :+ ((4L, 10L))
    val got = GraphMetrics.labelPropagation(cl.toDF("a_id", "b_id"), rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // each clique shares one label; the two labels differ
    assert(Seq(1L, 2L, 3L).map(got).distinct.size == 1)
    assert(Seq(11L, 12L, 13L).map(got).distinct.size == 1)
    assert(got(1L) != got(11L))
  }

  test("labelPropagation matches a reference synchronous implementation on random graphs") {
    val rnd = new scala.util.Random(23)
    val n = 40
    val edges = (for (a <- 0 until n; b <- (a + 1) until n if rnd.nextInt(6) == 0)
      yield (a.toLong, b.toLong)).toSeq
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def step(labels: Map[Long, Long]): Map[Long, Long] =
      adj.map { case (id, nbrs) =>
        val tally = nbrs.map(labels).groupBy(identity).map { case (l, o) => (l, o.size) }
        val best = tally.toSeq.minBy { case (l, c) => (-c, l) }._1
        id -> best
      }
    val expect = step(step(adj.keys.map(k => k -> k).toMap)).toSeq.sorted
    val got = GraphMetrics.labelPropagation(edges.toDF("a_id", "b_id"), rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == expect)
  }

  test("nodeTriangles agrees with brute force on random graphs") {
    val rnd = new scala.util.Random(5)
    val n = 30
    val edges = (for (a <- 0 until n; b <- (a + 1) until n if rnd.nextInt(5) == 0)
      yield (a.toLong, b.toLong)).toSeq
    val es = edges.toSet
    def has(a: Long, b: Long) = es.contains((a min b, a max b))
    val expect = (for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong; c <- (b + 1) until n.toLong
      if has(a, b) && has(b, c) && has(a, c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSeq.sorted
    val got = GraphMetrics.nodeTriangles(edges.toDF("a_id", "b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == expect)
  }

  test("madOutliers: exact lower medians; fence flags only genuine spikes") {
    val df = Seq(8L, 9L, 10L, 10L, 11L, 12L, 100L)
      .zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val got = graft.ops.Outliers.madOutliers(df, Seq("grp"), "v", k = 3L)
      .select("id", "med", "mad", "is_outlier")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // sorted: 8,9,10,10,11,12,100 (n=7) -> lower median 10
    // devs sorted: 0,0,1,1,2,2,90        -> lower median of devs = 1
    assert(got.values.forall { case (med, mad, _) => med == 10L && mad == 1L })
    assert(got(6L)._3, "the 100 spike must flag")
    assert(got.filter(_._1 != 6L).values.forall(!_._3), "inliers must not flag")
  }
}

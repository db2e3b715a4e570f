package graft

import org.apache.spark.sql.functions._
import graft.ops.{FuzzyJoin, Metrics, Sampling, Transitions}

/** Round-3 additions: equi-depth histogram, corpus-mixing schedule,
  * sorted-neighborhood blocking, top session paths.
  */
class MixAndBlockingSpec extends SparkSpec {
  import spark.implicits._

  test("equiDepth buckets are near-equal, ordered, and cover every row") {
    val rnd = new scala.util.Random(5)
    val rows = for (g <- 0 until 3; i <- 0 until 107)
      yield (s"g$g", rnd.nextInt(40).toLong, i.toLong)
    val got = Metrics.equiDepth(rows.toDF("g", "v", "id"), Seq("g"), "v",
      Seq(col("id")), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    rows.groupBy(_._1).foreach { case (g, pts) =>
      val buckets = (1L to 10L).map(got(g, _))
      assert(buckets.map(_._3).sum == pts.size)
      // ntile: first (n mod k) buckets get the extra row
      assert(buckets.map(_._3).max - buckets.map(_._3).min <= 1)
      assert(buckets.head._3 >= buckets.last._3)
      // boundaries never run backwards across buckets
      buckets.sliding(2).foreach { case Seq((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 <= lo2)
      }
      buckets.foreach { case (lo, hi, _) => assert(lo <= hi) }
    }
  }

  test("mixSchedule positions are exact md5-derived strides, stable under edits") {
    def u40(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(10)
      java.lang.Long.parseLong(hex, 16)
    }
    val rows = (1L to 400L).map(i => (i, if (i % 2 == 0) "fast" else "slow"))
    val strides = Map("fast" -> 1L, "slow" -> 2L)
    val got = Sampling.mixSchedule(rows.toDF("id", "src"), "src", "id", strides)
      .select("id", "mix_pos").as[(Long, Long)].collect().toMap
    rows.foreach { case (i, s0) => assert(got(i) == u40(i) * strides(s0)) }
    // removing half the corpus moves nobody else
    val subset = Sampling.mixSchedule(rows.filter(_._1 <= 200).toDF("id", "src"),
      "src", "id", strides).select("id", "mix_pos").as[(Long, Long)].collect().toMap
    subset.foreach { case (i, p) => assert(got(i) == p) }
    // stride-1 source is ~2x as dense in any position prefix
    val cutoff = got.values.toSeq.sorted.apply(got.size / 2)
    val inPrefix = rows.filter { case (i, _) => got(i) <= cutoff }
    val fast = inPrefix.count(_._2 == "fast").toDouble
    val slow = inPrefix.count(_._2 == "slow").toDouble
    assert(fast / slow > 1.4 && fast / slow < 2.8, s"fast=$fast slow=$slow")
    // unlisted source is dropped
    val extra = Sampling.mixSchedule(
      (rows :+ (999L, "unknown")).toDF("id", "src"), "src", "id", strides)
    assert(extra.where(col("src") === "unknown").isEmpty)
  }

  test("sortedNeighborhood emits exactly the rank-adjacent pairs per block") {
    val rows = Seq(
      (1L, "anna", "x"), (2L, "annb", "x"), (3L, "annz", "x"), (4L, "azzz", "x"),
      (5L, "bob", "y"), (6L, "bobb", "y"))
    val got = FuzzyJoin.sortedNeighborhood(
      rows.toDF("id", "nm", "blk"), "id", "nm", col("blk"), w = 2)
      .select("a_id", "b_id", "rank_gap", "dist")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expect = Set(
      (1L, 2L, 1L, 1L), (1L, 3L, 2L, 1L), (2L, 3L, 1L, 1L), (2L, 4L, 2L, 3L),
      (3L, 4L, 1L, 2L), (5L, 6L, 1L, 1L))
    assert(got == expect)
  }

  test("topPaths counts ordered prefixes across keys") {
    val rows = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "c"),
      ("u2", 1L, "a"), ("u2", 2L, "b"), ("u2", 3L, "c"), ("u2", 4L, "d"),
      ("u3", 5L, "a"), ("u3", 6L, "b"))
    val got = Transitions.topPaths(rows.toDF("k", "t", "s"), "k", "s",
      Seq(col("t")), maxSteps = 3)
      .as[(String, Long)].collect().toMap
    // u2's 4th event is beyond the horizon → same path as u1
    assert(got == Map("a->b->c" -> 2L, "a->b" -> 1L))
  }
}

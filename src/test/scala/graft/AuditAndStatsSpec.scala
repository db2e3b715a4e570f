package graft

import org.apache.spark.sql.functions._
import graft.ops.{Audit, Metrics, Outliers, Skyline}

/** Round-3 additions: data-quality audit, replication checksum, weighted
  * median, CUSUM changepoint, sufficient statistics, 2-D skyline.
  */
class AuditAndStatsSpec extends SparkSpec {
  import spark.implicits._

  test("constraints counts nulls, duplicate surplus and range violations in one pass") {
    val df = Seq(
      (Some(1L), Some("a"), 50L),
      (Some(2L), None, 500L),       // null name, range violation (>100)
      (Some(2L), Some("c"), -1L),   // dup id, range violation (<0)
      (None, Some("d"), 7L)         // null id
    ).toDF("id", "name", "v")
    val got = Audit.constraints(df,
      notNullCols = Seq("id", "name"),
      uniqueCols = Seq("id"),
      ranges = Seq(("v", col("v"), 0L, 100L)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(("not_null", "id")) == ((1L, 4L, false)))
    assert(got(("not_null", "name")) == ((1L, 4L, false)))
    // surplus over NON-NULL rows: count(id)=3, distinct {1,2}=2 → 1;
    // the NULL id row is the not_null check's business, not unique's
    assert(got(("unique", "id")) == ((1L, 4L, false)))
    assert(got(("range", "v")) == ((2L, 4L, false)))
  }

  test("constraints passes on clean data") {
    val df = Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("id", "name", "v")
    val got = Audit.constraints(df, Seq("id"), Seq("id"), Seq(("v", col("v"), 0L, 10L)))
    assert(got.collect().forall(_.getBoolean(4)))
  }

  test("groupChecksum is order- and partitioning-invariant, and content-sensitive") {
    val rows = (1L to 200L).map(i => (s"g${i % 3}", i, s"payload$i"))
    val a = Audit.groupChecksum(rows.toDF("g", "id", "s").repartition(7),
      Seq("g"), Seq("id", "s"))
    val b = Audit.groupChecksum(scala.util.Random.shuffle(rows).toDF("g", "id", "s")
      .repartition(2), Seq("g"), Seq("id", "s"))
    assert(a.orderBy("g").collect().toSeq == b.orderBy("g").collect().toSeq)
    // a single changed row flips both sum and xor for its group only
    val mutated = rows.map { case (g, i, s0) => (g, i, if (i == 5L) "X" else s0) }
    val c = Audit.groupChecksum(mutated.toDF("g", "id", "s"), Seq("g"), Seq("id", "s"))
      .orderBy("g").collect()
    val orig = a.orderBy("g").collect()
    val changed = orig.zip(c).filter { case (x, y) => x.getLong(2) != y.getLong(2) }
    assert(changed.length == 1 && changed.head._1.getString(0) == "g2")
    assert(orig.zip(c).count { case (x, y) => x.getLong(3) != y.getLong(3) } == 1)
  }

  test("weightedMedian matches the brute-force definition") {
    val rnd = new scala.util.Random(7)
    val rows = for (g <- 0 until 5; _ <- 0 until 40)
      yield (s"g$g", rnd.nextInt(50).toLong, 1L + rnd.nextInt(9))
    val got = Metrics.weightedMedian(rows.toDF("g", "v", "w"), Seq("g"), "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._1).foreach { case (g, pts) =>
      val tot = pts.map(_._3).sum
      val cum = pts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
        .scanLeft((Long.MinValue, 0L)) { case ((_, c), (v, w)) => (v, c + w) }.drop(1)
      val expect = cum.find { case (_, c) => 2 * c >= tot }.get._1
      assert(got(g) == ((expect, tot)), g)
    }
  }

  test("cusum finds the obvious level shift and matches brute force") {
    // key A: flat 10 for 30 points then flat 50 for 30 → peak at the shift
    val a = (1 to 30).map(i => ("A", i.toLong, 10L)) ++
      (31 to 60).map(i => ("A", i.toLong, 50L))
    val rnd = new scala.util.Random(13)
    val b = (1 to 50).map(i => ("B", i.toLong, rnd.nextInt(100).toLong))
    val df = (a ++ b).toDF("k", "t", "v")
    val got = Outliers.cusum(df, Seq("k"), Seq(col("t")), "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def brute(pts: Seq[(String, Long, Long)]): (Long, Long, Long) = {
      val xs = pts.sortBy(_._2).map(_._3)
      val n = xs.size.toLong
      val tot = xs.sum
      val scores = xs.scanLeft(0L)(_ + _).drop(1).zipWithIndex.map {
        case (cum, i) => math.abs(n * cum - (i + 1) * tot)
      }
      val mx = scores.max
      (n, mx, scores.indexOf(mx) + 1L)
    }
    assert(got("A") == brute(a))
    assert(got("A")._3 == 30L) // the changepoint
    assert(got("B") == brute(b))
  }

  test("suffStats reproduces exact moments") {
    val rnd = new scala.util.Random(3)
    val rows = for (g <- 0 until 4; _ <- 0 until 30)
      yield (s"g$g", rnd.nextInt(100).toLong, (rnd.nextInt(2000) - 1000).toLong)
    val got = Metrics.suffStats(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    rows.groupBy(_._1).foreach { case (g, pts) =>
      val e = (pts.size.toLong, pts.map(_._2).sum, pts.map(_._3).sum,
        pts.map(p => p._2 * p._2).sum, pts.map(p => p._2 * p._3).sum,
        pts.map(p => p._3 * p._3).sum)
      assert(got(g) == e, g)
    }
  }

  test("skyline matches brute-force domination on random points, any bucket count") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    def dominated(p: (Long, Long, Long)): Boolean = pts.exists(q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    val expect = pts.filterNot(dominated).map(_._1).toSet
    for (buckets <- Seq(1, 8, 32)) {
      val got = Skyline.frontier2d(pts.toDF("id", "x", "y"), "x", "y", buckets)
        .select("id").as[Long].collect().toSet
      assert(got == expect, s"buckets=$buckets")
    }
  }

  test("skyline keeps coincident frontier points") {
    val df = Seq((1L, 5L, 9L), (2L, 5L, 9L), (3L, 6L, 9L), (4L, 4L, 1L))
      .toDF("id", "x", "y")
    val got = Skyline.frontier2d(df, "x", "y").select("id").as[Long].collect().toSet
    // (5,9) twice: neither dominates the other; (6,9) dominated by (5,9);
    // (4,1): cheapest x → on frontier
    assert(got == Set(1L, 2L, 4L))
  }

  test("suffStatsMatrix: one pass, exact pair sums in long form") {
    val df = Seq((1L, 2L, 3L), (4L, 5L, 6L), (7L, 8L, 10L)).toDF("a", "b", "c")
    val got = Metrics.suffStatsMatrix(df,
        Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // a=(1,4,7) b=(2,5,8): n=3, sums 12/15, xx=66, xy=78, yy=93
    assert(got(("a", "b")) == ((3L, 12L, 15L, 66L, 78L, 93L)))
    // a vs c=(3,6,10): xy = 3+24+70 = 97, yy = 9+36+100 = 145
    assert(got(("a", "c")) == ((3L, 12L, 19L, 66L, 97L, 145L)))
    assert(got(("b", "c")) == ((3L, 15L, 19L, 93L, 116L, 145L)))
  }

  test("benford: counts by leading digit, zero-filled, non-positives excluded") {
    // values: 1x leading-1 (123), 2x leading-2 (2, 250), 1x leading-9; 0 and -5 dropped
    val vals = Seq(123L, 2L, 250L, 9000L, 0L, -5L)
    val got = Audit.benford(vals.toDF("v"), "v")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == (1L to 9L).toSet)
    assert(got(1L)._1 == 1L && got(2L)._1 == 2L && got(9L)._1 == 1L && got(3L)._1 == 0L)
    assert(got(2L)._3 == 1000000L * 2 / 4) // share_ppm over the 4 positive rows
    // constants: Audit.BenfordPpm in digit order, dev = share - benford
    got.foreach { case (d, (_, bp, sp, dev)) =>
      assert(bp == Audit.BenfordPpm(d.toInt - 1))
      assert(dev == sp - bp)
    }
  }

  test("benford: a genuinely Benford-ish series (powers of 2) skews low digits high") {
    val vals = (0 until 60).map(i => BigInt(2).pow(i).toLong % 1000000007L).filter(_ > 0)
    val got = Audit.benford(vals.toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // leading digit 1 should carry the largest share (classic 2^n behavior)
    assert(got(1L) == got.values.max)
  }
}

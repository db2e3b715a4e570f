package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextFunctions
import graft.functions.expressions.StringKernels
import graft.ops.{Audit, Cohort, Eval, GeoGrid, Lexical, Metrics, Outliers, TimeSeries, Trend}

/** Round-8 operators: string-linkage kernels, grid radius join,
  * Wasserstein drift, Theil–Sen, t-closeness, readability.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def dl(a: String, b: String): Int =
    StringKernels.damerauLevenshtein(UTF8String.fromString(a), UTF8String.fromString(b))

  test("damerau: unrestricted variant — transposition survives intervening edits") {
    assert(dl("ca", "abc") == 2) // OSA says 3; full DL says 2 (as DuckDB does)
    assert(dl("ab", "ba") == 1)
    assert(dl("", "abc") == 3 && dl("abc", "") == 3 && dl("", "") == 0)
    assert(dl("abc", "abc") == 0)
    assert(dl("kitten", "sitting") == 3) // no transpositions → plain levenshtein
    assert(dl("Customer#000000012", "Customer#000000021") == 1) // digit swap costs 1
  }

  test("damerau: agrees with independent BFS over the edit-operation graph") {
    // BFS from each source applying single edit ops (insert/delete/
    // substitute/adjacent-transpose over {a,b,c}) — an implementation
    // sharing NOTHING with the DP. Universe capped at length 5 so the
    // frontier stays finite; distances beyond the cap are only
    // lower-bounded.
    val alphabet = "abc"
    val strings = (0 to 3).flatMap(n =>
      (0 until math.pow(3, n).toInt).map(i =>
        (0 until n).map(k => alphabet(i / math.pow(3, k).toInt % 3)).mkString))
    def neighbors(s: String): Seq[String] = {
      val subs = for (i <- s.indices; c <- alphabet if c != s(i)) yield s.updated(i, c)
      val dels = s.indices.map(i => s.take(i) + s.drop(i + 1))
      val inss = if (s.length >= 5) Seq() else
        for (i <- 0 to s.length; c <- alphabet) yield s.take(i) + c + s.drop(i)
      val swaps = (0 until s.length - 1).filter(i => s(i) != s(i + 1))
        .map(i => s.take(i) + s(i + 1) + s(i) + s.drop(i + 2))
      subs ++ dels ++ inss ++ swaps
    }
    for (src <- strings) {
      val dist = scala.collection.mutable.Map(src -> 0)
      var frontier = List(src)
      var d = 0
      while (frontier.nonEmpty && d < 4) {
        d += 1
        frontier = frontier.flatMap(neighbors).distinct.filterNot(dist.contains)
        frontier.foreach(s => dist(s) = d)
      }
      for (dst <- strings) dist.get(dst) match {
        case Some(bfs) => assert(dl(src, dst) == bfs, s"$src -> $dst")
        case None      => assert(dl(src, dst) >= 4, s"$src -> $dst")
      }
    }
  }

  test("damerau: metric properties hold on random strings") {
    def lev(a: String, b: String): Int = { // independent plain-DP reference
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(88)
    def rs(): String = (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 0 until 800) {
      val (a, b, c) = (rs(), rs(), rs())
      val (ab, ba, ac, bc) = (dl(a, b), dl(b, a), dl(a, c), dl(b, c))
      assert(ab == ba, s"symmetry $a/$b")
      assert(ab <= lev(a, b), s"DL must not exceed Levenshtein: $a/$b")
      assert(ab >= math.abs(a.length - b.length), s"length lower bound $a/$b")
      assert(ab <= math.max(a.length, b.length), s"upper bound $a/$b")
      assert(ac <= ab + bc, s"triangle $a/$b/$c")
      assert(dl(a, a) == 0)
    }
  }

  test("jaroWinkler: range, symmetry, and 1.0 exactly on equality (random strings)") {
    def jw(a: String, b: String): Double =
      StringKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
    val rnd = new scala.util.Random(31)
    def rs(): String = (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    for (_ <- 0 until 800) {
      val (a, b) = (rs(), rs())
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range $a/$b -> $s")
      assert(s == jw(b, a), s"symmetry $a/$b")
      assert((s == 1.0) == (a == b), s"identity $a/$b -> $s")
    }
  }

  test("jaroWinkler: reference values, boost gating, and degenerate inputs") {
    def jw(a: String, b: String): Double =
      StringKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("crate", "trace") == 0.7333333333333334)
    // jaro 0.6 ≤ 0.7 → NO prefix boost despite the 4-char common prefix
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "x") == 0.0 && jw("x", "") == 0.0)
    assert(jw("a", "b") == 0.0)
  }

  test("string kernels ride Column expressions inside codegen") {
    val df = Seq(("ca", "abc"), ("martha", "marhta")).toDF("a", "b")
      .select(TextFunctions.damerau(col("a"), col("b")).as("d"),
        TextFunctions.jaroWinkler(col("a"), col("b")).as("j"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 2 && rows(1).getDouble(1) == 0.9611111111111111)
  }

  test("grid radius join equals the quadratic reference on random points") {
    val rnd = new scala.util.Random(8)
    val pts = (0L until 400L).map(i => (i, rnd.nextInt(5000).toLong, rnd.nextInt(5000).toLong))
    val r = 400L
    val expected = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).sorted
    val got = GeoGrid.radiusPairs(pts.toDF("id", "x", "y"), "id", col("x"), col("y"), r)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(expected.nonEmpty && got == expected)
  }

  test("grid radius join: negative coordinates land on the correct cells") {
    val pts = Seq((1L, -3L, -3L), (2L, 3L, 3L), (3L, -90L, 40L)).toDF("id", "x", "y")
    val got = GeoGrid.radiusPairs(pts, "id", col("x"), col("y"), radius = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 72L))) // straddles the origin across 4 cells
  }

  test("wasserstein drift reproduces the hand-computed earth-mover distance") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 4L)).toDF("g", "v")
    val r = Metrics.wassersteinDrift(df, "g", col("v"), "a", "b").head()
    // W1({1,2}, {2,4}) = 1.5; cross-multiplied num = 6 over n_a·n_b = 4
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("emd_num") == 6 && r.getAs[Long]("w1_milli") == 1500L)
  }

  test("wasserstein drift is zero iff the distributions coincide") {
    val same = Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    assert(Metrics.wassersteinDrift(same, "g", col("v"), "a", "b")
      .head().getAs[Long]("emd_num") == 0L)
  }

  test("theil-sen shrugs off the outlier least-squares chases") {
    val clean = (1L to 9L).map(x => ("u", x * 1000000L, 2 * x))
    val rows = clean :+ (("u", 10000000L, 100000L)) // one wild point
    val df = rows.toDF("g", "x", "y")
    val ts = Trend.theilSen(df, Seq("g"), col("x"), col("y"), scale = 1000000L).head()
    assert(ts.getAs[Long]("n_pairs") == 45)
    // pairwise slope of the clean points: 2 per 1e6 x-units → scaled 2
    assert(ts.getAs[Long]("slope_scaled") == 2L)
    val ls = Trend.linear(df, Seq("g"), col("x"), col("y")).head()
    val lsSlope = ls.getAs[Long]("slope_num").toDouble / ls.getAs[Long]("slope_den")
    assert(lsSlope * 1000000L > 100) // least squares dragged far off 2
  }

  test("theil-sen lower median is deterministic on even pair counts") {
    // 3 x-distinct points → 3 pairs (odd); 4 points → 6 pairs, rank 3
    val df = Seq(("g", 0L, 0L), ("g", 1L, 0L), ("g", 2L, 4L), ("g", 3L, 3L)).toDF("g", "x", "y")
    val r = Trend.theilSen(df, Seq("g"), col("x"), col("y"), scale = 1L).head()
    // slopes: (0,1)=0 (1,2)=4 (2,3)=-1 (0,2)=2 (1,3)=1 (0,3)=1 → sorted
    // [-1,0,1,1,2,4], lower median (rank 3) = 1
    assert(r.getAs[Long]("n_pairs") == 6 && r.getAs[Long]("slope_scaled") == 1L)
  }

  test("t-closeness: skewed class scores the hand-computed EMD, balanced class zero") {
    val df = Seq(
      ("X", 0L), ("X", 0L), ("Y", 1L), ("Y", 1L), // X all-low, Y all-high
      ("Z", 0L), ("Z", 1L)) // Z mirrors the global mix
      .toDF("q", "s")
    val r = Audit.tCloseness(df, Seq("q"), col("s"))
      .collect().map(x => x.getAs[String]("q") -> x).toMap
    // global: bucket0=3, bucket1=3, N=6, m=2
    // X (n=2): gap@0 = |6·2 − 2·3| = 6 → t = 6/(1·6·2) = 0.5
    assert(r("X").getAs[Long]("t_num") == 6 && r("X").getAs[Long]("t_ppm") == 500000L)
    assert(r("Y").getAs[Long]("t_num") == 6 && r("Y").getAs[Long]("t_ppm") == 500000L)
    assert(r("Z").getAs[Long]("t_num") == 0 && r("Z").getAs[Long]("t_ppm") == 0L)
    assert(r("X").getAs[Long]("m_buckets") == 2)
  }

  test("peaks: strict local maxima only; plateaus and boundaries behave") {
    // series: 1 5 5 3 9 2 → strict peaks at 9 (idx 5); the 5-5 plateau is
    // peak-free; the boundary 1 is not a peak (5 follows); trailing 2 not
    // (9 precedes within w)
    val rows = Seq(1L, 5L, 5L, 3L, 9L, 2L).zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
    val got = TimeSeries.peaks(rows.toDF("k", "i", "v"), "k", Seq(col("i")), "i", col("v"), w = 2)
      .select("i", "value", "n_before", "n_after")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((4L, 9L, 2L, 1L)))
    // single-row key: vacuously a peak with empty neighborhoods
    val one = TimeSeries.peaks(Seq(("s", 0L, 7L)).toDF("k", "i", "v"),
      "k", Seq(col("i")), "i", col("v"), w = 3).head()
    assert(one.getAs[Long]("value") == 7L && one.getAs[Long]("n_before") == 0L)
  }

  test("hazard table reproduces hand-computed risk sets and hazards") {
    // durations: 2(event) 2(censored) 3(event) 5(event) 5(censored)
    val df = Seq((2L, true), (2L, false), (3L, true), (5L, true), (5L, false))
      .toDF("dur", "ev")
    val got = TimeSeries.hazardTable(df, col("dur"), col("ev"))
      .select("t", "n_risk", "d", "hazard_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // t=2: risk 5, d 1 → 200000; t=3: risk 3, d 1 → 333333; t=5: risk 2, d 1 → 500000
    assert(got == Seq((2L, 5L, 1L, 200000L), (3L, 3L, 1L, 333333L), (5L, 2L, 1L, 500000L)))
  }

  test("cuped: zero-covariate noise leaves the raw effect; correlated covariate shrinks it") {
    // y = x + arm-effect: with X fully explaining the variance, theta = 1
    // and the cuped effect isolates the true +10 arm lift exactly
    // arm pairs share the covariate (cov(X, arm) = 0 exactly), so the
    // integer suff-stats give theta = 1 with no float slack
    val units = (0 until 40).map { i =>
      val x = (i / 2 * 7 % 23).toLong
      (i.toLong, i % 2 == 1, x, x + (if (i % 2 == 1) 10L else 0L))
    }
    val r = Eval.cuped(units.toDF("u", "t", "x", "y"), col("t"), col("x"), col("y")).head()
    assert(r.getAs[Long]("n_t") == 20 && r.getAs[Long]("n_c") == 20)
    assert(r.getAs[Long]("theta_micro") == 1000000L)
    assert(r.getAs[Long]("effect_cuped_micro") == 10000000L)
  }

  test("mahalanobis: correlation violators outscore on-axis extremes") {
    // x ≈ y line, plus one point far OFF the line and one far ALONG it:
    // the off-line point must dominate even though the along-line point
    // is more extreme on both axes.
    val onLine = (1L to 20L).map(i => (i, i, i + (i % 3) - 1))
    val rows = onLine :+ ((21L, 10L, 30L)) :+ ((22L, 40L, 41L))
    val d = Outliers.mahalanobis2d(rows.toDF("id", "x", "y"), "id", col("x"), col("y"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("d2_milli")).toMap
    assert(d(21L) > d(22L), s"off-line ${d(21L)} must beat along-line ${d(22L)}")
    assert(d(21L) > onLine.map(p => d(p._1)).max)
    // d² of the bulk stays small (χ²₂ median ≈ 1.39)
    assert(onLine.map(p => d(p._1)).count(_ < 3000) >= 15)
  }

  test("activity heatmap: engine-neutral dow/hour math and ppm shares") {
    val df = Seq(
      ("a", "2026-08-14 10:30:00"), // Friday → dow 5, hour 10
      ("a", "2026-08-14 10:59:59"),
      ("a", "2026-08-16 00:01:00"), // Sunday → dow 0, hour 0
      ("b", "2026-08-13 23:00:00")) // Thursday → dow 4, hour 23
      .toDF("g", "s").withColumn("ts", to_timestamp(col("s")))
    val got = TimeSeries.activityProfile(df, "g", "ts")
      .select("g", "dow", "hour", "n", "share_ppm")
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(
      ("a", 0L, 0L, 1L, 333333L),
      ("a", 5L, 10L, 2L, 666666L),
      ("b", 4L, 23L, 1L, 1000000L)))
  }

  test("rolling median smooths a spike and honors ramp-up frames") {
    val vals = Seq(5L, 1L, 9L, 4L, 7L, 2L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "i", "v")
    val got = TimeSeries.rollingMedian(df, "k", Seq(col("i")), "i", col("v"), w = 2)
      .select("i", "med", "n_win").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // frames: [5] [5,1] [5,1,9] [1,9,4] [9,4,7] [4,7,2] → lower medians
    assert(got == Seq((0L, 5L, 1L), (1L, 1L, 2L), (2L, 5L, 3L),
      (3L, 4L, 3L), (4L, 7L, 3L), (5L, 4L, 3L)))
  }

  test("max concurrency: sweep line nets same-instant handoffs (half-open)") {
    // k: [0,10) [5,15) [10,20) → peak 2 (the [0,10)→[10,20) handoff at 10
    // must NOT count 3); solo key peaks at 1
    val df = Seq(("k", 0L, 10L), ("k", 5L, 15L), ("k", 10L, 20L), ("s", 3L, 4L))
      .toDF("g", "st", "en")
    val got = TimeSeries.maxConcurrency(df, "g", col("st"), col("en"))
      .select("g", "max_concurrent", "n_intervals")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(("k", 2L, 3L), ("s", 1L, 1L)))
  }

  test("hapax: type/token bookkeeping on a known corpus") {
    val df = Seq(("en", "a a b c"), ("en", "b d"), ("fr", "x x x")).toDF("lang", "text")
    val got = Lexical.hapax(df).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_hapax"), r.getAs[Long]("hapax_ppm"))).toMap
    // en: types {a,b,c,d}, tokens 6, hapax {c,d}
    assert(got("en") == ((4L, 6L, 2L, 500000L)))
    assert(got("fr") == ((1L, 3L, 0L, 0L)))
  }

  test("burstiness: metronome scores -1, mixed gaps land in between") {
    val metro = (0 to 5).map(i => ("m", i * 60L))
    val bursty = Seq(("b", 0L), ("b", 1L), ("b", 2L), ("b", 300L), ("b", 301L))
    val df = (metro ++ bursty).map { case (k, s) => (k, s * 1000L) }
      .toDF("k", "ms").withColumn("ts", timestamp_millis(col("ms")))
      .withColumn("event_id", col("ms"))
    val got = TimeSeries.burstiness(df, "k", "ts", Seq("event_id")).collect()
      .map(r => r.getAs[String]("k") -> r).toMap
    assert(got("m").getAs[Long]("b_micro") == -1000000L) // sd = 0 → exactly −1
    val b = got("b").getAs[Long]("b_micro")
    assert(b > -1000000L && b < 1000000L && got("b").getAs[Long]("n_gaps") == 4L)
    // all-zero gaps → null B
    val z = TimeSeries.burstiness(
      Seq(("z", 0L), ("z", 0L)).toDF("k", "ms")
        .withColumn("ts", timestamp_millis(col("ms"))).withColumn("event_id", monotonically_increasing_id()),
      "k", "ts", Seq("event_id")).head()
    assert(z.isNullAt(z.fieldIndex("b_micro")))
  }

  test("seasonal index: flat cells read 1e6, a 2x cell reads 2x minus its dilution") {
    // two cells with equal counts: values 100 vs 300 → means 100/300,
    // group mean 200 → indices 500000 and 1500000
    val df = Seq(("g", 1L, 100L), ("g", 1L, 100L), ("g", 2L, 300L), ("g", 2L, 300L))
      .toDF("g", "cell", "cents")
    val got = TimeSeries.seasonalIndex(df, "g", col("cell"), col("cents"))
      .select("season", "index_ppm").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 500000L), (2L, 1500000L)))
  }

  test("qq table picks exact lower quantiles and their gaps") {
    // a = 0,10,…,100 (n=11): lower p-quantile = element at (p·10)/100+1
    // b = a + 7 → constant gap −7 at every level
    val rows = (0 to 10).flatMap(i => Seq(("a", i * 10L), ("b", i * 10L + 7L)))
    val got = Metrics.qqTable(rows.toDF("g", "v"), "g", col("v"), "a", "b",
      levels = Seq(0, 25, 50, 100))
      .select("p", "q_a", "q_b", "gap").as[(Int, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((0, 0L, 7L, -7L), (25, 20L, 27L, -7L),
      (50, 50L, 57L, -7L), (100, 100L, 107L, -7L)))
  }

  test("l-moments: uniform {1,2,3,4} gives known λ2 and symmetric t3 = 0") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L)).toDF("g", "v")
    val r = Metrics.lMoments(df, Seq("g"), col("v")).head()
    assert(r.getAs[Long]("p0") == 10 && r.getAs[Long]("p1") == 20 && r.getAs[Long]("p2") == 15)
    assert(r.getAs[Long]("l2_num") == 10) // λ2 = 10/(4·3) = 5/6
    assert(r.getAs[Long]("l3_num") == 0) // symmetric → L-skew 0
    assert(r.getAs[Long]("t2_ppm") == 333333L && r.getAs[Long]("t3_ppm") == 0L)
  }

  test("state trigrams slide over every position, prefix-free") {
    val df = Seq(("k", 1L, "a"), ("k", 2L, "b"), ("k", 3L, "a"), ("k", 4L, "b"),
      ("j", 1L, "x"), ("j", 2L, "y")) // j too short for any trigram
      .toDF("k", "o", "s")
    val got = graft.ops.Transitions.ngrams(df, "k", "s", Seq(col("o")), k = 3)
      .select("s1", "s2", "s3", "n", "share_ppm")
      .as[(String, String, String, Long, Long)].collect().sorted.toSeq
    assert(got == Seq(("a", "b", "a", 1L, 500000L), ("b", "a", "b", 1L, 500000L)))
  }

  test("vocab jaccard: exact set algebra over group vocabularies") {
    val df = Seq(("s1", "a b c"), ("s1", "c d"), ("s2", "c d e"), ("s3", "z")).toDF("source", "text")
    val got = Lexical.vocabJaccard(df)
      .select("g_a", "g_b", "n_a", "n_b", "n_common", "jaccard_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().sorted.toSeq
    // s1 = {a,b,c,d}, s2 = {c,d,e} → ∩ 2, ∪ 5 → 400000; s3 disjoint → no row
    assert(got == Seq(("s1", "s2", 4L, 3L, 2L, 400000L)))
  }

  test("moment stats: symmetric data has zero skew, uniform kurtosis is platykurtic") {
    val df = (1L to 9L).map(v => ("g", v)).toDF("g", "v")
    val r = Metrics.momentStats(df, Seq("g"), col("v")).head()
    assert(r.getAs[Long]("s1") == 45 && r.getAs[Long]("s2") == 285)
    assert(r.getAs[Long]("mean_milli") == 5000L)
    // discrete uniform 1..9: m2 = 20/3 ≈ 6.667, m3 = 0, kurtosis ≈ 1.77 → ex −1.23
    assert(r.getAs[Long]("var_milli") == 6666L)
    assert(r.getAs[Long]("skew_milli") == 0L)
    assert(r.getAs[Long]("kurt_milli") < -1000L && r.getAs[Long]("kurt_milli") > -1300L)
  }

  test("value gini: equality scores 0, total concentration scores (n-1)/n") {
    val eq = Seq(("e", 5L), ("e", 5L), ("e", 5L), ("e", 5L)).toDF("g", "v")
    assert(Metrics.valueGini(eq, Seq("g"), col("v")).head().getAs[Long]("gini_ppm") == 0L)
    val conc = Seq(("c", 0L), ("c", 0L), ("c", 0L), ("c", 100L)).toDF("g", "v")
    // one owner of everything among 4 → G = (n−1)/n = 0.75
    assert(Metrics.valueGini(conc, Seq("g"), col("v")).head().getAs[Long]("gini_ppm") == 750000L)
  }

  test("lorenz deciles: cumulative shares are monotone and end at 1e6") {
    val rows = (1L to 40L).map(v => ("g", v * v)) // convex → strictly below diagonal
    val got = Metrics.lorenzDeciles(rows.toDF("g", "v"), Seq("g"), col("v"))
      .select("bucket", "n_rows", "cum_value_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == (0L to 9L) && got.forall(_._2 == 4L))
    assert(got.last._3 == 1000000L)
    assert(got.map(_._3) == got.map(_._3).sorted)
    // bottom decile of squares carries far less than 10%
    assert(got.head._3 < 20000L)
  }

  test("rank movers: climb and fall read off the two period rankings") {
    val df = (Seq.fill(5)(("p1", "a")) ++ Seq.fill(3)(("p1", "b")) ++ Seq.fill(1)(("p1", "c")) ++
      Seq.fill(1)(("p2", "a")) ++ Seq.fill(3)(("p2", "b")) ++ Seq.fill(5)(("p2", "c")))
      .toDF("p", "item")
    val got = Trend.rankMovers(df, "item", col("p"), "p1", "p2")
      .select("item", "rank_a", "rank_b", "rank_delta")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L, 3L, -2L), ("b", 2L, 2L, 0L), ("c", 3L, 1L, 2L)))
  }

  test("daily autocorrelation: a perfect weekly pulse correlates to +1") {
    // counts repeat with period 7 → lag-7 pairs are identical series
    val rows = for (d <- 0 until 28; k <- 0 until (d % 7 + 1)) yield ("g", d.toLong)
    val df = rows.toDF("g", "day")
      .withColumn("ts", timestamp_millis(col("day") * 86400000L))
    val r = TimeSeries.dailyAutocorrelation(df, "g", "ts", lagDays = 7).head()
    assert(r.getAs[Long]("n_pairs") == 21)
    assert(r.getAs[Long]("r_ppm") == 1000000L)
    // lag 1 on the sawtooth is far from 1
    val r1 = TimeSeries.dailyAutocorrelation(df, "g", "ts", lagDays = 1).head()
    assert(r1.getAs[Long]("r_ppm") < 900000L)
  }

  test("dataset card: exact totals and duplicate rate on a known corpus") {
    val df = Seq(
      ("en", "s1", "hello world."), ("en", "s1", "hello world."), // exact dup
      ("fr", "s2", "bonjour")).toDF("lang", "source", "text")
    val r = Audit.datasetCard(df).head()
    assert(r.getAs[Long]("n_docs") == 3 && r.getAs[Long]("n_distinct") == 2)
    assert(r.getAs[Long]("n_langs") == 2 && r.getAs[Long]("n_sources") == 2)
    assert(r.getAs[Long]("total_words") == 5)
    assert(r.getAs[Long]("dup_ppm") == 333333L)
  }

  test("daily bands: element picks track the day's sorted values") {
    val rows = (0 until 11).map(i => (0L, (i * 10).toLong)) ++ Seq((1L, 7L))
    val df = rows.toDF("day", "cents")
      .withColumn("ts", timestamp_millis(col("day") * 86400000L))
    val got = TimeSeries.dailyBands(df, "ts", col("cents")).collect()
      .map(r => r.getAs[Long]("day") -> r).toMap
    val d0 = got(0L)
    assert(d0.getAs[Long]("n") == 11 && d0.getAs[Long]("p10") == 10L &&
      d0.getAs[Long]("p50") == 50L && d0.getAs[Long]("p90") == 90L)
    val d1 = got(1L) // single value: every band is that value
    assert(d1.getAs[Long]("p10") == 7L && d1.getAs[Long]("p90") == 7L)
  }

  test("segment lift: cross-multiplied rates agree with hand math") {
    // seg a: 2/4 flagged; seg b: 1/4; global 3/8 → lift_a = (2·8)/(4·3) = 4/3
    val df = (Seq.fill(2)(("a", true)) ++ Seq.fill(2)(("a", false)) ++
      Seq.fill(1)(("b", true)) ++ Seq.fill(3)(("b", false))).toDF("seg", "f")
    val got = Audit.segmentLift(df, Seq("seg"), col("f")).collect()
      .map(r => r.getAs[String]("seg") -> r).toMap
    assert(got("a").getAs[Long]("rate_ppm") == 500000L)
    assert(got("a").getAs[Long]("global_rate_ppm") == 375000L)
    assert(got("a").getAs[Long]("lift_ppm") == 1333333L)
    assert(got("b").getAs[Long]("lift_ppm") == 666666L)
  }

  test("srm check: distinct units, exact chi-square, suspect gate") {
    // 60/40 split over 100 units → chisq = 400/100 = 4.0 > 3.841
    val rows = (0 until 100).flatMap(u => Seq((u.toLong, u < 60), (u.toLong, u < 60)))
    val r = Eval.srmCheck(rows.toDF("u", "t"), "u", col("t")).head()
    assert(r.getAs[Long]("n_t") == 60 && r.getAs[Long]("n_c") == 40)
    assert(r.getAs[Long]("chisq_milli") == 4000L && r.getAs[Boolean]("srm_suspect"))
    // 51/49 is fine
    val ok = Eval.srmCheck((0 until 100).map(u => (u.toLong, u < 51)).toDF("u", "t"),
      "u", col("t")).head()
    assert(ok.getAs[Long]("chisq_milli") == 40L && !ok.getAs[Boolean]("srm_suspect"))
  }

  test("block profile: size classes carry exact pair mass") {
    // blocks: sizes 1,1,2,4 → classes 0 (two blocks), 1, 2; pairs 0,1,6
    val rows = Seq("a", "b", "c", "c", "d", "d", "d", "d").map(Tuple1(_))
    val got = graft.ops.FuzzyJoin.blockProfile(rows.toDF("k"), col("k"))
      .select("size_class", "n_blocks", "n_rows", "n_pairs")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 2L, 2L, 0L), (1L, 1L, 2L, 1L), (2L, 1L, 4L, 6L)))
  }

  test("lang confusion: perfect-marker docs land on the diagonal") {
    val df = Seq(("en", "the and is of to the"), ("fr", "le la et les des"),
      ("en", "zzz qqq")).toDF("lang", "text")
    val got = Lexical.langConfusion(df).select("lang", "lang_guess", "n", "share_ppm")
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    assert(got.contains(("en", "en", 1L, 500000L)))
    assert(got.contains(("fr", "fr", 1L, 1000000L)))
    assert(got.exists { case (l, g, _, _) => l == "en" && g == "und" })
  }

  test("time in state: gaps attribute to the earlier event's state") {
    // u: A@0 B@10 A@30 → A holds 10s (0→10), B holds 20s (10→30)
    val rows = Seq(("u", "A", 0L), ("u", "B", 10L), ("u", "A", 30L), ("v", "A", 5L))
    val df = rows.toDF("k", "st", "sec")
      .withColumn("ts", timestamp_millis(col("sec") * 1000L))
      .withColumn("event_id", col("sec"))
    val got = TimeSeries.timeInState(df, "k", "st", "ts", Seq("event_id"))
      .select("state", "n_intervals", "total_sec", "mean_sec_milli")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // v has a single event → no interval anywhere from it
    assert(got == Seq(("A", 1L, 10L, 10000L), ("B", 1L, 20L, 20000L)))
  }

  test("daily streaks: islands anchor on day minus rank, multi-event days count once") {
    // u active days 1,2,3, 7,8 (day 2 twice) → longest 3, streaks 2
    val days = Seq(1L, 2L, 2L, 3L, 7L, 8L).map(("u", _)) :+ (("w", 5L))
    val df = days.toDF("k", "day")
      .withColumn("ts", timestamp_millis(col("day") * 86400000L))
    val got = TimeSeries.longestStreak(df, "k", "ts")
      .select("k", "n_active_days", "longest_streak", "n_streaks")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("u", 5L, 3L, 2L), ("w", 1L, 1L, 1L)))
  }

  test("vocab overlap columns: containment sees the swallowed source") {
    val df = Seq(("big", "a b c d e"), ("small", "a b")).toDF("source", "text")
    val r = Lexical.vocabJaccard(df).head()
    assert(r.getAs[Long]("jaccard_ppm") == 400000L) // 2/5
    assert(r.getAs[Long]("overlap_ppm") == 1000000L) // small ⊂ big
    // directional: g_a="big" (lexicographic), so b_in_a = small-in-big = 1
    assert(r.getAs[Long]("b_in_a_ppm") == 1000000L)
    assert(r.getAs[Long]("a_in_b_ppm") == 400000L)
  }

  test("rarest terms: global df ranks, per-doc rarity order, ties by term") {
    val df = Seq((1L, "x common common"), (2L, "y common"), (3L, "common")).toDF("doc_id", "text")
    val got = Lexical.rarestTerms(df, k = 2).select("doc_id", "term", "df", "rank")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    // df: x=1, y=1, common=3 → doc1 picks x then common, doc2 y then common
    assert(got == Seq((1L, "common", 3L, 2L), (1L, "x", 1L, 1L),
      (2L, "common", 3L, 2L), (2L, "y", 1L, 1L), (3L, "common", 3L, 1L)))
  }

  test("token-sort dups: word order and repeats collapse, singletons drop") {
    val df = Seq((3L, "Red Widget"), (1L, "widget red"), (2L, "widget red widget"),
      (9L, "blue bolt")).toDF("id", "name")
    val got = Lexical.tokenSortDups(df, "id", "name")
      .select("fingerprint", "n_records", "ids")
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(("red widget", 3L, "1,2,3")))
  }

  test("daily returns: D1 is exact-next-day, D7 is the 1..7 window") {
    // u0: days 0,1,9 → d1 yes, d7 yes; u1: days 0,5 → d1 no, d7 yes;
    // u2: day 0 only → neither; u3: days 2,10 → d1 no d7 no (gap 8)
    val rows = Seq(("u0", 0L), ("u0", 1L), ("u0", 9L), ("u1", 0L), ("u1", 5L),
      ("u2", 0L), ("u3", 2L), ("u3", 10L))
    val df = rows.toDF("k", "day").withColumn("ts", timestamp_millis(col("day") * 86400000L))
    val got = Cohort.dailyReturns(df, "k", "ts")
      .select("cohort_day", "n_users", "n_d1", "n_d7", "d1_ppm", "d7_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 3L, 1L, 2L, 333333L, 666666L), (2L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("power share: whale-heavy data concentrates, uniform does not") {
    // 200 users: one whale with 300 events, rest 1 each → top 1% = 2 users
    val rows = (0 until 300).map(_ => 0L) ++ (1L until 200L)
    val r = Cohort.powerUserShare(rows.map(Tuple1(_)).toDF("u"), "u", pctPpm = 10000L).head()
    assert(r.getAs[Long]("n_users") == 200 && r.getAs[Long]("n_events") == 499)
    assert(r.getAs[Long]("top_users") == 2)
    assert(r.getAs[Long]("top_events") == 301) // whale + one singleton
    assert(r.getAs[Long]("share_ppm") == (1000000L * 301) / 499)
  }

  test("readability counts and Flesch score on known text") {
    val df = Seq((1L, "Hello world. This is readable.")).toDF("doc_id", "text")
    val r = Lexical.readability(df).head()
    assert(r.getAs[Long]("n_words") == 5)
    assert(r.getAs[Long]("n_sentences") == 2)
    // vowel runs: e,o | o | i | i | ea,a,e → 8
    assert(r.getAs[Long]("n_syllables") == 8)
    val expected = math.floor(1000.0 * (206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (8.0 / 5.0))).toLong
    assert(r.getAs[Long]("flesch_milli") == expected)
    // degenerate: no sentence punctuation → null score, counts intact
    val deg = Lexical.readability(Seq((2L, "")).toDF("doc_id", "text")).head()
    assert(deg.isNullAt(deg.fieldIndex("flesch_milli")))
  }

  test("mann-kendall: S counts pair votes, tau truncates toward zero") {
    // g=up: y = 1,2,3,4 over x=0..3 → all 6 pairs up, S=6, tau=1e6
    // g=mix: y = 3,1,2 → pairs (3,1)↓ (3,2)↓ (1,2)↑ → S=-1, pairs=3,
    //   tau = (-1e6)/3 truncated = -333333 (floor would say -333334)
    // g=solo: one point → S=0, pairs=0, tau NULL
    val df = Seq(("up", 0L, 1L), ("up", 1L, 2L), ("up", 2L, 3L), ("up", 3L, 4L),
      ("mix", 0L, 3L), ("mix", 1L, 1L), ("mix", 2L, 2L), ("solo", 0L, 9L))
      .toDF("g", "x", "y")
    val got = Trend.mannKendall(df, Seq("g"), col("x"), col("y"))
      .select("g", "n", "s_stat", "pairs", "tau_ppm")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq(("mix", 3L, -1L, 3L, -333333L),
      ("solo", 1L, 0L, 0L, Long.MinValue), ("up", 4L, 6L, 6L, 1000000L)))
  }

  test("kruskal-wallis: hand-checked H with ties, degenerate slices null") {
    // g=a, samples s1={1,2}, s2={2,3}: sorted 1,2,2,3 → midranks
    // 1, 2.5, 2.5, 4 (×2: 2,5,5,8). R2_1=7, R2_2=13, n=4, k=2.
    // H = 3·(49/2 + 169/2)/(4·5) − 3·5 = 3·109/20 − 15 = 1.35
    // ties: value 2 twice → Σ(t³−t)=6; C = 1 − 6/60 = 0.9; H/C = 1.5
    val df = Seq(("a", "s1", 1L), ("a", "s1", 2L), ("a", "s2", 2L), ("a", "s2", 3L),
      ("b", "only", 1L), ("b", "only", 2L)).toDF("g", "s", "v")
    val got = Eval.kruskalWallis(df, Seq("g"), col("s"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 4L, 1350L, 1500L),
      ("b", 1L, 2L, Long.MinValue, Long.MinValue)))
  }

  test("association rules: pair pruning, per-direction confidence, lift") {
    // baskets 1:{10,20,30} 2:{10,20} 3:{10,20} 4:{30}; duplicate row in
    // basket 2 must not double-count. minPair=2 keeps only (10,20): 3 of
    // 4 baskets, both confidences 3/3, lift = 4·3/(3·3) = 1.333
    val rows = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 10L),
      (2L, 20L), (3L, 10L), (3L, 20L), (4L, 30L))
    val got = graft.ops.Association.rules(rows.toDF("b", "it"), col("b"), col("it"))
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("item_a") == 10 && r.getAs[Long]("item_b") == 20)
    assert(r.getAs[Long]("n_ab") == 3 && r.getAs[Long]("n_a") == 3 &&
      r.getAs[Long]("n_b") == 3 && r.getAs[Long]("n_baskets") == 4)
    assert(r.getAs[Long]("support_ppm") == 750000L)
    assert(r.getAs[Long]("conf_a_b_ppm") == 1000000L && r.getAs[Long]("conf_b_a_ppm") == 1000000L)
    assert(r.getAs[Long]("lift_milli") == 1333L)
  }

  test("assortativity: star is -1, regular graph is degenerate, truncation") {
    import graft.ops.GraphMetrics
    // star 0-{1,2,3}: every edge pairs deg 3 with deg 1 → r = −1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a_id", "b_id")
    val s = GraphMetrics.degreeAssortativity(star).head()
    assert(s.getAs[Long]("m") == 3 && s.getAs[Long]("r_ppm") == -1000000L)
    // 4-cycle: all degrees equal → zero variance, r undefined (NULL)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a_id", "b_id")
    val c = GraphMetrics.degreeAssortativity(cyc).head()
    assert(c.getAs[Long]("r_den") == 0 && c.isNullAt(c.fieldIndex("r_ppm")))
    // triangle + pendant: num=−20, den=28 → ppm truncates to −714285
    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val t = GraphMetrics.degreeAssortativity(tp).head()
    assert(t.getAs[Long]("r_num") == -20 && t.getAs[Long]("r_den") == 28)
    assert(t.getAs[Long]("r_ppm") == -714285L)
  }

  test("type sniff: precedence order and per-class counts") {
    val df = Seq(
      ("42", "3.14", "x"), ("-7", "true", "{\"a\":1}"),
      (null, "2024-01-02", "2024-01-02 10:00:00"), ("", "1e5", "9.")
    ).toDF("a", "b", "c")
    val got = Audit.typeSniff(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("a", "int", 2L), ("a", "null", 1L), ("a", "empty", 1L),
      ("b", "float", 1L), ("b", "bool", 1L), ("b", "date", 1L), ("b", "other", 1L),
      ("c", "other", 2L), ("c", "json", 1L), ("c", "datetime", 1L)))
  }

  test("lead-lag: recovers the injected shift with r = 1") {
    // b's daily count curve is exactly a's shifted +2 days → best_lag 2,
    // perfect correlation; c is flat → zero variance, no row with c.
    // r_ppm is 999999, not 1e6: sqrt(da)·sqrt(da) rounds a hair above
    // da in doubles, and the last mile is PINNED double math (the same
    // documented posture as dailyAutocorrelation) — both engines agree.
    val curve = Seq(1, 5, 2, 8, 3, 9, 4)
    val rows =
      curve.zipWithIndex.flatMap { case (n, d) => Seq.fill(n)(("a", d.toLong)) } ++
      curve.zipWithIndex.flatMap { case (n, d) => Seq.fill(n)(("b", d.toLong + 2)) } ++
      (0L until 9L).map(d => ("c", d))
    val df = rows.toDF("g", "day")
      .withColumn("ts", timestamp_millis(col("day") * 86400000L))
    val got = TimeSeries.leadLagCorrelation(df, "g", "ts", maxLagDays = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq(("a", "b", 2L, 999999L)))
  }

  test("linear fit: perfect line is ppm 1e6, constant y is null") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L),
      ("h", 1L, 5L), ("h", 2L, 5L), ("h", 3L, 5L),
      // i: y = (0,1,1) on x = (1,2,3): num = 3·5−3·2 = wait compute in
      // comment: sx=6 sy=2 sxy=1·0+2·1+3·1=5 sxx=14 syy=2
      // num=3·5−12=3, dx=3·14−36=6, dy=3·2−4=2 → r²=9/12=0.75
      ("i", 1L, 0L), ("i", 2L, 1L), ("i", 3L, 1L)).toDF("g", "x", "y")
    val got = Trend.linearFit(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq(("g", 3L, 60L, 6L, 1000000L), ("h", 3L, 0L, 6L, -1L),
      ("i", 3L, 3L, 6L, 750000L)))
  }

  test("saxSymbols: hand-computed PAA words, ragged tail window, breakpoint edges") {
    // key "u": values 1,2,3,4 | 5,6,7,8 | 9 over w=4 →
    //   PAA milli: 2500, 6500, 9000; breakpoints (2500, 5000, 8000) →
    //   syms: >=2500 only → 'b'; >=2500,5000 → 'c'; all three → 'd'
    // key "v": single point 0 → PAA 0 → 'a'
    val rows = (1 to 9).map(i => ("u", i.toLong, i.toLong)) :+ (("v", 1L, 0L))
    val df = rows.toDF("k", "o", "v")
    val got = graft.ops.TimeSeries.saxSymbols(df, Seq("k"), Seq(col("o")), col("v"),
        w = 4, breakpointsMilli = Seq(2500L, 5000L, 8000L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(("u", 3L, 9L, "bcd"), ("v", 1L, 1L, "a")))
    // order column decides the word, not input order: reversed input, same word
    val rev = rows.reverse.toDF("k", "o", "v")
    val w2 = graft.ops.TimeSeries.saxSymbols(rev, Seq("k"), Seq(col("o")), col("v"),
        w = 4, breakpointsMilli = Seq(2500L, 5000L, 8000L))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(w2("u") == "bcd")
  }

  test("simpsonDiversity: uniform, single-category, and skewed groups exact") {
    // g1: 3 cats × 2 each, n=6, s2=12 → gini = (36-12)/36 = 666666 ppm,
    //   effective = 36/12 = 3.000
    // g2: one cat, n=4 → gini 0, effective 1.000
    // g3: counts (3,1), n=4, s2=10 → (16-10)/16 = 375000, eff = 16/10 = 1600 milli
    val rows = Seq.fill(2)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq.fill(2)(("g1", "c")) ++ Seq.fill(4)(("g2", "x")) ++
      Seq.fill(3)(("g3", "a")) :+ (("g3", "b"))
    val got = graft.ops.Metrics.simpsonDiversity(rows.toDF("g", "c"), Seq("g"), col("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == Seq(("g1", 3L, 6L, 666666L, 3000L), ("g2", 1L, 4L, 0L, 1000L),
      ("g3", 2L, 4L, 375000L, 1600L)))
  }

  test("bottomKJaccard: small-k matches exact Jaccard; estimator is hash-rank-exact") {
    // Three corpora over a tiny vocab; with k >= |union| the bottom-k
    // estimate IS the exact Jaccard (every hash is in the sketch).
    val rows = Seq(
      "A" -> Seq("w1", "w2", "w3", "w4"),
      "B" -> Seq("w3", "w4", "w5", "w6"),
      "C" -> Seq("w1", "w2", "w3", "w4")
    ).flatMap { case (g, ws) => ws.map(g -> _) }
    val df = rows.toDF("src", "tok")
    val got = graft.ops.Dedup.bottomKJaccard(df, "src", col("tok"), k = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    // A∩B = {w3,w4}, |A∪B| = 6 → 2/6 = 333333 ppm; A = C → 4/4 = 1e6
    assert(got == Seq(("A", "B", 6L, 2L, 333333L), ("A", "C", 4L, 4L, 1000000L),
      ("B", "C", 6L, 2L, 333333L)))

    // with k = 3 the union rank keeps only 3 hashes — k_used = 3 and the
    // estimate depends only on md5 order (re-run stability)
    val small = graft.ops.Dedup.bottomKJaccard(df, "src", col("tok"), k = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(4)))).toMap
    assert(small.values.forall(_._1 == 3L))
    assert(small(("A", "C")) == ((3L, 1000000L)))
  }

  test("averagePrecision: hand-computed AP, truncation spec, no-relevant is null") {
    // q1 ranking (rank: rel): 1:1, 2:0, 3:1, 4:0 with k=4 →
    //   P@1 = 1e6, P@3 = (1e6·2)//3 = 666666; R=2 → AP = 1666666//2 = 833333
    // q2: relevant only at rank 4 but k=3 cuts it → n_rel=0 in top-k → null
    val df = Seq(
      ("q1", 1L, true), ("q1", 2L, false), ("q1", 3L, true), ("q1", 4L, false),
      ("q2", 1L, false), ("q2", 2L, false), ("q2", 3L, false), ("q2", 4L, true)
    ).toDF("q", "pos", "rel")
    val k4 = graft.ops.Eval.averagePrecision(df, Seq("q"), Seq(col("pos")), col("rel"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1).toSeq
    assert(k4 == Seq(("q1", 4L, 2L, 833333L), ("q2", 4L, 1L, 250000L)))
    val k3 = graft.ops.Eval.averagePrecision(df, Seq("q"), Seq(col("pos")), col("rel"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1).toSeq
    // k=3: q1 unchanged numerator (hits at 1 and 3), min(R,k) still 2;
    // q2 loses its only hit → null
    assert(k3 == Seq(("q1", 3L, 2L, 833333L), ("q2", 3L, 0L, -1L)))
  }

  test("linkJaccard: hand-computed scores, edge flags, deterministic hub cap") {
    // triangle 1-2-3 plus pendant 3-4:
    //   (1,2) common {3} J=1/3; (1,3),(2,3) J=1/4; non-edges (1,4),(2,4) J=1/2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val got = graft.ops.GraphMetrics.linkJaccard(g)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6)))).toMap
    assert(got.size == 5)
    assert(got((1L, 2L)) == ((1L, 2L, 2L, true, 333333L)))
    assert(got((1L, 3L)) == ((1L, 2L, 3L, true, 250000L)))
    assert(got((2L, 3L)) == ((1L, 2L, 3L, true, 250000L)))
    assert(got((1L, 4L)) == ((1L, 2L, 1L, false, 500000L)))
    assert(got((2L, 4L)) == ((1L, 2L, 1L, false, 500000L)))

    // maxDegree=2 truncates node 3's adjacency to its 2 smallest ids
    // {1,2}: the pendant pairs through 3 vanish, degrees stay exact
    val capped = graft.ops.GraphMetrics.linkJaccard(g, maxDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("coMissingness: pair counts, ppm, and independence lift exact") {
    val df = Seq[(Option[Int], Option[Int], Option[Int])](
      (None, None, Some(1)), (None, Some(2), None), (Some(1), None, None),
      (Some(1), Some(2), Some(3)), (None, None, None)
    ).toDF("a", "b", "c")
    val got = graft.ops.Audit.coMissingness(df, Seq("a", "b", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // every pair: 2 of 5 co-null, marginals 3 and 3 → lift 10000//9 = 1111
    assert(got.size == 3)
    for (p <- Seq(("a", "b"), ("a", "c"), ("b", "c")))
      assert(got(p) == ((5L, 3L, 3L, 2L, 400000L, 1111L)), s"pair $p: ${got(p)}")
    // a never-null column zeroes the marginal → lift NULL, conull 0
    val withFull = df.withColumn("d", lit(1))
    val ad = graft.ops.Audit.coMissingness(withFull, Seq("a", "d")).head()
    assert(ad.getLong(5) == 0L && ad.isNullAt(7))
  }

  test("stickiness: hand-computed week, dedup within day, single-day week") {
    def ts(day: Int, h: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day.toLong * 86400 + h * 3600))
    // week 0 (days 0..6): day 0 actives {u1,u2}, day 1 {u1} (u1 twice
    // same day dedups) → sum_dau 3, n_active_days 2, wau {u1,u2}=2 →
    // stickiness = 3e6 // (2*2) = 750000
    // week 1: day 7 {u3} → 1e6 exactly
    val df = Seq(("u1", ts(0, 1)), ("u2", ts(0, 2)), ("u1", ts(1, 3)),
      ("u1", ts(1, 9)), ("u3", ts(7, 0))).toDF("user_id", "ts")
    val got = graft.ops.Cohort.stickiness(df, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 2L, 2L, 1L, 750000L), (1L, 1L, 1L, 1L, 1000000L)))
  }

  test("hashBucketProfile: loads partition the distinct values, duplicates collapse") {
    val df = Seq("a", "a", "b", "c", "d", "e", "f", "g", "h").toDF("v")
    val got = graft.ops.Audit.hashBucketProfile(df, col("v"), prefixLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // md5 prefixes of 8 distinct values at prefixLen=8: collision-free →
    // one histogram row (load 1, 8 buckets, 8 values)
    assert(got.toSeq == Seq((1L, 8L, 8L)))
    // n_values always sums to the distinct count whatever the collisions
    val tiny = graft.ops.Audit.hashBucketProfile(df, col("v"), prefixLen = 1)
      .collect().map(r => r.getLong(2)).sum
    assert(tiny == 8L)
  }

  test("harmonicCentrality2: path graph hand-computed") {
    // path 1-2-3-4: node 1 reaches 2 at d1, 3 at d2 → 1e6 + 5e5;
    // node 2 reaches 1,3 at d1 and 4 at d2 → 2e6 + 5e5
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val got = graft.ops.GraphMetrics.harmonicCentrality2(g)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1500000L, 2L -> 2500000L, 3L -> 2500000L, 4L -> 1500000L))
  }

  test("audienceOverlap: jaccard and overlap coefficient exact") {
    // A={1,2,3}, B={2,3,4}, C={9}: A∩B=2 → J=2/4, overlap=2/3; C disjoint
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 2L), ("B", 3L),
      ("B", 4L), ("B", 4L), ("C", 9L)).toDF("seg", "uid")
    val got = graft.ops.Cohort.audienceOverlap(df, "seg", "uid")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // only pairs with n_common >= 1 appear (actor-keyed join)
    assert(got.keySet == Set(("A", "B")))
    assert(got(("A", "B")) == ((3L, 3L, 2L, 500000L, 666666L)))
  }

  test("nfc kernel and unicodeAudit: composed/decomposed text detected, ascii untouched") {
    import graft.functions.TextFunctions
    val decomposed = "caf" + "e\u0301"  // e + combining acute: NOT NFC
    val composed = "caf" + "\u00e9"     // precomposed e-acute: NFC
    val df = Seq(("l1", decomposed), ("l1", composed), ("l1", "plain ascii"),
      ("l2", null.asInstanceOf[String])).toDF("lang", "text")
    val norm = df.select(TextFunctions.nfc(coalesce(col("text"), lit(""))).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(norm.contains(composed) && !norm.exists(_.contains("\u0301")))
    val got = graft.ops.Lexical.unicodeAudit(df, Seq("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    // decomposed is 5 chars, NFC form 4 → char_delta 1; 1 of 3 docs non-NFC
    assert(got == Seq(("l1", 3L, 1L, 1L, 333333L), ("l2", 1L, 0L, 0L, 0L)))
  }

  test("soundexSep: classic reference codes and the documented h/w divergence") {
    def sx(s: String): String =
      StringKernels.soundexSep(UTF8String.fromString(s)).toString
    // agree with classic American Soundex when no h/w adjacency is in play
    assert(sx("Robert") == "R163" && sx("Rupert") == "R163")
    assert(sx("Tymczak") == "T522")
    assert(sx("Pfister") == "P236") // leading same-code pair absorbs
    assert(sx("Aaron") == "A650")   // vowel separates the repeated code
    assert(sx("Jackson") == "J250")
    // the ONE divergence: h does NOT make the flanking same-codes collapse
    assert(sx("Ashcraft") == "A226") // classic (h/w transparent) says A261
    // hygiene: case-insensitive, non-letters stripped, degenerate inputs
    assert(sx("o'BRIEN") == sx("OBrien"))
    assert(sx("AE") == "A000")
    assert(sx("123") == "" && sx("") == "")
  }

  test("ohlc: open/close follow the pinned order, not input order") {
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // day 0 for key k: values by time = 10, 30, 5, 20 → O=10 H=30 L=5 C=20
    // rows arrive shuffled; a same-ms tie resolves by event_id
    val rows = Seq(("k", ts(300), 3L, 5L), ("k", ts(100), 1L, 10L),
      ("k", ts(400), 4L, 20L), ("k", ts(200), 2L, 30L),
      // day 1: single trade
      ("k", ts(86400 + 10), 9L, 7L))
    val df = rows.toDF("k", "ts", "event_id", "cents")
      .withColumn("ms", unix_millis(col("ts")))
    val got = graft.ops.TimeSeries.ohlc(df, Seq("k"),
        expr("unix_millis(ts) div 1000 div 86400"),
        Seq(col("ms"), col("event_id")), col("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 4L, 10L, 30L, 5L, 20L), (1L, 1L, 7L, 7L, 7L, 7L)))
  }

  test("fanoutProfile: exact percentile picks off the histogram") {
    // 10 keys: fan-outs 1×5, 2×3, 10×1, 50×1 →
    //   n_rows = 5+6+10+50 = 71; p50 pick = key at rank ⌊50·9/100⌋+1 = 5 → 1
    //   p90 pick = rank ⌊90·9/100⌋+1 = 9 → fan-out 10; mean = 7100 milli
    val rows =
      (1 to 5).map(k => (s"a$k", 1)) ++ (6 to 8).flatMap(k => Seq.fill(2)((s"a$k", 1))) ++
      Seq.fill(10)(("a9", 1)) ++ Seq.fill(50)(("a10", 1))
    val r = graft.ops.Audit.fanoutProfile(rows.toDF("k", "x"), col("k")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((10L, 71L, 50L, 1L, 10L, 7100L)))
  }

  test("scriptProfile: counts per range, precedence-ordered dominant, none on empty") {
    val df = Seq(
      ("mix", "abcДЕ 12"),      // 3 latin, 2 cyrillic, 2 digits
      ("mix", "Γ一ア"),      // 1 greek, 2 cjk (han + katakana)
      ("tie", "aД"),                  // latin ties cyrillic → latin wins
      ("empty", "...!?")
    ).toDF("g", "text")
    val got = graft.ops.Lexical.scriptProfile(df, Seq("g"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getString(8)))).toMap
    assert(got("mix") == ((3L, 2L, 1L, 2L, 0L, 2L, "latin")))
    assert(got("tie") == ((1L, 1L, 0L, 0L, 0L, 0L, "latin")))
    assert(got("empty") == ((0L, 0L, 0L, 0L, 0L, 0L, "none")))
  }

  test("varianceChangepoint: level shift found at the exact boundary") {
    // series g: 5,5,5,5, 50,50,50 → best split at k=4 with zero SSE
    val g = Seq(5L, 5L, 5L, 5L, 50L, 50L, 50L).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }
    // series h: constant → every split costs 0, tie → smallest k=1
    val h = (0 until 4).map(i => ("h", i.toLong, 7L))
    val df = (g ++ h).toDF("k", "o", "v")
    val got = graft.ops.TimeSeries.varianceChangepoint(df, Seq("k"), Seq(col("o")), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5))).sortBy(_._1).toSeq
    // g total SSE: ΣY²=14600... ΣY=170, n=7 → 1000·7600−(1000·28900)//7 → compute:
    // Q=4·25+3·2500=7600; 1000·7600=7.6e6; (1000·170²)//7=(28.9e6)//7=4128571
    // → total 3471429; split cost 0 → gain = total
    assert(got == Seq(("g", 7L, 4L, 0L, 3471429L), ("h", 4L, 1L, 0L, 0L)))
  }

  test("embeddingAudit: dims, zero vectors, NaN flags, quantized norms exact") {
    val rows = Seq(
      (0, Array(0.5f, -0.5f)),                 // norm2q = 500²·2 = 500000
      (0, Array(0.0f, 0.0f)),                  // zero vector
      (0, Array(1.0f, Float.NaN)),             // non-finite
      (1, Array(0.1f, 0.2f, 0.3f))             // dim 3: 10000+40000+90000
    ).toDF("label", "embedding")
    val got = graft.ops.Similarity.embeddingAudit(rows)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)))).toMap
    // label 0: NaN quantizes through round → its norm still computes;
    // the audit FLAGS it rather than poisoning the aggregate
    val l0 = got(0)
    assert(l0._1 == 3L && l0._2 == 1L && l0._3 == 2L && l0._4 == 2L)
    assert(l0._5 == 1L && l0._6 == 1L) // one zero vector, one non-finite
    assert(got(1) == ((1L, 1L, 3L, 3L, 0L, 0L, 140000L, 140000L, 140000L)))
  }

  test("weightedJaccard: count-aware overlap, identity for the max side") {
    // A: x×3, y×1  B: x×1, z×2  → Σmin = min(3,1) = 1 over common {x};
    // Σmax = 4 + 3 − 1 = 6 → 166666 ppm. C == A exactly → 1e6.
    val rows = Seq.fill(3)(("A", "x")) ++ Seq(("A", "y")) ++
      Seq(("B", "x")) ++ Seq.fill(2)(("B", "z")) ++
      Seq.fill(3)(("C", "x")) ++ Seq(("C", "y"))
    val byName = graft.ops.Lexical.weightedJaccard(rows.toDF("g", "t"), "g", col("t"))
      .collect().map(r => ((r.getAs[String]("g_a"), r.getAs[String]("g_b")),
        (r.getAs[Long]("sum_min"), r.getAs[Long]("wjaccard_ppm")))).toMap
    assert(byName(("A", "B")) == ((1L, 166666L)))
    assert(byName(("A", "C")) == ((4L, 1000000L)))
    assert(byName(("B", "C")) == ((1L, 166666L)))
  }

  test("logTemplates: hex-before-digit masking, counts and deterministic example") {
    val df = Seq(
      "GET /api/user/123 took 45ms",
      "GET /api/user/999 took 7ms",
      "session deadbeef01 expired",
      "session cafebabe99 expired",
      "plain message"
    ).toDF("m")
    val got = graft.ops.Lexical.logTemplates(df, col("m"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got("GET /api/user/<n> took <n>ms") ==
      ((2L, 2L, "GET /api/user/123 took 45ms")))
    assert(got("session <hex> expired") == ((2L, 2L, "session cafebabe99 expired")))
    assert(got("plain message") == ((1L, 1L, "plain message")))
  }

  test("ltvCurve: cohort assignment, cumulative revenue per member exact") {
    // cohort month 10: u1 (buys m10: 1000c, m11: 500c), u2 (m10: 2000c)
    // cohort month 11: u3 (m11: 300c)
    val df = Seq(("u1", 10L, 1000L), ("u1", 11L, 500L), ("u2", 10L, 2000L),
      ("u3", 11L, 300L)).toDF("c", "m", "amt")
    val got = graft.ops.Cohort.ltvCurve(df, "c", col("m"), col("amt"))
      .collect().map(r => ((r.getAs[Long]("cohort_month"), r.getAs[Long]("age_months")),
        (r.getAs[Long]("n_active"), r.getAs[Long]("revenue_cents"),
          r.getAs[Long]("cohort_size"), r.getAs[Long]("cum_revenue_cents"),
          r.getAs[Long]("cum_rev_per_user_milli")))).toMap
    // cohort 10 age 0: 2 active, 3000c, cum 3000 → per-user 3000/2 c = 15000 milli-dollars? no:
    // (1000·3000)//(100·2) = 15000 milli-units of currency = 15.000
    assert(got((10L, 0L)) == ((2L, 3000L, 2L, 3000L, 15000L)))
    assert(got((10L, 1L)) == ((1L, 500L, 2L, 3500L, 17500L)))
    assert(got((11L, 0L)) == ((1L, 300L, 1L, 300L, 3000L)))
  }

  test("clampedBalance: reflection identity equals the sequential clamp, shortfall exact") {
    // hand trace (+5, -3, -4, +2): balances 5,2,0,2; shortfall 2 on the -4
    val hand = Seq((1L, 5L), (2L, -3L), (3L, -4L), (4L, 2L))
      .map { case (o, d) => ("k", o, d) }.toDF("k", "o", "d")
    val got = graft.ops.TimeSeries.clampedBalance(hand, Seq("k"), Seq(col("o")), col("d"))
      .collect().map(r => (r.getAs[Long]("o"), r.getAs[Long]("balance"), r.getAs[Long]("shortfall")))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 5L, 0L), (2L, 2L, 0L), (3L, 0L, 2L), (4L, 2L, 0L)))

    // random series: the window formulation must equal a sequential fold
    val rnd = new scala.util.Random(17)
    val deltas = (1 to 200).map(i => (s"g${i % 3}", i.toLong, (rnd.nextInt(21) - 10).toLong))
    val seq = deltas.groupBy(_._1).flatMap { case (k, rows) =>
      rows.sortBy(_._2).scanLeft((k, 0L, 0L)) { case ((_, _, bal), (_, o, d)) =>
        (k, o, math.max(0L, bal + d))
      }.drop(1)
    }.map { case (k, o, b) => (k, o) -> b }.toMap
    val win = graft.ops.TimeSeries.clampedBalance(
        deltas.toDF("k", "o", "d"), Seq("k"), Seq(col("o")), col("d"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("o")) -> r.getAs[Long]("balance"))
      .toMap
    assert(win == seq)
  }

  test("revenueRetention: churn caps GRR, expansion lifts NRR, new customers excluded") {
    // m10: u1=100, u2=200; m11: u1=150 (expansion), u2 absent (churn),
    // u3=999 (new — must not count). Base for m11 = 300;
    // GRR = min(100,150)+0 = 100 → 333333; NRR = 150 → 500000.
    val df = Seq(("u1", 10L, 100L), ("u2", 10L, 200L), ("u1", 11L, 150L),
      ("u3", 11L, 999L)).toDF("c", "m", "amt")
    val got = graft.ops.Cohort.revenueRetention(df, "c", col("m"), col("amt"))
      .collect().map(r => r.getAs[Long]("month") ->
        ((r.getAs[Long]("n_base_customers"), r.getAs[Long]("base_cents"),
          r.getAs[Long]("retained_cents"), r.getAs[Long]("carried_cents"),
          r.getAs[Long]("n_churned"), r.getAs[Long]("grr_ppm"), r.getAs[Long]("nrr_ppm")))).toMap
    assert(got(11L) == ((2L, 300L, 100L, 150L, 1L, 333333L, 500000L)))
    // m12 row: base = m11's customers (u1, u3), all churned
    assert(got(12L) == ((2L, 1149L, 0L, 0L, 2L, 0L, 0L)))
  }

  test("growthAccounting: state classification and churn-week placement") {
    def ts(week: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(week.toLong * 7 * 86400 + 3600))
    // u1 active w0, w1, w3  → new@0, retained@1, resurrected@3, churn lands on w2 and w4
    // u2 active w1          → new@1, churn lands on w2
    val df = Seq(("u1", ts(0)), ("u1", ts(1)), ("u1", ts(3)), ("u2", ts(1)))
      .toDF("user_id", "ts")
    val got = graft.ops.Cohort.growthAccounting(df, "user_id", "ts")
      .collect().map(r => r.getAs[Long]("week") ->
        ((r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_active"), r.getAs[Long]("n_churned")))).toMap
    assert(got(0L) == ((1L, 0L, 0L, 1L, 0L)))
    assert(got(1L) == ((1L, 1L, 0L, 2L, 0L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L, 2L)))
    assert(got(3L) == ((0L, 0L, 1L, 1L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L, 0L, 1L)))
  }

  test("overlapPairs: matches the quadratic reference once per pair, exact lengths") {
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val rnd = new scala.util.Random(5)
    val mk = (n: Int) => (0 until n).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(800))
    }
    val as = mk(80)
    val bs = mk(60)
    val expected = (for {
      (ai, as1, ae) <- as; (bi, bs1, be) <- bs
      if as1 < be && bs1 < ae
    } yield (ai, bi, (math.min(ae, be) - math.max(as1, bs1)) * 1000000L)).toSet
    val aDf = as.map { case (i, s, e) => (i, ts(s), ts(e)) }.toDF("a_id", "a_start", "a_end")
    val bDf = bs.map { case (i, s, e) => (i, ts(s), ts(e)) }.toDF("b_id", "b_start", "b_end")
    // width much smaller than spans → pairs share MANY buckets; the
    // first-shared-cell rule must still emit each pair exactly once
    val got = graft.ops.IntervalJoin.overlapPairs(aDf, "a_start", "a_end",
        bDf, "b_start", "b_end", bucketWidthSec = 64)
      .select("a_id", "b_id", "overlap_micros")
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "pair emitted more than once")
    assert(got.toSet == expected)
  }

  test("interval joins bucket exactly beyond 2^53 micros and before 1970 (integer grid)") {
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // Year ~2258: epoch micros ≈ 9.1e15 > 2^53, where double division
    // misplaces grid cells; and a pre-1970 pair, where truncating `div`
    // disagrees with floor. Both must still match exactly once.
    val farSec = 9100000000L // ≈ 2258-05-27
    val oldSec = -1000000L   // 1969-12-20
    val a = Seq((1L, ts(farSec), ts(farSec + 100)), (2L, ts(oldSec), ts(oldSec + 100)))
      .toDF("a_id", "a_start", "a_end")
    val b = Seq((10L, ts(farSec + 50), ts(farSec + 150)), (20L, ts(oldSec + 50), ts(oldSec + 150)))
      .toDF("b_id", "b_start", "b_end")
    val pairs = graft.ops.IntervalJoin.overlapPairs(a, "a_start", "a_end",
        b, "b_start", "b_end", bucketWidthSec = 7)
      .select("a_id", "b_id", "overlap_micros").as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 10L, 50000000L), (2L, 20L, 50000000L)))
    val pts = Seq((100L, ts(farSec + 10)), (200L, ts(oldSec + 10))).toDF("p_id", "p")
    val inIv = graft.ops.IntervalJoin.pointsInIntervals(a, "a_start", "a_end",
        pts, "p", bucketWidthSec = 7)
      .select("p_id", "a_id").as[(Long, Long)].collect().toSet
    assert(inIv == Set((100L, 1L), (200L, 2L)))
  }

  test("rollingSlope: exact window suff-stats, null on flat x") {
    // y = 3x: every window slope is exactly 3.000
    val lin = (1 to 10).map(i => ("g", i.toLong, 3L * i))
    val got = graft.ops.TimeSeries.rollingSlope(lin.toDF("k", "x", "y"),
        Seq("k"), col("x"), col("y"), w = 4)
      .collect().map(r => (r.getAs[Long]("x"),
        Option(r.getAs[Any]("slope_milli")), r.getAs[Long]("n_window"))).sortBy(_._1)
    // the first window holds a single point → den 0 → NULL; the rest 3.000
    assert(got.head._2.isEmpty)
    assert(got.drop(1).forall(_._2.contains(3000L)))
    assert(got.take(4).map(_._3).toSeq == Seq(1L, 2L, 3L, 4L) && got.last._3 == 4L)
    // single-point window: den 0 → null
    val single = Seq(("h", 5L, 9L)).toDF("k", "x", "y")
    val r = graft.ops.TimeSeries.rollingSlope(single, Seq("k"), col("x"), col("y"), w = 3).head()
    assert(r.getAs[Any]("slope_milli") == null)
  }

  test("kSuppress: small classes null out (null quasi matches itself), large pass") {
    val df = Seq(
      ("a", "x", 1L), ("a", "x", 2L), ("a", "x", 3L),      // class of 3 → passes
      ("b", "y", 4L),                                       // singleton → suppressed
      (null.asInstanceOf[String], "z", 5L),                 // null-keyed singletons:
      (null.asInstanceOf[String], "z", 6L),                 //  class of 2 → passes
      (null.asInstanceOf[String], "w", 7L)                  //  class of 1 → suppressed
    ).toDF("q1", "q2", "id")
    val got = graft.ops.Audit.kSuppress(df, Seq("q1", "q2"), k = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[String]("q1")), Option(r.getAs[String]("q2")),
          r.getAs[Boolean]("suppressed")))).toMap
    assert(got(1L) == ((Some("a"), Some("x"), false)))
    assert(got(4L) == ((None, None, true)))
    assert(got(5L) == ((None, Some("z"), false))) // null quasi kept as its own class
    assert(got(7L) == ((None, None, true)))
  }

  test("setCompletion: unordered steps, exact span, incomplete actors null") {
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val df = Seq(
      // u1 completes out of order: purchase first, view last → span 100
      ("u1", "purchase", ts(100)), ("u1", "click", ts(150)), ("u1", "view", ts(200)),
      ("u1", "view", ts(50000)),   // later repeat must not move the span
      // u2 sees only two steps
      ("u2", "view", ts(10)), ("u2", "click", ts(20)),
      // u3's other event types don't count as steps
      ("u3", "error", ts(5))
    ).toDF("user_id", "t", "ts")
    val got = graft.ops.Funnel.setCompletion(df, "user_id", col("t"), "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[String]("user_id") ->
        ((r.getAs[Long]("n_steps_seen"), r.getAs[Boolean]("completed"),
          Option(r.getAs[Any]("span_seconds"))))).toMap
    assert(got("u1") == ((3L, true, Some(100L))))
    assert(got("u2") == ((2L, false, None)))
    assert(!got.contains("u3"))
  }

  test("richClub: clique of hubs vs pendant leaves, hand-computed phi") {
    // 4-clique {1,2,3,4} (deg ≥ 3 each) + leaves 5,6 hanging off node 1
    // (deg(1)=5). At k=2: rich = {1,2,3,4} (deg > 2), 6/6 edges → 1e6.
    // At k=3: deg > 3 keeps ONLY node 1 (clique nodes sit at exactly 3)
    // → NULL. Same at k=4.
    val g = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)) ++
      Seq((1L, 5L), (1L, 6L))
    val got = graft.ops.GraphMetrics.richClub(g.toDF("a_id", "b_id"),
        thresholds = Seq(0L, 2L, 3L, 4L))
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_rich"), r.getAs[Long]("n_edges"),
          Option(r.getAs[Any]("phi_ppm"))))).toMap
    // k=0: all 6 nodes, 8 edges of 15 possible → 533333
    assert(got(0L) == ((6L, 8L, Some(533333L))))
    assert(got(2L) == ((4L, 6L, Some(1000000L))))
    assert(got(3L) == ((1L, 0L, None)))
    assert(got(4L) == ((1L, 0L, None)))
  }

  test("stylometricCosine: identical styles hit 1e6, disjoint function words absent") {
    val df = Seq(
      ("A", "the cat of the house and the dog"),
      ("B", "the bird of the sea and the fish"),   // same fw profile as A
      ("C", "but but but it it was")                // different profile
    ).toDF("src", "text")
    val got = graft.ops.Lexical.stylometricCosine(df, "src", col("text"))
      .collect().map(r => ((r.getAs[String]("g_a"), r.getAs[String]("g_b")),
        r.getAs[Long]("cosine_ppm"))).toMap
    // A and B: fw counts {the:3, of:1, and:1} each → cosine exactly 1
    assert(got(("A", "B")) == 999999L || got(("A", "B")) == 1000000L)
    // C shares no function words with A → no pair row at all
    assert(!got.contains(("A", "C")) && !got.contains(("B", "C")) ||
      (got.get(("A", "C")).isEmpty && got.get(("B", "C")).isEmpty))
  }

  test("mixShift: mix and rate effects reconstruct the overall delta") {
    // seg X: a(100 rows, 50 pos), b(300, 150) — rate flat 50%, share grows
    // seg Y: a(300, 30),  b(100, 50)  — rate 10% → 50%, share shrinks
    val rows =
      Seq.fill(50)(("X", "a", true)) ++ Seq.fill(50)(("X", "a", false)) ++
      Seq.fill(150)(("X", "b", true)) ++ Seq.fill(150)(("X", "b", false)) ++
      Seq.fill(30)(("Y", "a", true)) ++ Seq.fill(270)(("Y", "a", false)) ++
      Seq.fill(50)(("Y", "b", true)) ++ Seq.fill(50)(("Y", "b", false))
    val df = rows.toDF("seg", "p", "ok")
    val got = graft.ops.Metrics.mixShift(df, "seg", col("p"), "a", "b", col("ok"))
      .collect().map(r => r.getAs[String]("segment") ->
        ((r.getAs[Long]("share_a_ppm"), r.getAs[Long]("share_b_ppm"),
          r.getAs[Long]("rate_a_ppm"), r.getAs[Long]("rate_b_ppm"),
          r.getAs[Long]("mix_effect_ppm"), r.getAs[Long]("rate_effect_ppm")))).toMap
    // X: share 25%→75%, rate 50% flat → mix = +250000, rate = 0
    assert(got("X") == ((250000L, 750000L, 500000L, 500000L, 250000L, 0L)))
    // Y: share 75%→25%, rate 10%→50% → mix = −500000·0.1 = −50000,
    //    rate = 0.25·400000 = 100000
    assert(got("Y") == ((750000L, 250000L, 100000L, 500000L, -50000L, 100000L)))
    // identity: overall_b − overall_a = Σ(mix + rate) = 300000 exactly here
    // (overall a: 80/400 = 20%; b: 200/400 = 50%)
    val sumEffects = got.values.map(v => v._5 + v._6).sum
    assert(sumEffects == 300000L)
  }

  test("abcClassification: crossing key stays A, cuts land by the before-curve") {
    // values desc: 60, 25, 10, 5 (total 100). before-cum: 0, 60, 85, 95.
    // cuts 80/95: A (0<80), A (60<80 — crosses to 85 but stays A),
    // B (85<95), C (95≥95)
    val df = Seq(("k1", 60L), ("k2", 25L), ("k3", 10L), ("k4", 5L)).toDF("k", "v")
    val got = graft.ops.Metrics.abcClassification(df, "k", col("v"),
        aCutPpm = 800000L, bCutPpm = 950000L)
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("cum_share_ppm"),
          r.getAs[String]("abc_class")))).toMap
    assert(got("k1") == ((1L, 600000L, "A")))
    assert(got("k2") == ((2L, 850000L, "A")))
    assert(got("k3") == ((3L, 950000L, "B")))
    assert(got("k4") == ((4L, 1000000L, "C")))
  }

  test("seasonalResidualOutliers: weekend swing is baseline, true spike flags") {
    // epoch day 0 = Thursday (dow 4 under the +4 rule → ((0+4)%7)=4).
    // Build 6 weeks: weekdays value 100, saturdays value 500 — a raw MAD
    // fence would flag every saturday; seasonally adjusted, none flag.
    // One true anomaly: a weekday at 10000.
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day.toLong * 86400 + 7200))
    val rows = (0 until 42).map { d =>
      val dow = (d + 4) % 7
      val v = if (dow == 6) 500L else 100L
      ("m", d.toLong, ts(d), v)
    } :+ (("m", 100L, ts(14), 10000L)) // extra weekday reading, wildly high
    val df = rows.toDF("k", "id", "ts", "v")
    val got = graft.ops.Outliers.seasonalResidualOutliers(df, Seq("k"), "ts", col("v"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("residual"),
        r.getAs[Boolean]("is_outlier")))
    val flagged = got.filter(_._3).map(_._1).toSet
    assert(flagged == Set(100L), s"flagged: $flagged")
    // every saturday's residual is 0 — fully explained by the baseline
    assert(got.filter(t => t._1 != 100L && t._1 % 7 == 2).forall(_._2 == 0L))
  }

  test("decileMigration: flows, entries and exits on a hand-built ranking") {
    // period a: users 1..10 with values 100..1000 (u10 top) → deciles 0..9
    // period b: u10 crashes to the bottom, u1..u9 shift up one value slot,
    // u11 enters, u5 exits
    val pa = (1 to 10).map(u => (s"u$u", "a", u * 100L))
    val pb = ((1 to 9).filter(_ != 5).map(u => (s"u$u", "b", u * 100L + 50L))) ++
      Seq(("u10", "b", 1L), ("u11", "b", 2000L))
    val df = (pa ++ pb).toDF("actor", "p", "cents")
    val got = graft.ops.Cohort.decileMigration(df, "actor", col("p"), "a", "b", col("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // u10: decile_a 0 (top) → decile_b 9 (bottom of 10 actors in b)
    assert(got((0L, 9L)) == 1L)
    // u11 enters at the top of b: (−1 → 0)
    assert(got((-1L, 0L)) == 1L)
    // u5 (value 500 → rank 6 of 10 in a → decile 5) exits: (5 → −1)
    assert(got((5L, -1L)) == 1L)
    assert(got.values.sum == 11L)
  }

  test("sloBurn: hand-computed compliance and burn over the rolling window") {
    def ts(day: Int, i: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day.toLong * 86400 + i * 60))
    // day 0: 10 reqs, 1 bad → 90%; day 1: 10 reqs, 0 bad.
    // window(2d) at day 1: 19/20 good → 950000 ppm; objective 99% →
    // burn = 1000·50000/10000 = 5000 milli (5× budget).
    val rows = (0 until 10).map(i => ("s", ts(0, i), i != 0)) ++
      (0 until 10).map(i => ("s", ts(1, i), true))
    val df = rows.toDF("k", "ts", "good")
    val got = graft.ops.TimeSeries.sloBurn(df, Seq("k"), "ts", col("good"),
        windowDays = 2, objectivePpm = 990000L)
      .collect().map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("window_n"), r.getAs[Long]("window_good"),
          r.getAs[Long]("compliance_ppm"), r.getAs[Long]("burn_rate_milli")))).toMap
    assert(got(0L) == ((10L, 9L, 900000L, 10000L)))
    assert(got(1L) == ((20L, 19L, 950000L, 5000L)))
  }

  test("sloBurn calendarDays: zero-event days materialize and bound the window") {
    def ts(day: Int, i: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day.toLong * 86400 + i * 60))
    // Sparse series: day 0 (1 bad of 10) … gap … day 3 (10 good).
    // Active-days semantics with windowDays=2 would pair day 3 with day
    // 0 (>2 calendar days apart); calendar semantics must not.
    val rows = (0 until 10).map(i => ("s", ts(0, i), i != 0)) ++
      (0 until 10).map(i => ("s", ts(3, i), true))
    val df = rows.toDF("k", "ts", "good")
    def run(calendar: Boolean) = graft.ops.TimeSeries.sloBurn(df, Seq("k"), "ts",
        col("good"), windowDays = 2, objectivePpm = 990000L, calendarDays = calendar)
      .collect().map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("window_n"), Option(r.getAs[Any]("compliance_ppm"))))).toMap
    val active = run(calendar = false)
    assert(active(3L) == ((20L, Some(950000L)))) // day 0 leaks into day 3's "2-day" window
    val cal = run(calendar = true)
    assert(cal.keySet == Set(0L, 1L, 2L, 3L))    // gap days materialize
    assert(cal(0L) == ((10L, Some(900000L))))
    assert(cal(1L) == ((10L, Some(900000L))))    // day 0 still in the 2-day window
    assert(cal(2L) == ((0L, None)))              // empty window: NULL, not 100%
    assert(cal(3L) == ((10L, Some(1000000L))))   // day 0 correctly aged out
  }

  test("sloBurn calendarDays: a NULL key value is a real series, not zeroed") {
    def ts(day: Int, i: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day.toLong * 86400 + i * 60))
    // One keyed series and one NULL-keyed series, both sparse; the
    // densify re-join must be null-safe or the NULL key's real counts
    // silently coalesce to zero on every day.
    val rows = (0 until 4).map(i => (Some("s"), ts(0, i), true)) ++
      (0 until 6).map(i => (Option.empty[String], ts(0, i), i != 0)) ++
      (0 until 6).map(i => (Option.empty[String], ts(2, i), true))
    val df = rows.toDF("k", "ts", "good")
    val got = graft.ops.TimeSeries.sloBurn(df, Seq("k"), "ts", col("good"),
        windowDays = 2, objectivePpm = 990000L, calendarDays = true)
      .collect().map(r => (Option(r.getAs[String]("k")), r.getAs[Long]("day")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("window_n"),
          Option(r.getAs[Any]("compliance_ppm"))))).toMap
    assert(got((None, 0L)) == ((6L, 6L, Some(833333L))))
    assert(got((None, 1L)) == ((0L, 6L, Some(833333L))))  // densified gap day
    assert(got((None, 2L)) == ((6L, 6L, Some(1000000L)))) // day 0 aged out
    assert(got((Some("s"), 0L)) == ((4L, 4L, Some(1000000L))))
  }

  test("candidateKeys: exact uniqueness, null rows collide like join keys") {
    val df = Seq(
      (1, "a", Some(10)), (2, "a", Some(10)), (3, "b", None), (4, "b", None)
    ).toDF("id", "g", "v")
    val got = graft.ops.Audit.candidateKeys(df,
        Seq(Seq("id"), Seq("g"), Seq("g", "v")))
      .collect().map(r => r.getAs[String]("columns") ->
        ((r.getAs[Long]("n_distinct"), r.getAs[Long]("uniqueness_ppm"),
          r.getAs[Long]("n_collisions")))).toMap
    assert(got("id") == ((4L, 1000000L, 0L)))
    assert(got("g") == ((2L, 500000L, 2L)))
    // the two (b, NULL) rows collide — NULL is a value here
    assert(got("g,v") == ((2L, 500000L, 2L)))
  }

  test("candidateKeys: approxDistinct path (no Expand) agrees at small cardinality") {
    val df = Seq((1, "a"), (2, "a"), (3, "b"), (4, "b")).toDF("id", "g")
    def run(approx: Boolean) = graft.ops.Audit
      .candidateKeys(df, Seq(Seq("id"), Seq("g")), approxDistinct = approx)
      .collect().map(r => r.getAs[String]("columns") -> r.getAs[Long]("n_distinct")).toMap
    // HLL++ is exact at these cardinalities, so the paths must agree;
    // the approx plan additionally must NOT contain an Expand.
    assert(run(approx = true) == run(approx = false))
    val approxPlan = graft.ops.Audit
      .candidateKeys(df, Seq(Seq("id"), Seq("g")), approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), s"approx path should not Expand:\n$approxPlan")
  }

  test("audit unpivots survive hostile column names (quotes, backticks, dots)") {
    val hostile = Seq((1, Some(10), "x"), (2, None, "y"))
      .toDF("it's", "a`b", "c.d")
    val ck = graft.ops.Audit.candidateKeys(hostile, Seq(Seq("it's"), Seq("a`b", "c.d")))
      .collect().map(r => r.getAs[String]("columns") -> r.getAs[Long]("n_distinct")).toMap
    assert(ck("it's") == 2L && ck("a`b,c.d") == 2L)
    val cm = graft.ops.Audit.coMissingness(hostile, Seq("it's", "a`b"))
      .head()
    assert(cm.getAs[String]("col_a") == "it's" && cm.getAs[String]("col_b") == "a`b"
      && cm.getAs[Long]("null_b") == 1L)
    val ts = graft.ops.Audit.typeSniff(hostile, Seq("it's", "a`b", "c.d"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ts(("it's", "int")) == 2L && ts(("a`b", "null")) == 1L && ts(("c.d", "other")) == 2L)
    val cd = graft.ops.Audit.columnDrift(hostile, hostile, Seq("it's", "a`b"))
      .collect().map(r => r.getAs[String]("column_name") -> r.getAs[Long]("distinct_a")).toMap
    assert(cd("it's") == 2L && cd("a`b") == 1L)
  }

  test("centroidSeparation: hand-computed quantized means and distances") {
    // label 0: vectors (1, 0) and (0, 1) → means (500, 500)
    // label 1: (1, 1), (1, 1) → (1000, 1000); label 2: (-1, 0) → (-1000, 0)
    val rows = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(0.0f, 1.0f)),
      (1, Array(1.0f, 1.0f)), (1, Array(1.0f, 1.0f)),
      (2, Array(-1.0f, 0.0f)))
    val got = graft.ops.Similarity.centroidSeparation(rows.toDF("label", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // d²(0,1) = 500² + 500² = 500000; d²(0,2) = 1500² + 500² = 2500000
    // d²(1,2) = 2000² + 1000² = 5000000
    assert(got((0L, 1L)) == ((2L, 500000L)))
    assert(got((0L, 2L)) == ((2L, 2500000L)))
    assert(got((1L, 2L)) == ((2L, 5000000L)))
  }

  test("bursts: flags exactly the row completing k-in-window, rollup counts") {
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val df = Seq(
      // u1 click: 3 events inside 5s → one burst end at t=4; a 4th at
      // t=100 does NOT extend (its lag(2) is t=2 → 98s gap)
      ("u1", "click", ts(0)), ("u1", "click", ts(2)), ("u1", "click", ts(4)),
      ("u1", "click", ts(100)),
      // u1 view: only 2 events — never a burst at k=3
      ("u1", "view", ts(0)), ("u1", "view", ts(1)),
      // u2 click: 3 events but spread over 20s
      ("u2", "click", ts(0)), ("u2", "click", ts(10)), ("u2", "click", ts(20))
    ).toDF("user_id", "t", "ts")
    val flags = graft.ops.TimeSeries.bursts(df, Seq("user_id"), col("t"), "ts",
        k = 3, windowSec = 5L)
      .collect().map(r => (r.getAs[String]("user_id"), r.getAs[String]("t"),
        r.getAs[java.sql.Timestamp]("ts").toInstant.getEpochSecond,
        r.getAs[Boolean]("is_burst_end")))
    assert(flags.count(_._4) == 1)
    assert(flags.find(_._4).get._3 == 4L)
  }

  test("vocabRetention: drops, entries and the cliff a source swap makes") {
    // p0: {a,b,c}; p1: {a,b,d}; p2: {x,y} (source swapped)
    val rows = Seq((0L, "a"), (0L, "b"), (0L, "c"), (1L, "a"), (1L, "b"),
      (1L, "d"), (2L, "x"), (2L, "y"))
    val got = graft.ops.Lexical.vocabRetention(rows.toDF("p", "t"), col("p"), col("t"))
      .collect().map(r => r.getAs[Long]("period") ->
        ((r.getAs[Long]("prev_vocab"), r.getAs[Long]("retained"), r.getAs[Long]("dropped"),
          r.getAs[Long]("entered"), r.getAs[Long]("retention_ppm")))).toMap
    assert(got(1L) == ((3L, 2L, 1L, 1L, 666666L)))
    assert(got(2L) == ((3L, 0L, 3L, 2L, 0L)))      // the cliff
    assert(got(3L) == ((2L, 0L, 2L, 0L, 0L)))      // horizon row: all drop
  }

  test("naturalBreaks: boundaries at the widest gaps, deterministic ties") {
    // values 1,2,3, 10,11, 50: gaps 1,1,7,1,39 → k=3 boundaries at 39 (11→50)
    // and 7 (3→10)
    val df = Seq(1L, 2L, 3L, 10L, 11L, 50L, 50L).toDF("v")
    val got = graft.ops.Normalize.naturalBreaks(df, col("v"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 3L, 10L, 7L), (2L, 11L, 50L, 39L)))
  }

  test("halfVocabOverlap: restated halves near 1e6, disjoint halves 0, odd splits") {
    val df = Seq(
      (1L, "a b c a b c"),         // halves {a,b,c}/{a,b,c} → 1e6
      (2L, "a b c d e f"),         // disjoint → 0
      (3L, "x y z x w"),           // 5 words: front {x,y}, back {z,x,w} → 1/4
      (4L, "")                     // empty → union 0 → NULL
    ).toDF("doc_id", "text")
    val got = graft.ops.Lexical.halfVocabOverlap(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.getAs[Any]("overlap_ppm"))))).toMap
    assert(got(1L) == ((6L, 3L, 3L, 3L, Some(1000000L))))
    assert(got(2L) == ((6L, 3L, 3L, 0L, Some(0L))))
    assert(got(3L) == ((5L, 2L, 3L, 1L, Some(250000L))))
    assert(got(4L)._5.isEmpty)
  }

  test("silences: gaps, threshold counts, silent-now at the horizon") {
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day.toLong * 86400 + 3600))
    // u1 active days 0,1,5,6 (gap 4 once); u2 active day 0 only →
    // silent at horizon 6; u3 active 5,6 → alive
    val df = Seq(("u1", ts(0)), ("u1", ts(1)), ("u1", ts(5)), ("u1", ts(6)),
      ("u2", ts(0)), ("u3", ts(5)), ("u3", ts(6))).toDF("user_id", "ts")
    val got = graft.ops.TimeSeries.silences(df, Seq("user_id"), "ts", thresholdDays = 2L)
      .collect().map(r => r.getAs[String]("user_id") ->
        ((r.getAs[Long]("n_active_days"), r.getAs[Long]("last_seen_day"),
          r.getAs[Long]("max_gap_days"), r.getAs[Long]("n_silences"),
          r.getAs[Boolean]("silent_now")))).toMap
    assert(got("u1") == ((4L, 6L, 4L, 1L, false)))
    assert(got("u2") == ((1L, 0L, 0L, 0L, true)))
    assert(got("u3") == ((2L, 6L, 1L, 0L, false)))
  }

  test("reconcileTotals: exact match, mismatch ppm, childless parent, zero parent") {
    val parent = Seq((1L, 1000L), (2L, 1000L), (3L, 500L), (4L, 0L))
      .toDF("pk", "amt")
    val child = Seq((1L, 600L), (1L, 400L), (2L, 900L), (4L, 7L)).toDF("ck", "amt")
    val got = graft.ops.Audit.reconcileTotals(parent, "pk", col("amt"),
        child, "ck", col("amt"), tolerancePpm = 0L)
      .collect().map(r => r.getAs[Long]("pk") ->
        ((r.getAs[Long]("child_sum"), r.getAs[Long]("diff"),
          r.getAs[Long]("mismatch_ppm"), r.getAs[Boolean]("reconciled")))).toMap
    assert(got(1L) == ((1000L, 0L, 0L, true)))
    assert(got(2L) == ((900L, 100L, 100000L, false)))
    assert(got(3L) == ((0L, 500L, 1000000L, false)))    // childless parent
    assert(got(4L) == ((7L, -7L, 1000000L, false)))     // zero parent, nonzero child
  }

  test("releaseGate: clean corpus passes, each defect trips its own check") {
    val clean = (1 to 20).map(i => (s"unique text $i", s"s${i % 4}")).toDF("text", "src")
    val g1 = graft.ops.Audit.releaseGate(clean, col("text"), col("src"))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("pass")).toMap
    assert(g1.size == 4 && g1.values.forall(identity), s"clean corpus failed: $g1")
    // 50% duplicates trip the dup check and ONLY it
    val dupey = ((1 to 10).map(i => (s"text $i", "s1")) ++
      (1 to 10).map(_ => ("same text", "s2"))).toDF("text", "src")
    val g2 = graft.ops.Audit.releaseGate(dupey, col("text"), col("src"))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("pass")).toMap
    assert(!g2("exact_dup_ppm") && g2("empty_doc_ppm"))
    // a single-source corpus trips concentration
    val mono = (1 to 20).map(i => (s"t $i", "only")).toDF("text", "src")
    val g3 = graft.ops.Audit.releaseGate(mono, col("text"), col("src"))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("pass")).toMap
    assert(!g3("source_hhi_ppm") && g3("exact_dup_ppm"))
  }
}

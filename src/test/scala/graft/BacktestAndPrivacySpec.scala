package graft

import org.apache.spark.sql.functions._
import graft.ops.{Audit, GraphMetrics, TimeSeries}

/** Round-4 additions: local clustering coefficient, seasonal-naive
  * backtest, l-diversity audit.
  */
class BacktestAndPrivacySpec extends SparkSpec {
  import spark.implicits._

  test("localClustering: clique is 1e6, star is 0, missing-triangle nodes are 0") {
    // 4-clique: every node deg 3, 3 triangles each → coefficient exactly 1
    val clique = (for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong))
      .toDF("a_id", "b_id")
    val cq = GraphMetrics.localClustering(clique).collect()
    assert(cq.length == 4)
    assert(cq.forall(r => r.getAs[Long]("deg") == 3 &&
      r.getAs[Long]("n_triangles") == 3 &&
      r.getAs[Long]("clustering_ppm") == 1000000L))

    // star: center 0 with leaves 1..3 — no closed wedge anywhere
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a_id", "b_id")
    val st = GraphMetrics.localClustering(star).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(st(0L).getAs[Long]("deg") == 3 && st(0L).getAs[Long]("clustering_ppm") == 0L)
    assert(st(1L).getAs[Long]("deg") == 1 && st(1L).getAs[Long]("clustering_ppm") == 0L)

    // triangle + pendant: node 0 in the triangle plus an edge to 3 —
    // deg 3, 1 triangle → 2·1/(3·2) = 333333 truncated
    val tp = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L)).toDF("a_id", "b_id")
    val got = GraphMetrics.localClustering(tp).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("clustering_ppm")).toMap
    assert(got(0L) == 333333L && got(1L) == 1000000L && got(3L) == 0L)
  }

  test("seasonalBacktest: dow profile, fallback, and signed bias") {
    // train week: Mon Jan 1 2024 = 10, Tue Jan 2 = 20 (one obs each);
    // test: Mon Jan 8 = 13 (err 3), Tue Jan 9 = 17 (err −3),
    // Wed Jan 10 = 40 → dow unseen → fallback (10+20) div 2 = 15, err 25
    val df = Seq(
      ("a", "2024-01-01 12:00:00", 10L), ("a", "2024-01-02 12:00:00", 20L),
      ("a", "2024-01-08 12:00:00", 13L), ("a", "2024-01-09 12:00:00", 17L),
      ("a", "2024-01-10 12:00:00", 40L))
      .toDF("k", "s", "v").withColumn("ts", to_timestamp(col("s")))
    val r = TimeSeries.seasonalBacktest(df, "k", "ts", "v", "2024-01-08 00:00:00").head()
    assert(r.getAs[Long]("n_train") == 2 && r.getAs[Long]("n_test") == 3)
    assert(r.getAs[Long]("sae") == 3 + 3 + 25)
    assert(r.getAs[Long]("mae") == 31 / 3)
    assert(r.getAs[Long]("bias") == (3 - 3 + 25) / 3)

    // negative bias truncates toward zero: single test err −5 over 3 rows
    // would floor to −2 under // — the contract is −1
    val neg = Seq(
      ("b", "2024-01-01 12:00:00", 10L),
      ("b", "2024-01-08 12:00:00", 9L), ("b", "2024-01-08 13:00:00", 8L),
      ("b", "2024-01-08 14:00:00", 8L))
      .toDF("k", "s", "v").withColumn("ts", to_timestamp(col("s")))
    val rb = TimeSeries.seasonalBacktest(neg, "k", "ts", "v", "2024-01-08 00:00:00").head()
    assert(rb.getAs[Long]("sae") == 1 + 2 + 2)
    assert(rb.getAs[Long]("bias") == -1L) // (−5) div 3 toward zero

    // a key with no train rows emits nothing
    val noTrain = Seq(("c", "2024-01-08 12:00:00", 1L))
      .toDF("k", "s", "v").withColumn("ts", to_timestamp(col("s")))
    assert(TimeSeries.seasonalBacktest(noTrain, "k", "ts", "v", "2024-01-08 00:00:00").isEmpty)
  }

  test("lDiversity: homogeneous classes flagged, NULL counts as a value") {
    val df = Seq(
      ("g1", Some("x")), ("g1", Some("x")), ("g1", Some("y")),
      ("g2", Some("x")), ("g2", Some("y")), ("g2", Some("z")),
      ("g3", None), ("g3", Some("x")))
      .toDF("q", "s")
    val got = Audit.lDiversity(df, Seq("q"), "s", l = 3).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("g1").getAs[Long]("n_sensitive") == 2 && got("g1").getAs[Long]("violates") == 1)
    assert(got("g2").getAs[Long]("n_sensitive") == 3 && got("g2").getAs[Long]("violates") == 0)
    // NULL is one distinct sensitive value
    assert(got("g3").getAs[Long]("n_sensitive") == 2 && got("g3").getAs[Long]("group_size") == 2)
  }

  test("trimmedStats drops exactly ⌊n·trim⌋ per side and survives boundary ties") {
    // 10 values: trim 10% each side drops min and max exactly
    val df = (1L to 10L).map(v => ("g", v * 10)).toDF("g", "v")
    val r = graft.ops.Outliers.trimmedStats(df, Seq("g"), "v", trimPpm = 100000L).head()
    assert(r.getAs[Long]("n") == 10 && r.getAs[Long]("n_kept") == 8)
    assert(r.getAs[Long]("trimmed_sum") == (2L to 9L).map(_ * 10).sum)
    assert(r.getAs[Long]("trimmed_mean") == (2L to 9L).map(_ * 10).sum / 8)

    // tied values at the trim boundary: dropping either tie yields the
    // same sum — determinism without a tiebreak column
    val tied = Seq(("g", 1L), ("g", 5L), ("g", 5L), ("g", 5L), ("g", 9L))
      .toDF("g", "v")
    val rt = graft.ops.Outliers.trimmedStats(tied, Seq("g"), "v", trimPpm = 200000L).head()
    assert(rt.getAs[Long]("n_kept") == 3 && rt.getAs[Long]("trimmed_sum") == 15L)

    // trim 0 keeps everything
    val all = graft.ops.Outliers.trimmedStats(df, Seq("g"), "v", trimPpm = 0L).head()
    assert(all.getAs[Long]("n_kept") == 10)
  }

  test("diffInDiff: hand-computed 2x2 and the missing-cell guard") {
    import org.apache.spark.sql.functions.{col => c}
    // treat pre mean 10, post 25 (Δ15); control pre 20, post 22 (Δ2) → did 13
    val df = Seq(
      (1L, false, 10L), (1L, false, 10L), (1L, true, 25L),
      (0L, false, 20L), (0L, true, 22L), (0L, true, 22L))
      .toDF("u", "post", "v")
    val r = graft.ops.Cohort.diffInDiff(df, c("u") === 1L, c("post"), "v").head()
    assert(r.getAs[Long]("m_t_pre") == 10 && r.getAs[Long]("m_t_post") == 25)
    assert(r.getAs[Long]("m_c_pre") == 20 && r.getAs[Long]("m_c_post") == 22)
    assert(r.getAs[Long]("did") == 13L)

    // an empty cell (no control-post rows) drops the row entirely
    val broken = Seq((1L, false, 10L), (1L, true, 25L), (0L, false, 20L))
      .toDF("u", "post", "v")
    assert(graft.ops.Cohort.diffInDiff(broken, c("u") === 1L, c("post"), "v").isEmpty)
  }

  test("seasonalBacktest plan: profile and fallback broadcast, no row re-shuffle") {
    val df = Seq(("a", "2024-01-01 12:00:00", 10L), ("a", "2024-01-08 12:00:00", 13L))
      .toDF("k", "s", "v").withColumn("ts", to_timestamp(col("s")))
    val plan = TimeSeries.seasonalBacktest(df, "k", "ts", "v", "2024-01-08 00:00:00")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("spearman: hand-computed rho incl. the negative truncating-division branch") {
    import graft.ops.Trend
    // group "neg": x ranks 1..7, y ranks (4,5,2,7,1,6,3) → Σd² = 60,
    // rho = -24/336 = -1/14 → truncate-toward-zero ppm = -71428 (floor
    // would give -71429 — this pins TRUNCATION on the negative branch,
    // matching both Spark `div` and DuckDB `//`, measured r8).
    val neg = Seq(4, 5, 2, 7, 1, 6, 3).zipWithIndex.map { case (ry, i) =>
      ("neg", (i + 1).toLong, ry.toLong, i.toLong)
    }
    // group "pos": y = x → Σd² = 0 → rho_ppm = 1000000 exactly
    val pos = (1 to 5).map(i => ("pos", i.toLong, i.toLong, (i + 100).toLong))
    val df = (neg ++ pos).toDF("g", "x", "y", "id")
    val got = Trend.spearman(df, Seq("g"), col("x"), col("y"), col("id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("neg") == ((7L, 60L, -24L, 336L, -71428L)))
    assert(got("pos") == ((5L, 0L, 120L, 120L, 1000000L)))
  }

  test("interArrivalHistogram: hand-computed gaps, cap bucket, first events excluded") {
    // u1: gaps 30s (bucket 0), 90s (bucket 1), 20min (capped at 3)
    // u2: single event -> no gap
    val df = Seq(
      ("u1", "view", "2024-01-01 10:00:00"),
      ("u1", "view", "2024-01-01 10:00:30"),
      ("u1", "click", "2024-01-01 10:02:00"),
      ("u1", "view", "2024-01-01 10:22:00"),
      ("u2", "view", "2024-01-01 10:00:00")
    ).toDF("u", "g", "s").withColumn("ts", to_timestamp(col("s")))
    val got = TimeSeries.interArrivalHistogram(df, "u", "g", "ts",
        widthSec = 60L, maxBucket = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(("view", 0L) -> 1L, ("click", 1L) -> 1L, ("view", 3L) -> 1L))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group linear trend in EXACT integer arithmetic — "is this series
  * going up or down, and how fast" over millions of groups in one
  * aggregation pass, without the cross-engine float drift of the built-in
  * `regr_slope` family (whose running sums differ in the last ulps with
  * partitioning/merge order).
  *
  * The least-squares slope over points (x, y) is
  * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`. With integer x and y, numerator
  * and denominator are exact integer aggregates — associative,
  * commutative, partitioning-independent. We emit them unscaled (plus the
  * sign) and leave the one float division to the caller's presentation
  * layer: every engine computes the identical integers.
  *
  * Scale shape: a single hash aggregation on the group key with map-side
  * partials — the cheapest possible wide shape; nothing else shuffles.
  * Precision: |numerator| ≤ n²·max|x|·max|y| — pick x as a SMALL index
  * (month number, not epoch millis) so 64-bit never overflows; with
  * n ≤ 10⁴, x ≤ 10⁴ and y ≤ 10¹⁰ cents the products stay < 2⁶³.
  */
object Trend {

  /** One row per group: `n`, `slope_num`, `slope_den` (slope =
    * num/den when den ≠ 0; den = 0 ⟺ all x equal) and `trend` ∈
    * {-1, 0, 1} = sign(slope_num) — valid because the denominator is
    * n·Var(x)·n ≥ 0, and identically-zero numerator whenever it is 0.
    */
  def linear(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
      .select(
        groupCols.map(col) ++ Seq(
          col("n"),
          (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("slope_num"),
          (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("slope_den"),
          signum(col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("long")
            .as("trend")): _*)
  }

  /** Per-group Spearman rank correlation — the monotone-association
    * screen between two columns (does token count track text length?
    * does quality track recency?), integer-exact: both columns rank by
    * `row_number` over a TIE-BROKEN total order (`tieCol` — ties take
    * the tie-break's order; the documented contract is Spearman of that
    * tie-broken permutation, which equals classic Spearman exactly when
    * values are distinct), then ρ = 1 − 6·Σd²/(n·(n²−1)) published as a
    * floor ppm plus its exact integer numerator/denominator. Groups with
    * n < 2 report null ρ. The ppm publication stays inside Long up to
    * n ≈ 2·10⁴ rows per group (10⁶·n³ < 2⁶³); beyond that consumers
    * derive ρ from the exact `(rho_num, rho_den)` pair in wider
    * arithmetic — the suff-stats, not the ppm, are the scale-safe output
    * (the q100/q157 stance).
    *
    * Scale shape: two per-group rank windows (partitioned by the group —
    * range-balanced, never a global sort) + one narrow suff-stat agg;
    * the shuffles carry (group, value, rank) triples only.
    */
  def spearman(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column,
      tieCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val g = groupCols.map(col)
    val wx = Window.partitionBy(g: _*).orderBy(xCol, tieCol)
    val wy = Window.partitionBy(g: _*).orderBy(yCol, tieCol)
    val ranked = df
      .withColumn("__rx", row_number().over(wx).cast("long"))
      .withColumn("__ry", row_number().over(wy).cast("long"))
      .withColumn("__d2", (col("__rx") - col("__ry")) * (col("__rx") - col("__ry")))
    ranked.groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(col("__d2")).as("sum_d2"))
      .withColumn("rho_num", col("n") * (col("n") * col("n") - 1) - lit(6L) * col("sum_d2"))
      .withColumn("rho_den", col("n") * (col("n") * col("n") - 1))
      // division on a possibly-negative numerator: Spark's `div` and
      // DuckDB's integer `//` BOTH truncate toward zero ((-5)/3 = -1),
      // so the plain quotient is already engine-identical. (An explicit
      // floor-toward--inf branch here would DISAGREE with the oracle's
      // `//` on negative non-exact quotients — measured r8.)
      .withColumn("rho_ppm",
        when(col("n") < 2, lit(null).cast("long"))
          .otherwise(expr("(1000000 * rho_num) div rho_den").cast("long")))
  }

  /** Rank movers between two periods: every item ranked by count within
    * each period (descending count, item tie-break) via the two-phase
    * range-partitioned ranking ([[graft.ops.Normalize.denseIds]] — per
    * period, so NO near-global two-partition window), inner-joined to
    * `(item, n_a, n_b, rank_a, rank_b, rank_delta)` — positive delta =
    * climbed. The "what's trending" diff behind leaderboard dashboards,
    * with exact deterministic ranks instead of a sampled top-N.
    *
    * Scale shape: one (period, item) count agg, two range-partitioned
    * rankings (each a balanced global sort over item-cardinality rows),
    * one item-keyed join. Item cardinality is the working set —
    * documents never move.
    */
  def rankMovers(
      df: DataFrame,
      itemCol: String,
      periodCol: Column,
      periodA: String,
      periodB: String): DataFrame = {
    val counts = df
      .where(periodCol.isin(periodA, periodB))
      .groupBy(periodCol.as("__p"), col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__neg", -col("n"))
    def ranked(p: String, out: String, nOut: String) =
      Normalize.denseIds(counts.where(col("__p") === p), "__neg", "item", out)
        .select(col("item"), col("n").as(nOut), (col(out) + 1L).as(out))
    ranked(periodA, "rank_a", "n_a")
      .join(ranked(periodB, "rank_b", "n_b"), Seq("item"))
      .withColumn("rank_delta", col("rank_a") - col("rank_b"))
  }

  /** Per-group Theil–Sen slope — the ROBUST trend estimator: the median
    * of all pairwise slopes `(y_b − y_a)/(x_b − x_a)` over pairs with
    * `x_a < x_b`. Up to ~29% of the points can be arbitrary outliers
    * before the estimate moves, where [[linear]]'s least squares chases a
    * single corrupted point — the right default for sensor/telemetry
    * trends. Slopes are published as `⌊scale·Δy/Δx⌋` (one IEEE double
    * divide + floor, bit-identical across engines); the median is the
    * LOWER median — the element at 1-based rank `⌈n_pairs/2⌉` of the
    * (slope, x_a, y_a, x_b, y_b)-ordered pair list, so ties and even
    * counts are deterministic without averaging. Groups with no
    * x-distinct pair emit nothing.
    *
    * Scale shape: the pairwise expansion is an equi-join on the GROUP
    * key (never a global cross join) — Σ_g n_g² pairs, the estimator's
    * intrinsic cost; callers with big groups pre-thin per group (the
    * classic Theil–Sen subsampling) BEFORE calling. The median is a
    * per-group rank window over the pair stream (partitioned,
    * range-balanced) + one count join — no global window.
    */
  def theilSen(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column,
      scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(scale >= 1, s"scale must be >= 1: $scale")
    // Explicit core-count partitioning on the group key (r17): the point
    // sides are skinny, so AQE coalesced the pair join to one partition
    // and the Σ n_g² slope expansion ran single-threaded (1.75 s/1 task
    // profiled at sf0.1). The join reuses the layout — no extra exchange.
    val p = df.sparkSession.sparkContext.defaultParallelism
    val pts = df.select(
      (groupCols.map(col) :+ xCol.cast("long").as("__x") :+ yCol.cast("long").as("__y")): _*)
      .repartition(p, groupCols.map(col): _*)
    val a = pts.toDF(pts.columns.map(c => if (c.startsWith("__")) s"a${c.stripPrefix("__")}" else c): _*)
    val b = pts.toDF(pts.columns.map(c => if (c.startsWith("__")) s"b${c.stripPrefix("__")}" else c): _*)
    val pairs = a.join(b, groupCols)
      .where(col("ax") < col("bx"))
      .withColumn("__slope",
        floor(lit(scale) * (col("by") - col("ay")) / (col("bx") - col("ax"))).cast("long"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__slope"), col("ax"), col("ay"), col("bx"), col("by"))
    val counts = pairs.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n_pairs"))
    pairs
      .withColumn("__rk", row_number().over(w).cast("long"))
      .join(counts, groupCols)
      .where(col("__rk") === expr("(n_pairs + 1L) div 2L"))
      .select((groupCols.map(col) :+ col("n_pairs") :+ col("__slope").as("slope_scaled")): _*)
  }

  /** Mann–Kendall trend test per group — the NON-PARAMETRIC "is this
    * series monotonically drifting" companion to [[theilSen]] (which
    * gives the magnitude, while S gives the evidence): over the
    * x-ordered points, `S = Σ_{i<j} sign(y_j − y_i)` — every pair votes
    * up/down/tie, so a single outlier moves S by at most n−1 where it
    * can move a least-squares slope arbitrarily. All-integer: S, the
    * pair count `n·(n−1)/2`, and Kendall's tau-a as truncated-ppm
    * `τ = S / pairs` (Spark `div` and DuckDB integer `//` both
    * truncate toward zero, so the plain quotient is engine-identical
    * even for negative S). Groups with a single point emit S = 0,
    * pairs = 0, tau_ppm = NULL.
    *
    * x values are REQUIRED distinct within a group (feed daily/period
    * aggregates, the op's intended diet) — equal-x pairs would be
    * order-ambiguous and are excluded by the strict `<` anyway, which
    * for distinct x is exactly the classic statistic.
    *
    * Scale shape: the pairwise expansion is an equi-join on the group
    * key over the AGGREGATED series table (days × groups, not raw
    * rows) — Σ_g n_g² pairs with n_g bounded by the observation window
    * (a year of dailies = 366 points = 67k pairs per group). The raw
    * corpus shuffles once into the per-(group, x) aggregate upstream;
    * nothing here touches it.
    */
  def mannKendall(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val pts = df.select(
      (groupCols.map(col) :+ xCol.cast("long").as("__x") :+ yCol.cast("long").as("__y")): _*)
    val a = pts.toDF(pts.columns.map(c => if (c.startsWith("__")) s"a${c.stripPrefix("__")}" else c): _*)
    val b = pts.toDF(pts.columns.map(c => if (c.startsWith("__")) s"b${c.stripPrefix("__")}" else c): _*)
    val voted = a.join(b, groupCols)
      .where(col("ax") < col("bx"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(signum(col("by") - col("ay")).cast("long")).as("s_stat"),
        count(lit(1)).as("pairs"))
    val n = pts.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n"))
    n.join(voted, groupCols, "left")
      .select((groupCols.map(col) :+ col("n") :+
        coalesce(col("s_stat"), lit(0L)).as("s_stat") :+
        coalesce(col("pairs"), lit(0L)).as("pairs")): _*)
      .withColumn("tau_ppm",
        when(col("pairs") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000 * s_stat) div pairs").cast("long")))
  }

  /** [[linear]] plus goodness of fit — the R² that says whether the
    * slope MEANS anything: `R² = num² / (den_x · den_y)` with
    * `num = n·Σxy − Σx·Σy`, `den_x = n·Σxx − (Σx)²`,
    * `den_y = n·Σyy − (Σy)²` — the squared Pearson correlation, so no
    * square root is ever taken; the single division runs in doubles in
    * one pinned order and publishes floor-ppm (num² can pass 2⁶³, the
    * 53-bit double mantissa is the same last-mile precision class as
    * the division itself). Constant x or constant y ⇒ r2_ppm NULL.
    * Same overflow posture as [[linear]]: keep x a small index.
    */
  def linearFit(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
      .withColumn("slope_num", col("n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("slope_den", col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__dy", col("n") * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("r2_ppm",
        when(col("slope_den") <= 0 || col("__dy") <= 0, lit(null).cast("long"))
          .otherwise(floor(lit(1000000.0) * col("slope_num") * col("slope_num") /
            (col("slope_den").cast("double") * col("__dy"))).cast("long")))
      .select((groupCols.map(col) :+ col("n") :+ col("slope_num") :+
        col("slope_den") :+ col("r2_ppm")): _*)
  }
}

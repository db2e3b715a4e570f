package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tukey-fence (IQR) outlier detection over integer metrics — the robust
  * anomaly screen a corpus pipeline runs on per-entity activity counts
  * (a crawler gone hot, a spam user, a duplicated feed) before letting
  * the entities into training data.
  *
  * Why quartiles, not z-scores: mean/stddev are themselves dragged by the
  * outliers they're meant to find, and cross-engine float summation order
  * makes them non-portable to oracle. Discrete quartiles over integers
  * are exact, order-independent and robust.
  *
  * Scale shape: quartiles come from `approx_percentile` — a bounded
  * GK-style sketch that merges map-side (never buffers a group's values,
  * unlike exact `percentile` — q36's documented scale trap). With
  * `accuracy` above the group size the sketch degenerates to exact
  * discrete quantiles (rank error < 1), which is what makes the DuckDB
  * `quantile_disc` oracle land value-exact; at 100 TB the SAME code with
  * default accuracy keeps working with bounded memory, trading exactness
  * for ε-rank error. Flagging is a broadcast join of k quartile rows back
  * onto the values.
  */
object Outliers {

  /** Rows of `values` whose integer `valueCol` lies above the upper Tukey
    * fence of its `groupCols` group: v > Q3 + 1.5·IQR, evaluated in exact
    * integer arithmetic as 2·v > 2·Q3 + 3·(Q3 − Q1).
    *
    * @param accuracy approx_percentile accuracy; leave the large default
    *                 for exact quartiles on ≤100k-per-group data, lower
    *                 it for sketch-mode at scale
    */
  def upperIqr(
      values: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      accuracy: Int = 10000000): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val q = values.groupBy(groupCols.map(col): _*)
      .agg(approx_percentile(col(valueCol), array(lit(0.25), lit(0.75)), lit(accuracy)).as("__q"))
      .select(groupCols.map(col) :+ col("__q")(0).as("q1") :+ col("__q")(1).as("q3"): _*)
    values
      .join(broadcast(q), groupCols)
      .where(lit(2) * col(valueCol) > lit(2) * col("q3") + lit(3) * (col("q3") - col("q1")))
  }

  /** Rolling z-score anomaly flags over an ordered per-key integer series
    * — "is this value > z standard deviations from its own trailing
    * window?" — evaluated ENTIRELY in integer arithmetic so the flag is
    * exact and portable: with trailing sum s and sum-of-squares q over
    * exactly n prior rows, `(x−s/n)² > z²·(n·q−s²)/n²` rearranges to
    * `(n·x − s)² > z²·(n·q − s²)`, all integers.
    *
    * Emits one row per input row that has a FULL n-row trailing window
    * (current row excluded from its own baseline — an anomaly must not
    * dilute the statistics it is judged against), with the flag and the
    * integer moments for downstream thresholds.
    *
    * Scale shape: one shuffle+sort per key (any per-key windowed metric
    * pays exactly this), two running-frame aggregates on that single
    * sort, zero joins. Magnitude guard: |value| ≤ ~3·10⁶ and n ≤ ~10³
    * keep n·q and (n·x−s)² inside Long; the require below enforces the
    * window half of that contract.
    */
  def rollingZ(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      valueCol: String,
      n: Int,
      z: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(n >= 2 && n <= 1000, s"window size must be in [2, 1000]: $n")
    require(z >= 1, s"z must be >= 1: $z")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(-n, -1)
    val v = col(valueCol).cast("long")
    df
      .withColumn("__s", sum(v).over(w))
      .withColumn("__q", sum(v * v).over(w))
      .withColumn("__n", count(v).over(w))
      .where(col("__n") === n)
      .withColumn("is_anomaly",
        (lit(n) * v - col("__s")) * (lit(n) * v - col("__s")) >
          lit(z.toLong * z) * (lit(n) * col("__q") - col("__s") * col("__s")))
      .drop("__n")
      .withColumnRenamed("__s", "win_sum")
      .withColumnRenamed("__q", "win_sumsq")
  }

  /** Integer CUSUM changepoint score per key: over the ordered series
    * x₁..xₙ, the classic cumulative deviation Sₜ = Σᵢ≤ₜ(xᵢ − x̄) peaks at
    * the most likely single changepoint. Kept exact by scaling by n:
    * `n·Sₜ = n·cumₜ − t·total` (all Longs), so the score and argmax are
    * portable across engines — no float mean, no accumulation-order
    * drift.
    *
    * Emits per key: `n_points`, `cusum_score = maxₜ |n·Sₜ|`, and
    * `cp_pos` — the 1-based position of the peak (earliest on ties, a
    * deterministic tiebreak via max_by on (score, −t)).
    *
    * Scale shape: one shuffle+sort per key (window), then a narrow agg
    * on the same partitioning — exchange reuse, no join. Magnitude
    * guard: n·cum needs n·Σ|x| < 2⁶³ — with cents ≤ 10⁶ that is ~10⁴
    * points per key at full headroom.
    */
  /** Median/MAD robust outlier flags — the heavier-tailed complement to
    * [[upperIqr]]: per group, the (lower) median `med`, the median
    * absolute deviation `mad = median(|x − med|)`, and a flag for rows
    * with `|x − med| > k·mad`. Lower (discrete) medians keep every number
    * an exact integer — order-independent and engine-portable, where the
    * interpolated median and float stddev are neither.
    *
    * Scale shape: each median is one `(group, value)` map-side-combined
    * count plus a window over the DISTINCT-value table (value-cardinality
    * sized, not row-sized), and each joins back as a broadcast
    * group-cardinality table; the rows themselves never shuffle. Two
    * medians → two such passes, both over integer counts.
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Long = 3L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    def lowerMedian(in: DataFrame, vCol: String, out: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val perValue = in.groupBy((groupCols :+ vCol).map(col): _*)
        .agg(count(lit(1)).as("__w"))
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(vCol))
      val wAll = Window.partitionBy(groupCols.map(col): _*)
      perValue
        .withColumn("__cum", sum(col("__w")).over(w))
        .withColumn("__tot", sum(col("__w")).over(wAll))
        .groupBy(groupCols.map(col): _*)
        .agg(min(when(lit(2) * col("__cum") >= col("__tot"), col(vCol))).as(out))
    }
    val v = col(valueCol).cast("long")
    val base = df.withColumn("__v", v)
    val med = lowerMedian(base, "__v", "med")
    val withMed = base.join(broadcast(med), groupCols)
      .withColumn("__dev", abs(col("__v") - col("med")))
    val mad = lowerMedian(withMed, "__dev", "mad")
    withMed.join(broadcast(mad), groupCols)
      .withColumn("is_outlier", col("__dev") > lit(k) * col("mad"))
      .drop("__v", "__dev")
  }

  /** Seasonality-aware outliers: [[madOutliers]] after removing each
    * key's day-of-week baseline — a Saturday dip is NORMAL for a
    * weekday-heavy metric, and a raw MAD fence either flags every
    * weekend or misses true anomalies hiding inside the weekly swing.
    * Baseline = exact lower-median per (key, dow) (engine-neutral
    * `pmod(epoch_day+4, 7)` dow ints); residual = value − baseline;
    * then the per-key lower-median/MAD fence on residuals. All element
    * picks, no floats; `mad = 0` degenerates to "any nonzero deviation
    * flags", which is what a constant-baseline series means.
    *
    * Scale shape: two grouped lower-median passes (each a per-group
    * value-cardinality agg + pick) with broadcast joins back — the
    * [[madOutliers]] scale contract, once per level.
    */
  def seasonalResidualOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: Column,
      k: Long = 3L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val base = df
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__dow",
        expr(s"pmod(unix_millis(cast($tsCol as timestamp)) div 1000 div 86400 + 4, 7)"))
    val seasonKeys = keyCols :+ "__dow"
    def lowerMedian(in: DataFrame, grp: Seq[String], vCol: String, out: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val perValue = in.groupBy((grp :+ vCol).map(col): _*)
        .agg(count(lit(1)).as("__w"))
      val w = Window.partitionBy(grp.map(col): _*).orderBy(col(vCol))
      val wAll = Window.partitionBy(grp.map(col): _*)
      perValue
        .withColumn("__cum", sum(col("__w")).over(w))
        .withColumn("__tot", sum(col("__w")).over(wAll))
        .groupBy(grp.map(col): _*)
        .agg(min(when(lit(2) * col("__cum") >= col("__tot"), col(vCol))).as(out))
    }
    val seasonal = lowerMedian(base, seasonKeys, "__v", "baseline")
    val withResid = base.join(broadcast(seasonal), seasonKeys)
      .withColumn("residual", col("__v") - col("baseline"))
    val medR = lowerMedian(withResid, keyCols, "residual", "med_residual")
    val withDev = withResid.join(broadcast(medR), keyCols)
      .withColumn("__dev", abs(col("residual") - col("med_residual")))
    val mad = lowerMedian(withDev, keyCols, "__dev", "mad")
    withDev.join(broadcast(mad), keyCols)
      .withColumn("is_outlier",
        when(col("mad") === 0, col("__dev") > 0)
          .otherwise(col("__dev") > lit(k) * col("mad")))
      .drop("__v", "__dev", "__dow")
  }

  def cusum(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val v = col(valueCol).cast("long")
    df
      .withColumn("__t", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(v).over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__tot", sum(v).over(wAll))
      .withColumn("__s", abs(col("__n") * col("__cum") - col("__t") * col("__tot")))
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(col("__n")).as("n_points"),
        max(col("__s")).as("cusum_score"),
        max_by(col("__t"), struct(col("__s"), -col("__t"))).as("cp_pos"))
  }

  /** Symmetric trimmed statistics per group: drop the
    * `⌊n·trimPpm/10⁶⌋` smallest and largest values by rank, report the
    * surviving count, sum, and floor-mean — the robust location
    * estimate that, unlike [[madOutliers]]' flagging, produces the
    * cleaned aggregate itself (the "mean excluding the junk tails"
    * a quality dashboard plots). Ranking is by value only: tied values
    * at a trim boundary are interchangeable (equal values contribute
    * equally to the sum), so the result is deterministic without a
    * tie-break column. Values must be non-negative integers (floor-mean
    * via `div`; pre-scale currency to cents).
    *
    * Scale shape: one per-group sort (row_number) + count window on the
    * same sort, then a map-side-combinable aggregation — the same
    * single-shuffle cost as any exact per-group order statistic.
    */
  def trimmedStats(
      values: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      trimPpm: Long): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(trimPpm >= 0 && trimPpm < 500000L,
      s"trimPpm must be in [0, 500000): $trimPpm")
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*).orderBy(col("__v"))
    val wn = Window.partitionBy(gs: _*)
    values
      .select(gs :+ col(valueCol).cast("long").as("__v"): _*)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("__cut", expr(s"(__n * $trimPpm) div 1000000"))
      .where(col("__rk") > col("__cut") && col("__rk") <= col("__n") - col("__cut"))
      .groupBy(gs: _*)
      .agg(max(col("__n")).as("n"),
        count(lit(1)).as("n_kept"),
        sum(col("__v")).as("trimmed_sum"))
      .withColumn("trimmed_mean", expr("trimmed_sum div n_kept"))
  }

  /** Bivariate Mahalanobis outlier scoring — the multivariate screen the
    * univariate detectors ([[madOutliers]], [[rollingZ]]) cannot do: a
    * point that is unremarkable on each axis but violates their
    * CORRELATION (high spend with low engagement) scores high. For
    * integer columns (x, y), with one global pass of exact integer
    * sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy) and the scaled
    * deviations `u = n·x − Σx`, `v = n·y − Σy` and co-moments
    * `Cxx = n·Σxx − Σx²` (etc.), the squared Mahalanobis distance under
    * the sample covariance is
    * `d² = (n−1)/n · (u²·Cyy − 2uv·Cxy + v²·Cxx) / (Cxx·Cyy − Cxy²)`,
    * published as `⌊1000·d²⌋`. All integer aggregates are exact; the
    * final products/divide run in doubles with one pinned operation
    * order, so every IEEE engine reproduces the identical milli values
    * (int→double conversions round identically). Thresholding is the
    * caller's: d² ~ χ²₂ under normality, so `d2_milli ≥ 9210` ≈ the 1%
    * tail.
    *
    * Magnitude posture: exactness of the double last mile needs the long
    * co-moments to stay ≲ 2⁵³ for exact conversion — n·Σxx < 9·10¹⁵,
    * i.e. feed DOLLARS not micro-cents at n ~ 10⁶ (the [[Trend.linear]]
    * suff-stat stance). Beyond 2⁵³ both engines still agree (identical
    * rounding), but the milli floor is then a rounded, not exact, d².
    *
    * Scale shape: one map-side-combinable aggregation, broadcast back as
    * six literals onto a map-only scoring scan — nothing but the
    * suff-stat shuffle moves; the scoring never shuffles at all.
    */
  def mahalanobis2d(
      df: DataFrame,
      idCol: String,
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column): DataFrame = {
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    val base = df.select(col(idCol), x.as("__x"), y.as("__y"))
    val stats = base.agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(col("__x") * col("__y")).as("__sxy"))
    base.crossJoin(broadcast(stats))
      .withColumn("__u", col("__n") * col("__x") - col("__sx"))
      .withColumn("__v", col("__n") * col("__y") - col("__sy"))
      .withColumn("__cxx", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__cyy", col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("__cxy", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      // doubles from here, pinned order:
      // num = u·u·Cyy − 2·u·v·Cxy + v·v·Cxx ; det = Cxx·Cyy − Cxy·Cxy
      .withColumn("__num",
        col("__u").cast("double") * col("__u") * col("__cyy")
          - lit(2.0) * col("__u") * col("__v") * col("__cxy")
          + col("__v").cast("double") * col("__v") * col("__cxx"))
      .withColumn("__det",
        col("__cxx").cast("double") * col("__cyy") - col("__cxy").cast("double") * col("__cxy"))
      .select(col(idCol), col("__x").as("x"), col("__y").as("y"),
        floor(lit(1000.0) * ((col("__n") - 1L).cast("double") * col("__num"))
          / (col("__n").cast("double") * col("__det"))).cast("long").as("d2_milli"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conditional-count aggregation + zero-filled metric struct per client
  * (SURVEY §2.5 A3 + A4).
  */
object Metrics {

  /** Count RETRY / TIMEOUT / ERROR log events per client over the
    * correlated (clientId, logEventType) rows (reference
    * `src/batch_tlb.py:72-77`). `sum(when(..))` compiles to a partial +
    * final hash aggregate — map-side combine for free.
    */
  def conditionalCounts(correlated: DataFrame, key: String = "clientId"): DataFrame =
    correlated
      .groupBy(col(key))
      .agg(
        count_if(col("logEventType") === "RETRY").as("retry_count"),
        count_if(col("logEventType") === "TIMEOUT").as("timeout_count"),
        count_if(col("logEventType") === "ERROR").as("error_count"))

  /** Zero-fill: every client in the event universe gets a row; untriggered
    * metrics stay 0 (reference defaultdict, `src/batch_tlb.py:38`; golden
    * client2 `page_view_time: 0`). Inner joins would silently drop quiet
    * clients, so the universe left-joins each metric source.
    *
    * (Deliberate simplification vs the reference artifact: the reference's
    * defaultdict only materializes clients *touched* by some metric; we
    * zero-fill every client present in the event stream, which coincides on
    * the golden fixtures and is the useful semantic.)
    */
  def zeroFill(clients: DataFrame, sessions: DataFrame, counts: DataFrame, key: String = "clientId"): DataFrame =
    clients
      .select(col(key)).distinct()
      .join(sessions, Seq(key), "left")
      .join(counts, Seq(key), "left")
      .na.fill(0.0, Seq("page_view_time"))
      .na.fill(0L, Seq("retry_count", "timeout_count", "error_count"))

  /** Categorical concentration profile: per group, the Herfindahl index
    * of `catCol`'s distribution in exact parts-per-million —
    * `hhi_ppm = ⌊1e6·Σnᵢ² / N²⌋` (1e6 = one category owns everything,
    * 1e6/k = uniform over k) — plus the category count. The
    * data-balance audit a corpus pipeline runs per language/domain
    * before training: a source monoculture shows up as a high HHI long
    * before anyone reads samples. Integer-exact where Shannon entropy
    * (the float alternative) is not portable across engines.
    *
    * Scale shape: two stacked narrow aggregations — (group, cat) counts
    * combine map-side, then collapse per group. Shuffles carry counts,
    * never rows. Magnitude guard: Σnᵢ²·1e6 needs N ≤ ~10⁸ per group for
    * Long; beyond that, pre-scale counts (HHI is scale-invariant).
    */
  def concentration(df: DataFrame, groupCols: Seq[String], catCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    df.groupBy((groupCols :+ catCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_categories"),
        sum(col("__n")).as("n_rows"),
        floor(lit(1000000L) * sum(col("__n") * col("__n")) /
          (sum(col("__n")) * sum(col("__n")))).as("hhi_ppm"))
  }

  /** Exact lower weighted median per group over integer values with
    * integer weights: the smallest value v whose cumulative weight (over
    * values ascending) reaches half the total — `2·cumw(v) ≥ totw` kept
    * in integer arithmetic so there is no half-total rounding ambiguity.
    *
    * Scale shape — two-phase bucketed selection, NOT a value-cardinality
    * window (on continuous-ish metrics like prices nearly every value is
    * distinct, so a "distinct values" window is really a row-sized sort):
    * phase 1 aggregates weights into `value >> bucketShift` coarse
    * buckets (map-side combined; shuffle and window are BUCKET-sized) and
    * finds each group's median bucket + the cumulative weight before it;
    * phase 2 rescans only rows INSIDE each group's median bucket (a
    * pushed-down filter against a broadcast group-cardinality table) and
    * runs the exact cumulative scan there — per group, that is a
    * 2^bucketShift-value window at most, regardless of total rows.
    * Arithmetic `>>` floors negatives, so bucket order matches value
    * order everywhere.
    */
  def weightedMedian(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      bucketShift: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(bucketShift >= 0 && bucketShift < 63, s"bad bucketShift: $bucketShift")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(
      (groupCols.map(col) :+ col(valueCol).cast("long").as("__v") :+
        col(weightCol).cast("long").as("__w")): _*)
      .withColumn("__b", expr(s"shiftright(__v, $bucketShift)"))
    // Phase 1: bucket weights → median bucket + exclusive prefix weight.
    val wOrd = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val buckets = base.groupBy((groupCols :+ "__b").map(col): _*)
      .agg(sum(col("__w")).as("__bw"))
      .withColumn("__bcum", sum(col("__bw")).over(wOrd))
      .withColumn("__tot", sum(col("__bw")).over(wAll))
    // min(struct) orders by the leading field — the smallest qualifying
    // bucket wins, carrying its prefix along.
    val medBucket = buckets.groupBy(groupCols.map(col): _*)
      .agg(
        min(when(lit(2) * col("__bcum") >= col("__tot"),
          struct(col("__b"), (col("__bcum") - col("__bw")).as("__prefix")))).as("__mb"),
        max(col("__tot")).as("__tot"))
      .select((groupCols.map(col) :+ col("__mb.__b").as("__b") :+
        col("__mb.__prefix").as("__prefix") :+ col("__tot")): _*)
    // Phase 2: exact scan inside the median bucket only.
    base.join(broadcast(medBucket), groupCols :+ "__b")
      .groupBy((groupCols :+ "__v").map(col): _*)
      .agg(sum(col("__w")).as("__w"), max(col("__prefix")).as("__prefix"),
        max(col("__tot")).as("__tot"))
      .withColumn("__cum", col("__prefix") + sum(col("__w")).over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col("__v"))))
      .groupBy(groupCols.map(col): _*)
      .agg(
        min(when(lit(2) * col("__cum") >= col("__tot"), col("__v")))
          .as("weighted_median"),
        max(col("__tot")).as("total_weight"))
  }

  /** Log₂-bucketed histogram per group — the corpus length-distribution
    * report (token counts span 4+ orders of magnitude; linear buckets
    * (q31) are unreadable there). Bucket is the INTEGER bit length of the
    * value (`length(bin(v))`, 0 for v ≤ 0): exact in any engine, where
    * `floor(log2(v))` would sit on a float boundary at every power of
    * two. One narrow agg with map-side partial combine.
    */
  def log2Histogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val bucket = when(col(valueCol) <= 0, lit(0))
      .otherwise(length(bin(col(valueCol).cast("long"))))
    df.withColumn("log2_bucket", bucket)
      .groupBy((groupCols :+ "log2_bucket").map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("total"),
        min(col(valueCol).cast("long")).as("lo"),
        max(col(valueCol).cast("long")).as("hi"))
  }

  /** Equi-depth (equal-frequency) histogram per group: `ntile(k)` over
    * the value ordering splits each group into k near-equal-count
    * buckets; per bucket emit `(lo, hi, n)`. The complement of the
    * fixed-width histogram (q31): bucket BOUNDARIES adapt to the data, so
    * every bar is readable even under heavy skew — and the boundaries
    * double as quantile estimates.
    *
    * Determinism contract: `tieCols` must make the ordering total —
    * ntile's assignment of equal values straddling a boundary is
    * order-dependent, and a unique sort key is what makes the same rows
    * land in the same buckets in any engine.
    *
    * Scale shape: one shuffle+sort per group for the window, then a
    * narrow count/min/max agg on the same partitioning (exchange reuse).
    * Groups sort in parallel; no group's VALUES are ever buffered (ntile
    * streams over the sorted run).
    */
  def equiDepth(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieCols: Seq[org.apache.spark.sql.Column],
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(k >= 2, s"k must be >= 2: $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol) +: tieCols: _*)
    df.withColumn("bucket", ntile(k).over(w).cast("long"))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"),
        count(lit(1)).as("n"))
  }

  /** One-pass sufficient statistics for covariance / correlation /
    * regression per group: `(n, sum_x, sum_y, sum_xx, sum_xy, sum_yy)`
    * as exact Longs. Any moment-derived statistic (Pearson r, OLS slope,
    * covariance) is a driver-side formula over these six numbers — the
    * distributed work is ONE map-side-combinable aggregation, which is
    * how a 100 TB correlation must be computed (never a second pass for
    * `x − x̄`, never float accumulation whose result depends on partition
    * order).
    *
    * Magnitude guard: per-group Σx² must stay inside Long — with |x|,|y|
    * ≤ 10⁶ that allows ~10⁶ rows per group; rescale units (dollars not
    * cents) to buy headroom, exactly like the callers here do.
    */
  def suffStats(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    df.select((groupCols.map(col) :+ x.as("__x") :+ y.as("__y")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"),
        sum(col("__y")).as("sum_y"),
        sum(col("__x") * col("__x")).as("sum_xx"),
        sum(col("__x") * col("__y")).as("sum_xy"),
        sum(col("__y") * col("__y")).as("sum_yy"))
  }

  /** All-pairs sufficient statistics over a feature list in ONE pass —
    * the input to a full correlation/covariance matrix (feature-redundancy
    * audit before training): for every unordered column pair (i < j), one
    * long-form row `(x_name, y_name, n, sum_x, sum_y, sum_xx, sum_xy,
    * sum_yy)`, all exact integers. k features cost k + k + k(k−1)/2
    * aggregate expressions in a single scan — never k² passes.
    *
    * Scale shape: one map-side-combined global aggregation to a single
    * row, then a 0-shuffle literal-array `explode` to long form (the
    * [[graft.ops.Audit.constraints]] pivot). Magnitude guard as
    * [[suffStats]]: per-column Σx² must stay inside Long.
    */
  def suffStatsMatrix(df: DataFrame, cols: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.map(_._1).distinct.size == cols.size, "column names must be unique")
    val named = cols.map { case (n, c) => n -> c.cast("long") }
    val base = df.select(named.map { case (n, c) => c.as(s"__$n") }: _*)
    val pairs = for {
      i <- named.indices; j <- named.indices if i < j
    } yield (named(i)._1, named(j)._1)
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        named.map { case (n, _) => sum(col(s"__$n")).as(s"s_$n") } ++
        named.map { case (n, _) => sum(col(s"__$n") * col(s"__$n")).as(s"ss_$n") } ++
        pairs.map { case (a, b) => sum(col(s"__$a") * col(s"__$b")).as(s"sx_${a}_$b") }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val entries = pairs.map { case (a, b) =>
      struct(lit(a).as("x_name"), lit(b).as("y_name"),
        col(s"s_$a").as("sum_x"), col(s"s_$b").as("sum_y"),
        col(s"ss_$a").as("sum_xx"), col(s"sx_${a}_$b").as("sum_xy"),
        col(s"ss_$b").as("sum_yy"))
    }
    one.select(explode(array(entries: _*)).as("p"), col("__n").as("n"))
      .select(col("p.x_name"), col("p.y_name"), col("n"),
        col("p.sum_x"), col("p.sum_y"), col("p.sum_xx"), col("p.sum_xy"),
        col("p.sum_yy"))
  }

  /** Benford first-significant-digit census of a positive integer metric:
    * counts and ppm share per leading digit 1–9 — the classic
    * fabricated-data screen (organic multiplicative quantities follow
    * log10(1+1/d); uniform or hand-typed ones don't). This op reports the
    * exact observed distribution; comparing against the Benford curve is
    * the caller's (float) business. Rows with value ≤ 0 are excluded (no
    * significant digit). One map-side-combined 9-ary aggregation.
    */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    df.where(v > 0)
      .select(substring(v.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(Window.partitionBy()))
      .withColumn("share_ppm", expr("(1000000L * n) div __tot"))
      .drop("__tot")
  }

  /** Pairwise L1 (total-variation·2) distance between per-group
    * histograms — the drift metric between two corpus snapshots or two
    * sources: with per-(group, bucket) counts, for every group pair
    * `Σ_buckets |c_a − c_b| = T_a + T_b − 2·Σ_shared min(c_a, c_b)`, so
    * only SHARED buckets ever join; buckets private to one side are
    * covered by the totals. Output also carries the distance normalized
    * by total mass (ppm) — 0 for identical histograms, 1e6 for disjoint.
    *
    * Scale shape: histogram counts are group×bucket-sized (tiny next to
    * rows); the bucket equi-join and the totals join both run on that
    * aggregated table. Output is bounded at group pairs.
    */
  def histogramDistance(
      counts: DataFrame,
      groupCol: String,
      bucketCol: String,
      countCol: String): DataFrame = {
    val a = counts.select(col(groupCol).as("group_a"), col(bucketCol).as("__b"),
      col(countCol).cast("long").as("__ca"))
    val b = counts.select(col(groupCol).as("group_b"), col(bucketCol).as("__b"),
      col(countCol).cast("long").as("__cb"))
    val sharedMin = a.join(b, Seq("__b"))
      .where(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(sum(least(col("__ca"), col("__cb"))).as("__sm"))
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col(countCol).cast("long")).as("__t"))
    // Pairs come from the (group-cardinality) totals table, NOT from the
    // shared-bucket join — two groups with fully disjoint histograms still
    // get their (maximal) distance row.
    totals.select(col(groupCol).as("group_a"), col("__t").as("__ta"))
      .crossJoin(totals.select(col(groupCol).as("group_b"), col("__t").as("__tb")))
      .where(col("group_a") < col("group_b"))
      .join(sharedMin, Seq("group_a", "group_b"), "left")
      .withColumn("__shared_min", coalesce(col("__sm"), lit(0L)))
      .select(col("group_a"), col("group_b"),
        (col("__ta") + col("__tb") - lit(2L) * col("__shared_min")).as("l1_distance"),
        expr("(1000000L * (__ta + __tb - 2L * __shared_min)) div (__ta + __tb)")
          .as("distance_ppm"))
  }

  /** Exact Gini coefficient (ppm) of category sizes per group — the
    * inequality complement to [[concentration]]'s HHI: HHI says how much
    * mass the top categories hold, Gini says how unevenly the whole
    * distribution spreads (a corpus with 1000 equal sources and one with
    * 1000 log-spread sources have similar HHI but very different Gini).
    *
    * Formula over category sizes x₁ ≤ … ≤ x_n (ascending, i = 1-based
    * rank): `G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)`, emitted as
    * `⌊1e6·G⌋` — all-integer, so exact and engine-portable. 0 = perfectly
    * equal, → 1 as one category dominates.
    *
    * Scale shape: the windowed rank runs over CATEGORY COUNTS (the
    * category table, not the rows — map-side-combined first), one sort
    * window + one narrow aggregate per group. Rank ties broken by
    * category id for determinism, though Σi·xᵢ is tie-order-invariant
    * (equal x under swapped ranks contribute the same sum).
    */
  /** Calibration (reliability) table: rows carrying an integer score in
    * ppm and a boolean outcome bucket into `bins` equal-width score bins;
    * per bin: row count, positives, observed positive rate (ppm) and the
    * mean score (ppm, floor) — the "is a 0.7 score right 70% of the
    * time" diagnostic for any scoring model feeding a selection step
    * (quality filters, dedup confidences, toxicity screens). A
    * well-calibrated scorer tracks the diagonal; a flat table means the
    * score carries no signal. Everything integer → engine-exact.
    *
    * Scale shape: one map-side-combined hash aggregation on the bin id —
    * the shuffle is `bins` rows of counters. Nothing else.
    */
  def calibrationBins(
      df: DataFrame,
      scorePpmCol: String,
      labelCol: org.apache.spark.sql.Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1: $bins")
    df
      .withColumn("bin",
        least(lit(bins.toLong - 1),
          expr(s"(${bins}L * $scorePpmCol) div 1000000L")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        count_if(labelCol).as("n_pos"),
        sum(col(scorePpmCol).cast("long")).as("__s"))
      .withColumn("pos_rate_ppm", expr("(1000000L * n_pos) div n"))
      .withColumn("mean_score_ppm", expr("__s div n"))
      .drop("__s")
  }

  /** Deterministic bucket-bootstrap spread for a mean metric: rows split
    * into `buckets` md5 buckets of their id (a pure function of the
    * data — no RNG state, rerunnable anywhere), the metric (floor-mean
    * of `valueCol`) computes per bucket, and the report is the spread of
    * those bucket means around the global mean — the poor-man's error
    * bar every pipeline metric should ship with (a metric whose bucket
    * means disagree wildly isn't stable enough to gate on). One row:
    * (n_rows, n_buckets, global_mean, bucket_mean_min, bucket_mean_max,
    * spread). All-integer.
    *
    * Scale shape: one map-side-combined hash agg to `buckets` rows, then
    * a scalar aggregate. The md5 bucket is computed in the scan
    * projection — nothing row-sized shuffles.
    */
  def bucketBootstrap(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val bucket = expr(
      s"conv(substring(md5(cast($idCol as string)), 1, 4), 16, 10) % $buckets")
    df
      .select(bucket.cast("long").as("__b"), col(valueCol).cast("long").as("__v"))
      .groupBy("__b")
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
      .withColumn("__mean", expr("__s div __n"))
      .groupBy()
      .agg(sum(col("__n")).as("n_rows"), count(lit(1)).as("n_buckets"),
        expr("sum(__s) div sum(__n)").as("global_mean"),
        min(col("__mean")).as("bucket_mean_min"),
        max(col("__mean")).as("bucket_mean_max"))
      .withColumn("spread", col("bucket_mean_max") - col("bucket_mean_min"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between two groups'
    * integer value distributions: `D = max_v |F_a(v) − F_b(v)|`,
    * computed cross-multiplied — `D_num = max |cum_a·n_b − cum_b·n_a|`
    * over the merged value domain — so the supremum is found in exact
    * integers and only the final report divides (`ks_ppm =
    * ⌊1e6·D_num/(n_a·n_b)⌋`). The distribution-drift test that needs no
    * binning choice, complementing [[histogramDistance]] (whose L1 is
    * bin-width-sensitive). One row out: (n_a, n_b, d_num, ks_ppm).
    *
    * Scale shape: one hash agg to per-value (cnt_a, cnt_b) — map-side
    * combined, the shuffle is value-cardinality-sized — then the running
    * ECDF difference is a single range-partitioned prefix-sum scan
    * ([[Normalize.rankedPrefixSum]]) over the distinct values: the
    * identity `cum_a·n_b − cum_b·n_a = Σ_{v'≤v}(ca·n_b − cb·n_a)` turns
    * the two running counts into ONE running sum of a per-value delta,
    * so no single-partition global window exists anywhere in the plan —
    * the value domain can be arbitrarily large. [[histogramDistance]]
    * remains the bucketed alternative when even the distinct-value AGG
    * is too big to shuffle.
    */
  def ksStatistic(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val perValue = df
      .where(col(groupCol).isin(groupA, groupB))
      .groupBy(col(valueCol).cast("long").as("__v"))
      .agg(count_if(col(groupCol) === groupA).as("__ca"),
        count_if(col(groupCol) === groupB).as("__cb"))
    val totals = perValue.groupBy()
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    val withDelta = perValue
      .crossJoin(broadcast(totals))
      .withColumn("__delta", col("__ca") * col("n_b") - col("__cb") * col("n_a"))
    Normalize.rankedPrefixSum(withDelta, Seq(col("__v")), "__delta", "__rk", "__cum")
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(abs(col("__cum"))).as("d_num"))
      .withColumn("ks_ppm", expr("(1000000L * d_num) div (n_a * n_b)"))
  }

  /** Exact 1-Wasserstein (earth-mover) distance between two groups'
    * integer value distributions — the drift metric that, unlike
    * [[ksStatistic]]'s supremum, weighs HOW FAR mass moved, not just the
    * worst single gap: `W₁ = ∫|F_a − F_b| dv`, computed cross-multiplied
    * over the merged value grid as
    * `emd_num = Σᵢ (vᵢ₊₁ − vᵢ)·|cum_a(vᵢ)·n_b − cum_b(vᵢ)·n_a|`
    * so everything up to the final report stays exact 64-bit integer
    * (`w1_milli = ⌊1000·emd_num/(n_a·n_b)⌋` is W₁ in thousandths of a
    * grid unit). Callers quantize continuous values to an integer grid
    * (`floor(value·1000)`) — the grid choice is the only approximation,
    * and it is explicit.
    *
    * Scale shape: identical to [[ksStatistic]] — one value-cardinality
    * hash agg, one range-partitioned prefix-sum scan
    * ([[Normalize.rankedPrefixSum]]) for the running ECDF gap, then the
    * vᵢ₊₁ lookup is an equi-join on consecutive ranks (hash join on a
    * long key), never a global window. One row out:
    * (n_a, n_b, emd_num, w1_milli).
    *
    * Overflow posture: |cum gap| ≤ n_a·n_b, so emd_num ≤ range·n_a·n_b —
    * with milli-quantized values spanning ≤ 10⁶ grid units and samples
    * ≤ 3·10⁵ rows each the sum stays < 10¹⁷; the 1000× report multiply
    * is the documented bound (callers at larger n divide emd_num
    * themselves).
    */
  def wassersteinDrift(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      groupA: String,
      groupB: String): DataFrame = {
    val perValue = df
      .where(col(groupCol).isin(groupA, groupB))
      .groupBy(valueCol.cast("long").as("__v"))
      .agg(count_if(col(groupCol) === groupA).as("__ca"),
        count_if(col(groupCol) === groupB).as("__cb"))
    val totals = perValue.groupBy()
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    val withDelta = perValue
      .crossJoin(broadcast(totals))
      .withColumn("__delta", col("__ca") * col("n_b") - col("__cb") * col("n_a"))
    val ranked = Normalize.rankedPrefixSum(withDelta, Seq(col("__v")), "__delta", "__rk", "__cum")
    // vᵢ₊₁ via rank equi-join; the max value has no successor and its
    // cum gap is identically 0 (both ECDFs have reached 1), so the inner
    // join dropping it is exact.
    val next = ranked.select((col("__rk") - 1L).as("__rk"), col("__v").as("__vn"))
    ranked.join(next, Seq("__rk"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum((col("__vn") - col("__v")) * abs(col("__cum"))).as("emd_num"))
      .withColumn("w1_milli", expr("(1000L * emd_num) div (n_a * n_b)"))
  }

  /** Q–Q table between two groups' integer value distributions: for each
    * requested percent level `p`, the LOWER p-quantile of each group —
    * the element at 1-based rank `⌊p·(n−1)/100⌋ + 1` of the sorted
    * values, an exact element pick, no interpolation — plus their gap.
    * Where [[ksStatistic]] reports the worst ECDF gap and
    * [[wassersteinDrift]] the total transported mass, the Q–Q table
    * shows WHERE the distributions diverge (tail-only drift vs a body
    * shift read completely differently).
    *
    * Scale shape: per-group rank windows (key-partitioned), a
    * levels×groups target-rank table (tiny, broadcast) equi-joined back
    * on (group, rank), and a levels-sized pivot — the join is on a
    * pre-filtered rank column, so only |levels|·2 rows survive it.
    */
  def qqTable(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      groupA: String,
      groupB: String,
      levels: Seq[Int] = Seq(1, 5, 10, 25, 50, 75, 90, 95, 99)): DataFrame = {
    require(levels.nonEmpty && levels.forall(p => p >= 0 && p <= 100),
      s"levels must be percents in [0, 100]: $levels")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val ranked = df
      .where(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("__g"), valueCol.cast("long").as("__v"))
      .withColumn("__rk", row_number().over(w).cast("long"))
    val counts = ranked.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val targets = levels.distinct.sorted.toDF("p")
      .crossJoin(counts)
      .withColumn("__rk", expr("(p * (__n - 1)) div 100 + 1"))
      .select(col("p"), col("__g"), col("__rk"))
    ranked.join(broadcast(targets), Seq("__g", "__rk"))
      .groupBy(col("p"))
      .agg(
        max(when(col("__g") === groupA, col("__v"))).as("q_a"),
        max(when(col("__g") === groupB, col("__v"))).as("q_b"))
      .withColumn("gap", col("q_a") - col("q_b"))
  }

  /** Per-group L-moment profile — the order-statistics moments that stay
    * meaningful under heavy tails where classical variance/skew blow up:
    * from the exact rank-weighted sums `P0 = Σx`, `P1 = Σ(i−1)·x`,
    * `P2 = Σ((i−1)(i−2)/2)·x` over each group's ascending sort,
    * λ2 (L-scale) and the ratios t2 = λ2/λ1 (L-CV) and t3 = λ3/λ2
    * (L-skewness) have closed integer numerators:
    * `λ2·n(n−1) = 2P1 − (n−1)P0`,
    * `λ3·n(n−1)(n−2) = 12P2 − 6(n−2)P1 + (n−1)(n−2)P0`.
    * The P-sums and both numerators are published EXACT; the ppm ratios
    * are floors of one pinned-order double divide each (the numerators
    * can exceed the 10⁶-scaled Long range, so the exact pair is the
    * scale-safe output — the [[suffStats]] stance). Rank ties need no
    * tiebreak: equal values permuting among tied ranks leave every
    * weighted sum unchanged.
    *
    * Scale shape: one per-group rank window + one hash agg; shuffles
    * carry (group, value, rank) triples only.
    */
  def lMoments(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
    val ranked = df
      .select((g :+ valueCol.cast("long").as("__v")): _*)
      .withColumn("__i", row_number().over(w).cast("long"))
    ranked.groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__v")).as("p0"),
        sum((col("__i") - 1L) * col("__v")).as("p1"),
        // (i−1)(i−2) is always even — the div is exact integer division
        sum(expr("(((__i - 1) * (__i - 2)) div 2) * __v")).as("p2"))
      .withColumn("l2_num", lit(2L) * col("p1") - (col("n") - 1L) * col("p0"))
      .withColumn("l3_num",
        lit(12L) * col("p2") - lit(6L) * (col("n") - 2L) * col("p1")
          + (col("n") - 1L) * (col("n") - 2L) * col("p0"))
      // pinned-order double ratios: t2 = (l2_num/(n−1)) / p0,
      // t3 = (l3_num/(n−2)) / l2_num — each one divide chain, floored
      .withColumn("t2_ppm",
        when(col("n") < 2 || col("p0") === 0, lit(null).cast("long"))
          .otherwise(floor(lit(1000000.0) * (col("l2_num") / (col("n") - 1L)) / col("p0"))
            .cast("long")))
      .withColumn("t3_ppm",
        when(col("n") < 3 || col("l2_num") === 0, lit(null).cast("long"))
          .otherwise(floor(lit(1000000.0) * (col("l3_num") / (col("n") - 2L)) / col("l2_num"))
            .cast("long")))
  }

  /** Classical moment profile per group from EXACT integer power sums
    * `S1..S4 = Σx, Σx², Σx³, Σx⁴`: mean, variance, skewness and excess
    * kurtosis in milli units — [[lMoments]]' parametric sibling for the
    * well-behaved-tail regime. The power sums are exact (feed values in
    * units where n·max|x|⁴ < 2⁶³ — dollars, not cents, at 10⁶-row
    * groups); central moments and ratios run in ONE pinned operation
    * order each, so the milli floors reproduce bit-equal on any IEEE
    * engine:
    * `m2 = S2/n − μ·μ`, `m3 = S3/n − 3·μ·(S2/n) + 2·μ·μ·μ`,
    * `m4 = S4/n − 4·μ·(S3/n) + 6·(μ·μ)·(S2/n) − 3·(μ·μ)·(μ·μ)`,
    * `skew = m3/(sqrt(m2)·m2)`, `ex_kurt = m4/(m2·m2) − 3`.
    * Degenerate groups (m2 ≤ 0) emit null ratios; the exact sums always
    * flow.
    *
    * Scale shape: ONE map-side-combinable aggregation — nothing else
    * shuffles.
    */
  def momentStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val x = valueCol.cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("s1"), sum(x * x).as("s2"),
        sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
      .withColumn("__mu", col("s1") / col("n"))
      .withColumn("__m2", col("s2") / col("n") - col("__mu") * col("__mu"))
      .withColumn("__m3",
        col("s3") / col("n") - lit(3.0) * col("__mu") * (col("s2") / col("n"))
          + lit(2.0) * col("__mu") * col("__mu") * col("__mu"))
      .withColumn("__m4",
        col("s4") / col("n") - lit(4.0) * col("__mu") * (col("s3") / col("n"))
          + lit(6.0) * (col("__mu") * col("__mu")) * (col("s2") / col("n"))
          - lit(3.0) * (col("__mu") * col("__mu")) * (col("__mu") * col("__mu")))
      .withColumn("mean_milli", floor(lit(1000.0) * col("__mu")).cast("long"))
      .withColumn("var_milli",
        when(col("n") < 1, lit(null).cast("long"))
          .otherwise(floor(lit(1000.0) * col("__m2")).cast("long")))
      .withColumn("skew_milli",
        when(col("__m2") <= 0.0, lit(null).cast("long"))
          .otherwise(floor(lit(1000.0) * (col("__m3") / (sqrt(col("__m2")) * col("__m2"))))
            .cast("long")))
      .withColumn("kurt_milli",
        when(col("__m2") <= 0.0, lit(null).cast("long"))
          .otherwise(floor(lit(1000.0) * (col("__m4") / (col("__m2") * col("__m2")) - lit(3.0)))
            .cast("long")))
      .drop("__mu", "__m2", "__m3", "__m4")
  }

  /** Exact Gini concentration of a CONTINUOUS value per group (who owns
    * the spend/tokens/storage), via the rank-weighted closed form over
    * the ascending sort: `G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx)`, published
    * as floor ppm with the integer numerator/denominator exact —
    * [[gini]]'s sibling for values instead of category counts. Rank
    * ties need no tiebreak (equal values permuting among tied ranks
    * leave Σi·xᵢ unchanged). Requires non-negative values; `gini_ppm`
    * stays in-Long for Σi·x ≤ 9·10¹² — dollars at 10⁶-row groups.
    *
    * Scale shape: one per-group rank window + one hash agg.
    */
  def valueGini(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
    df.select((g :+ valueCol.cast("long").as("__v")): _*)
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("sum_value"),
        sum(col("__i") * col("__v")).as("__ix"))
      .withColumn("gini_num", lit(2L) * col("__ix") - (col("n") + 1L) * col("sum_value"))
      .withColumn("gini_den", col("n") * col("sum_value"))
      .withColumn("gini_ppm",
        when(col("gini_den") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * gini_num) div gini_den")))
      .drop("__ix")
  }

  /** Lorenz curve points per group at population-decile resolution: the
    * ascending-sorted value distribution bucketed into `buckets` equal
    * POPULATION slices, each with its exact count, value sum, and the
    * CUMULATIVE value share in ppm — [[valueGini]]'s curve ("the bottom
    * 50% of events carry 9% of spend" reads directly off it; Gini is
    * 1 − 2·area under this curve). Bucket of the i-th ranked row (1-based)
    * is `((i−1)·buckets) div n` — exact integer, population-equal up to
    * rounding.
    *
    * Scale shape: one per-group rank window, one (group, bucket) agg,
    * one per-group cumulative window over ≤ `buckets` rows. All
    * key-partitioned.
    */
  def lorenzDeciles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      buckets: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(buckets >= 2 && buckets <= 1000, s"buckets must be in [2, 1000]: $buckets")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("__v"))
    val perBucket = df
      .select((g :+ valueCol.cast("long").as("__v")): _*)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(g: _*)))
      .withColumn("bucket", expr(s"((__i - 1) * $buckets) div __n"))
      .groupBy((g :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("sum_value"))
    val cum = Window.partitionBy(g: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(g: _*)
    perBucket
      .withColumn("__cum", sum(col("sum_value")).over(cum))
      .withColumn("__tot", sum(col("sum_value")).over(tot))
      .withColumn("cum_value_ppm",
        when(col("__tot") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * __cum) div __tot")))
      .drop("__cum", "__tot")
  }

  /** Gini–Simpson diversity per group: `1 − Σ(n_c/n)²` over the category
    * counts — the "probability two draws differ" score behind behavioral
    * breadth and corpus-mix dashboards — plus the inverse-Simpson
    * effective category count `n²/Σn_c²` ("how many equally-likely
    * categories would look like this"). Unlike Shannon entropy, both are
    * rational in the counts, so the report is exact integer end-to-end:
    * `gini_simpson_ppm = (10⁶·(n² − Σn_c²)) div n²` and
    * `effective_cats_milli = (10³·n²) div Σn_c²` (truncation toward
    * zero, Spark `div` ≡ DuckDB `//`).
    *
    * Scale shape: one (group, category) map-side-combined count, one
    * group-level sum over category-cardinality rows. No windows, no
    * joins. Overflow bound: n² needs Long, so per-GROUP row counts must
    * stay below ~3.0×10⁹ — beyond that, cast the two products to
    * DecimalType(38,0) (the [[graft.ops.Decontaminate]] precedent).
    */
  def simpsonDiversity(df: DataFrame, groupCols: Seq[String], catCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val keys = groupCols.map(col)
    val counts = df.groupBy(keys :+ catCol.as("__cat"): _*)
      .agg(count(lit(1)).as("__c"))
    counts
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_categories"), sum(col("__c")).as("n_rows"),
        sum(col("__c") * col("__c")).as("__s2"))
      .withColumn("gini_simpson_ppm",
        expr("(1000000L * (n_rows * n_rows - __s2)) div (n_rows * n_rows)"))
      .withColumn("effective_cats_milli", expr("(1000L * n_rows * n_rows) div __s2"))
      .drop("__s2")
  }

  /** Mix-shift decomposition of a rate change between two periods: per
    * segment, how much of the overall rate move came from the segment
    * MIX changing (share_b − share_a at the old rate) vs the segment's
    * own RATE changing (new share times rate delta) — the "did
    * conversion drop because traffic shifted to mobile, or because
    * mobile got worse" table. All ppm terms truncate once per segment
    * BY SPEC (Spark `div` ≡ DuckDB `//`); a segment absent from a
    * period contributes share 0 / rate 0 on that side.
    *
    * Scale shape: one (segment, period) conditional-count agg, one
    * broadcast one-row totals join — two passes over nothing bigger
    * than the segment table after the first agg.
    */
  def mixShift(
      df: DataFrame,
      segmentCol: String,
      periodCol: Column,
      periodA: String,
      periodB: String,
      isSuccess: Column): DataFrame = {
    val per = df
      .where(periodCol.isin(periodA, periodB))
      .groupBy(col(segmentCol).as("segment"))
      .agg(count_if(periodCol === periodA).as("n_a"),
        count_if(periodCol === periodA && isSuccess).as("pos_a"),
        count_if(periodCol === periodB).as("n_b"),
        count_if(periodCol === periodB && isSuccess).as("pos_b"))
    val tot = per.groupBy().agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"))
    per.crossJoin(broadcast(tot))
      .withColumn("share_a_ppm", expr("(1000000L * n_a) div __ta"))
      .withColumn("share_b_ppm", expr("(1000000L * n_b) div __tb"))
      .withColumn("rate_a_ppm",
        when(col("n_a") === 0, 0L).otherwise(expr("(1000000L * pos_a) div n_a")))
      .withColumn("rate_b_ppm",
        when(col("n_b") === 0, 0L).otherwise(expr("(1000000L * pos_b) div n_b")))
      .withColumn("mix_effect_ppm",
        expr("((share_b_ppm - share_a_ppm) * rate_a_ppm) div 1000000L"))
      .withColumn("rate_effect_ppm",
        expr("(share_b_ppm * (rate_b_ppm - rate_a_ppm)) div 1000000L"))
      .drop("__ta", "__tb")
  }

  /** ABC (Pareto) classification: every key labeled A / B / C by its
    * position on the cumulative-value curve — A while the curve BEFORE
    * the key is under `aCutPpm` (so the key that crosses 80% is still
    * an A, even if it crosses alone), B until `bCutPpm`, C after — the
    * inventory/catalog working-set split, produced as a labeled TABLE
    * (the [[lorenz]]-style curves report the shape; this assigns the
    * label you act on).
    *
    * Scale shape: one per-key sum, then the range-partitioned
    * [[graft.ops.Normalize.rankedPrefixSum]] over (value desc, key) —
    * a balanced global ranking, no single-partition window — and a
    * broadcast one-row total.
    */
  def abcClassification(
      df: DataFrame,
      keyCol: String,
      valueCol: Column,
      aCutPpm: Long = 800000L,
      bCutPpm: Long = 950000L): DataFrame = {
    require(0 < aCutPpm && aCutPpm < bCutPpm && bCutPpm <= 1000000L,
      s"need 0 < aCut < bCut <= 1e6: $aCutPpm, $bCutPpm")
    val sums = df.groupBy(col(keyCol)).agg(sum(valueCol.cast("long")).as("__v"))
      .withColumn("__negv", -col("__v"))
    val ranked = graft.ops.Normalize.rankedPrefixSum(
      sums, Seq(col("__negv"), col(keyCol)), "__v", "rank", "__cum")
    val tot = ranked.agg(sum(col("__v")).as("__tot"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("cum_share_ppm", expr("(1000000L * __cum) div __tot"))
      .withColumn("__beforePpm", expr("(1000000L * (__cum - __v)) div __tot"))
      .withColumn("abc_class",
        when(col("__beforePpm") < aCutPpm, "A")
          .when(col("__beforePpm") < bCutPpm, "B")
          .otherwise("C"))
      .select(col(keyCol), col("__v").as("value"), col("rank"),
        col("cum_share_ppm"), col("abc_class"))
  }

  def gini(df: DataFrame, groupCols: Seq[String], catCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols.map(col)
    val counts = df.groupBy((groupCols :+ catCol).map(col): _*)
      .agg(count(lit(1)).as("__x"))
    val w = Window.partitionBy(keys: _*).orderBy(col("__x"), col(catCol))
    counts
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_categories"),
        sum(col("__x")).as("n_rows"),
        floor(lit(1000000L) *
          (lit(2L) * sum(col("__i") * col("__x")) - (count(lit(1)) + 1L) * sum(col("__x"))) /
          (count(lit(1)) * sum(col("__x")))).as("gini_ppm"))
  }
}

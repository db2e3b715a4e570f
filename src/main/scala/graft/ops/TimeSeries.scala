package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn event data with holes into a dense,
  * regular series per key — the prerequisite for any windowed model or
  * chart downstream.
  *
  *  - [[monthlySpine]]: each key's complete month range, generated with
  *    `sequence()` per key (map-side fan-out bounded by the key's own
  *    span — no cross-join against a global calendar, which at scale
  *    would shuffle every key against every date).
  *  - [[gapFillMonthlyCounts]]: spine ⟕ per-month aggregates, zero-fill.
  *  - [[forwardFill]]: last-observation-carried-forward via
  *    `last(ignoreNulls)` over an ordered per-key window.
  */
object TimeSeries {

  /** (key, month) rows covering every month between the key's first and
    * last observation, inclusive.
    */
  def monthlySpine(df: DataFrame, keyCol: String, dateCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        date_trunc("month", min(col(dateCol))).as("__lo"),
        date_trunc("month", max(col(dateCol))).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL 1 MONTH"))).as("month"))

  /** Dense monthly series per key: observation count and summed integer
    * `amountCents` per month, gap months present with zeros.
    */
  def gapFillMonthlyCounts(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      amountCents: Column): DataFrame = {
    val monthly = df
      .groupBy(col(keyCol), date_trunc("month", col(dateCol)).as("month"))
      .agg(count(lit(1)).as("__n"), sum(amountCents).as("__cents"))
    monthlySpine(df, keyCol, dateCol)
      .join(monthly, Seq(keyCol, "month"), "left")
      .select(col(keyCol), col("month"),
        coalesce(col("__n"), lit(0L)).as("n_obs"),
        coalesce(col("__cents"), lit(0L)).as("cents"))
  }

  /** Forward fill: replace nulls in `valueCol` with the last non-null
    * value in `orderCol` order within each key. One shuffle + sort per
    * key partition; the standard LOCF semantics.
    *
    * Determinism contract: `(orderCol, tiebreaks*)` must totally order the
    * rows within each key — `last(ignoreNulls)` over a running ROWS frame
    * is partition-order-sensitive, so duplicate sort keys would make the
    * filled value depend on shuffle arrival order. The monthly-spine
    * caller is safe (one row per (key, month)); generic callers with
    * non-unique `orderCol` must pass tiebreak columns (cf.
    * `Sessionize.pairedDurations`' explicit event-id tiebreak).
    */
  def forwardFill(df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      tiebreaks: String*): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol) +: tiebreaks.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Throttle-dedup ("debounce"): drop a row when its immediate
    * predecessor in the same key group is closer than `minGapMs` — the
    * duplicate-burst filter for retried webhooks, double-clicks and
    * at-least-once ingestion echoes.
    *
    * Semantics are lag-based: each row compares against the previous ROW
    * (kept or dropped), not the previous kept row. This keeps the
    * operator a single window function — one shuffle, one sort, full
    * codegen, and identical SQL in every engine. (The "previous KEPT
    * row" variant is a running-state scan that needs a per-key stateful
    * pass; [[Sessionize]]'s typed replay is the template if that exact
    * semantics is ever needed.)
    *
    * Determinism contract: `(timeCol, tiebreaks*)` must totally order
    * rows within a key, same as [[forwardFill]]. Rows with equal
    * timestamps are `minGapMs = 0` apart, so of a same-instant burst only
    * the tiebreak-first row survives (when minGapMs > 0).
    */
  def debounce(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      minGapMs: Long,
      tiebreaks: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(minGapMs >= 0, s"minGapMs must be >= 0: $minGapMs")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol) +: tiebreaks.map(col): _*)
    val prev = lag(unix_millis(col(timeCol)), 1).over(w)
    df.withColumn("__prev_ms", prev)
      .where(col("__prev_ms").isNull ||
        unix_millis(col(timeCol)) - col("__prev_ms") >= minGapMs)
      .drop("__prev_ms")
  }

  /** Period-over-period growth per key: previous period's value, the
    * exact integer delta, and the growth ratio — `lag` over the period
    * ordering, one window on one shuffle.
    *
    * The ratio is a plain DOUBLE division of two exact Longs: a single
    * IEEE-754 correctly-rounded operation, bit-identical in any engine —
    * unlike a floor-to-ppm of that quotient, whose last-ulp could differ
    * at bucket boundaries. Null when there is no previous period or its
    * value is ≤ 0. "Previous" means previous PRESENT period; run
    * [[gapFillMonthlyCounts]] first if calendar-adjacent semantics are
    * needed.
    */
  def periodGrowth(
      df: DataFrame,
      keyCols: Seq[String],
      periodCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(periodCol))
    df
      .withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn("delta", col(valueCol) - col("prev_value"))
      .withColumn("growth",
        when(col("prev_value") > 0,
          col("delta").cast("double") / col("prev_value")))
  }

  /** Time-weighted average of a step series per key — each value holds
    * until the NEXT observation, so its weight is that interval: emits
    * exact integer `weighted_sum = Σ value·duration_ms` and
    * `total_ms = Σ duration_ms` plus their single-division double `twa`
    * (cf. [[periodGrowth]]'s portability note). The correct average for
    * irregularly-sampled state (sensor readings, price ticks, replica
    * counts) where a plain mean over-weights busy periods.
    *
    * The last observation of each key has no successor and carries zero
    * weight (step-function-until-known semantics; append a horizon row
    * upstream to weight it). One `lead` window on one key shuffle + a
    * narrow agg on the same partitioning.
    */
  def timeWeighted(
      df: DataFrame,
      keyCols: Seq[String],
      tsMsCol: String,
      valueCol: String,
      tiebreaks: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsMsCol) +: tiebreaks.map(col): _*)
    val v = col(valueCol).cast("long")
    df
      .withColumn("__d", lead(col(tsMsCol), 1).over(w) - col(tsMsCol))
      .where(col("__d").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(v * col("__d")).as("weighted_sum"), sum(col("__d")).as("total_ms"))
      .withColumn("twa",
        when(col("total_ms") > 0,
          col("weighted_sum").cast("double") / col("total_ms")))
  }

  /** Run-length encoding of a per-key state series (gaps-and-islands):
    * one row per maximal run of consecutive equal states, with integer
    * start/end positions and length. The session-shape primitive behind
    * "how long do users stay in state X" and the repetition screen for
    * state streams.
    *
    * Island id via the classic double-row_number difference: `rn_key −
    * rn_(key,state)` is constant exactly within a run. Both windows sort
    * by the SAME key prefix, so Catalyst plans one exchange; positions
    * (not timestamps) make the output engine-exact.
    */
  def runs(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      stateCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val wKey = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val wState = Window.partitionBy(keyCols.map(col) :+ col(stateCol): _*)
      .orderBy(orderCols: _*)
    df
      .withColumn("__rn", row_number().over(wKey).cast("long"))
      .withColumn("__island", col("__rn") - row_number().over(wState))
      .groupBy((keyCols.map(col) :+ col(stateCol) :+ col("__island")): _*)
      .agg(min(col("__rn")).as("start_pos"), max(col("__rn")).as("end_pos"),
        count(lit(1)).as("run_len"))
      .drop("__island")
  }

  /** Recency-decayed score per key: over each key's series in
    * `orderCols` order, the latest row's score is
    * `Σ_{j=0..lags} value(t−j) · 2^(lags−j)` — a bounded-lag EMA with
    * dyadic weights (newest row weighs 2^lags, each step back halves).
    * Missing lags (short series) contribute 0. All-integer: dyadic
    * weights are what make an exponential decay EXACT, where a float
    * α·(1−α)^k accumulates engine-dependent rounding. One row per key:
    * (key…, decayed_score, n_obs). The standard "recent activity beats
    * stale activity" feature for user/source freshness ranking.
    *
    * Scale shape: one window shuffle on the key (all `lag` columns share
    * one window spec → one exchange + one sort), then the per-key
    * last-row filter — no self-joins, no per-row UDFs, whole-stage
    * codegen throughout.
    */
  def decayedScore(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      valueCol: String,
      lags: Int = 7): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(lags >= 0 && lags < 62, s"bad lags: $lags")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val v = col(valueCol).cast("long")
    val score = (0 to lags).map { j =>
      val vj = if (j == 0) v else coalesce(lag(v, j).over(w), lit(0L))
      vj * lit(1L << (lags - j))
    }.reduce(_ + _)
    df
      .withColumn("__score", score)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .where(col("__rn") === col("__n"))
      .select(keyCols.map(col) :+ col("__score").as("decayed_score") :+
        col("__n").as("n_obs"): _*)
  }

  /** Time-to-event (survival) labels: for every row, the seconds until
    * the key's NEXT target event strictly after it — or a censor flag if
    * none lands within `horizonSec`. The label generator for
    * churn/conversion survival models, with the censoring made explicit
    * (silently dropping censored rows biases the model toward fast
    * converters; here they stay, flagged). Events at or past the target
    * see the one AFTER it, so targets themselves get time-to-NEXT-target.
    * Output: input keys + (tte_sec for uncensored, NULL otherwise) +
    * `censored` (0/1).
    *
    * The next-target timestamp is a REVERSE running min over the key's
    * series of (target ? ts : ∞) — one window, no self-join, no asof
    * machinery: the `rowsBetween(1, unbounded)` frame is the "strictly
    * after" semantics verbatim.
    *
    * Scale shape: one window shuffle on the key; the frame is a running
    * min the window operator streams in reverse sort order — nothing
    * buffers beyond the sort.
    */
  def timeToEvent(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      isTarget: org.apache.spark.sql.Column,
      horizonSec: Long): DataFrame = {
    require(horizonSec >= 1, s"horizonSec must be >= 1: $horizonSec")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(1, Window.unboundedFollowing)
    df
      .withColumn("__next_ms",
        min(when(isTarget, unix_millis(col(tsCol)))).over(w))
      .withColumn("__tte_sec",
        expr("(__next_ms - unix_millis(" + tsCol + ")) div 1000L"))
      .withColumn("censored",
        when(col("__tte_sec").isNull || col("__tte_sec") > horizonSec, 1L)
          .otherwise(0L))
      .withColumn("tte_sec",
        when(col("censored") === 0, col("__tte_sec")))
      .drop("__next_ms", "__tte_sec")
  }

  /** Churn-label generation at a cutoff: every key active at or before
    * `cutoff` gets a label — `churned = 1` iff it has NO activity inside
    * the lookback window `(cutoff − windowSec, cutoff]` — plus the
    * evidence (`last_seen_ms` ≤ cutoff, `gap_sec` to the cutoff,
    * `n_events` ≤ cutoff). Future-blind by construction: rows after the
    * cutoff never enter any aggregate, so the label can't leak what it
    * predicts — the property a training-label generator must prove, made
    * structural here.
    *
    * Scale shape: one filter + one map-side-combined max/count
    * aggregation on the key; the shuffle carries (key, last_ms, count).
    */
  def churnLabels(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      cutoff: String,
      windowSec: Long): DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1: $windowSec")
    val cutMs = unix_millis(to_timestamp(lit(cutoff)))
    df
      .where(col(tsCol) <= to_timestamp(lit(cutoff)))
      .groupBy(col(keyCol))
      .agg(max(unix_millis(col(tsCol))).as("last_seen_ms"),
        count(lit(1)).as("n_events"))
      .withColumn("__cut_ms", cutMs)
      .withColumn("gap_sec", expr("(__cut_ms - last_seen_ms) div 1000L"))
      .drop("__cut_ms")
      .withColumn("churned",
        when(col("last_seen_ms") <= cutMs - windowSec * 1000L, 1L).otherwise(0L))
  }

  /** Seasonal-naive forecast backtest: rows before `cutoff` train a
    * per-(key, day-of-week) floor-mean profile; rows at/after `cutoff`
    * are scored against it, falling back to the key's global train mean
    * for weekdays unseen in training. Emits per key the exact integer
    * error summary — `n_train`, `n_test`, `sae` (Σ|err|),
    * `mae = sae div n_test`, and the signed `bias = Σerr div n_test`
    * (negative = forecast runs high). The cheapest honest baseline a
    * forecasting pipeline must beat, and the backtest harness that
    * proves it on history — integer-exact end to end (floor-mean
    * forecasts, truncated means) so the score is engine-portable.
    * Keys with no train rows are excluded (nothing to forecast from);
    * `valueCol` must be integral and non-negative (pre-scale currency
    * to cents — the floor-mean profile uses `div`, which only matches
    * the oracle's floor semantics on non-negative sums; the signed
    * `bias` handles its own sign explicitly).
    *
    * Scale shape: two narrow aggregations (key×7-row profile, key-row
    * fallback) broadcast back onto the test scan; nothing row-sized
    * shuffles twice, and the error summary is one map-side-combinable
    * aggregation per key.
    */
  def seasonalBacktest(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      cutoff: String): DataFrame = {
    val cut = to_timestamp(lit(cutoff))
    val base = df.select(col(keyCol).as("__k"),
      dayofweek(col(tsCol)).cast("long").as("__dow"),
      col(valueCol).cast("long").as("__y"),
      (col(tsCol) < cut).as("__train"))
    val profile = base.where(col("__train"))
      .groupBy(col("__k"), col("__dow"))
      .agg(expr("sum(__y) div count(1)").as("__fc_dow"))
    val fallback = base.where(col("__train"))
      .groupBy(col("__k"))
      .agg(expr("sum(__y) div count(1)").as("__fc_all"),
        count(lit(1)).as("n_train"))
    base.where(!col("__train"))
      .join(broadcast(profile), Seq("__k", "__dow"), "left")
      .join(broadcast(fallback), Seq("__k"))
      .withColumn("__err", col("__y") - coalesce(col("__fc_dow"), col("__fc_all")))
      .groupBy(col("__k").as(keyCol), col("n_train"))
      .agg(count(lit(1)).as("n_test"),
        sum(abs(col("__err"))).as("sae"),
        sum(col("__err")).as("__se"))
      .select(col(keyCol), col("n_train"), col("n_test"),
        col("sae"), expr("sae div n_test").as("mae"),
        expr("""CASE WHEN __se >= 0 THEN __se div n_test
               | ELSE -((-__se) div n_test) END""".stripMargin).as("bias"))
  }

  /** Inter-arrival-time histogram per group: successive per-key event
    * gaps, bucketed to `widthSec`-wide bins capped at `maxBucket`
    * (overflow collapses into the cap bin), counted per
    * (group, bucket) — the arrival-cadence profile an ops monitor reads
    * per event type ("did the gap distribution shift right?"). Each key's
    * first event has no predecessor and is excluded.
    *
    * Scale shape: one per-key window (`lag` over keyCol partitions —
    * range-balanced, never global) + one narrow hash agg on
    * (group, bucket); the shuffle carries key/ts/group triples then
    * bucket counts.
    */
  def interArrivalHistogram(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      tsCol: String,
      widthSec: Long = 60L,
      maxBucket: Long = 10L,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(widthSec > 0, s"widthSec must be positive: $widthSec")
    require(maxBucket >= 0, s"maxBucket must be non-negative: $maxBucket")
    import org.apache.spark.sql.expressions.Window
    // Gap math in epoch MILLIS (sub-second gaps bucket correctly) with
    // integer division — engine-exact against an epoch-ms oracle. The
    // order is over the SAME ms values both engines see; tieCols make it
    // total when timestamps repeat, so gap pairing is deterministic.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ms") +: tieCols.map(col): _*)
    df.select((Seq(col(keyCol), col(groupCol), unix_millis(col(tsCol)).as("__ms")) ++
        tieCols.map(col)): _*)
      .withColumn("__prev", lag(col("__ms"), 1).over(w))
      .where(col("__prev").isNotNull)
      .select(col(groupCol),
        least(expr(s"(__ms - __prev) div ${widthSec * 1000L}"), lit(maxBucket))
          .cast("long").as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-key local-maximum (peak) detection: a point is a peak when its
    * value STRICTLY exceeds every value in the `w` rows before and after
    * it in the key's order — the windowed local-max detector behind
    * spike alerts and burst extraction. Boundary rows with a truncated
    * neighborhood still qualify (a missing side is vacuously exceeded);
    * `n_before`/`n_after` report the actual neighborhood each verdict
    * saw, so callers wanting full-window peaks filter `n_before = w`.
    * Strictness makes plateaus peak-free — deterministic under ties by
    * construction, no tie-break column needed for the VERDICT (the order
    * columns still must totally order rows for the frames to be stable).
    *
    * Scale shape: three frames over one per-key window (max before, max
    * after, counts) — partitioned by the key, range-balanced, never
    * global; one shuffle of (key, order, id, value).
    */
  def peaks(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[Column],
      idCol: String,
      valueCol: Column,
      w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1: $w")
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val before = base.rowsBetween(-w, -1)
    val after = base.rowsBetween(1, w)
    df.select((Seq(col(keyCol), col(idCol)) ++ orderCols :+ valueCol.cast("long").as("__v")): _*)
      .withColumn("__lm", max(col("__v")).over(before))
      .withColumn("__rm", max(col("__v")).over(after))
      .withColumn("__nl", count(lit(1)).over(before))
      .withColumn("__nr", count(lit(1)).over(after))
      .where((col("__lm").isNull || col("__v") > col("__lm")) &&
        (col("__rm").isNull || col("__v") > col("__rm")))
      .select(col(keyCol), col(idCol), col("__v").as("value"),
        col("__nl").as("n_before"), col("__nr").as("n_after"))
  }

  /** Discrete-time hazard table over (duration, event) survival data:
    * for every duration `t` at which an EVENT occurred, the risk set
    * size `n_risk = |{duration ≥ t}|` (censored rows count — they were
    * still at risk), the event count `d`, and the exact hazard
    * `⌊10⁶·d / n_risk⌋` — the per-time-step ingredients of
    * Kaplan–Meier/Nelson–Aalen, published as exact integers instead of
    * a float product/sum that no two engines reproduce bit-equal
    * (consumers fold the cumulative curve in whatever precision they
    * like; the TABLE is the portable artifact).
    *
    * Scale shape: one duration-cardinality hash agg, then `n_risk` for
    * every distinct duration in ONE descending range-partitioned prefix
    * sum ([[Normalize.rankedPrefixSum]]) — the suffix-count identity
    * `|{≥ t}| = Σ_{t' ≥ t} c_{t'}` — so no global window and no
    * per-row risk-set join anywhere; the duration domain can be
    * arbitrarily large.
    */
  /** Day-of-week × hour-of-day activity heatmap per group: counts and
    * within-group share (ppm). Calendar math is ENGINE-NEUTRAL integer
    * arithmetic on the epoch — `dow = (⌊epoch_s/86400⌋ + 4) mod 7`
    * (0 = Sunday; epoch day 0 was a Thursday) and
    * `hour = (epoch_s mod 86400) div 3600` — because `dayofweek`-style
    * builtins disagree across engines on both origin and range. UTC by
    * construction (shift the epoch before calling for a business TZ).
    *
    * Scale shape: one map-side-combinable (group, dow, hour) count agg +
    * a 168-cell-bounded broadcast join back for the share — no windows.
    */
  def activityProfile(
      df: DataFrame,
      groupCol: String,
      tsCol: String): DataFrame = {
    val cells = df
      .select(col(groupCol), unix_millis(col(tsCol)).as("__ms"))
      .withColumn("__s", expr("__ms div 1000"))
      .select(col(groupCol),
        expr("pmod(__s div 86400 + 4, 7)").cast("long").as("dow"),
        expr("pmod(__s, 86400) div 3600").cast("long").as("hour"))
      .groupBy(col(groupCol), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col(groupCol)).agg(sum(col("n")).as("__tot"))
    cells.join(broadcast(totals), Seq(groupCol))
      .withColumn("share_ppm", expr("(1000000L * n) div __tot"))
      .drop("__tot")
  }

  /** Per-key rolling LOWER median over the trailing `w+1`-row frame —
    * the robust smoother for spiky telemetry ([[graft.ops.Outliers.rollingZ]]'s
    * denoising complement): the lower median of a sorted frame is a
    * deterministic element pick, so results are engine-exact with no
    * averaging. Emits every row with its smoothed value and the actual
    * frame size (ramp-up rows have n_win < w+1).
    *
    * Scale shape: one per-key window (partitioned, range-balanced); the
    * frame materializes w+1 values per row — the caller's w bounds the
    * memory, exactly like any ROWS frame. For large w use
    * [[graft.ops.Metrics.equiDepth]]-style bucketing instead.
    */
  def rollingMedian(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[Column],
      idCol: String,
      valueCol: Column,
      w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1: $w")
    import org.apache.spark.sql.expressions.Window
    val frame = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*).rowsBetween(-w, 0)
    df.select((Seq(col(keyCol), col(idCol)) ++ orderCols :+ valueCol.cast("long").as("__v")): _*)
      .withColumn("__win", sort_array(collect_list(col("__v")).over(frame)))
      .select(col(keyCol), col(idCol), col("__v").as("value"),
        expr("element_at(__win, cast((size(__win) + 1) div 2 as int))").as("med"),
        size(col("__win")).cast("long").as("n_win"))
  }

  /** Peak concurrency per group over half-open integer intervals
    * `[start, end)` — "how many sessions/locks/calls were open at once",
    * the capacity-planning sweep-line: +1 at each start, −1 at each end,
    * both aggregated per distinct timestamp FIRST (so an end and a start
    * at the same instant net out — half-open semantics exactly), then a
    * per-group running sum whose max is the answer.
    *
    * Scale shape: one (group, timestamp) hash agg over 2·n narrow delta
    * rows, one per-group window (partitioned, range-balanced), one tiny
    * count join — never a global window, never an interval self-join
    * (the O(n²) formulation this replaces).
    */
  def maxConcurrency(
      df: DataFrame,
      groupCol: String,
      startCol: Column,
      endCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deltas = df.select(col(groupCol), startCol.cast("long").as("__t"), lit(1L).as("__d"))
      .unionByName(df.select(col(groupCol), endCol.cast("long").as("__t"), lit(-1L).as("__d")))
    val perT = deltas.groupBy(col(groupCol), col("__t")).agg(sum(col("__d")).as("__net"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = perT
      .withColumn("__run", sum(col("__net")).over(w))
      .groupBy(col(groupCol))
      .agg(max(col("__run")).as("max_concurrent"))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_intervals"))
    peaks.join(broadcast(counts), Seq(groupCol))
  }

  /** Per-key burstiness of inter-arrival gaps — Goh–Barabási
    * `B = (σ − μ)/(σ + μ)` over the seconds between consecutive events:
    * −1 for a metronome, → 0 for Poisson, → 1 for heavy-tailed bursts.
    * The classic screen separating organic activity from scripted
    * traffic. Suff-stats (n, Σg, Σg²) are exact longs (gaps in SECONDS
    * keep Σg² < 2⁶³ for decade-long spans); μ, population σ and B run
    * in pinned-order doubles, σ² clamped at 0 against fp cancellation
    * (both engines clamp identically). Keys with all-zero gaps emit a
    * NULL B (σ + μ = 0). One row per key with ≥ 1 gap:
    * (key, n_gaps, sum_gap, sum_gap2, b_micro).
    *
    * Scale shape: one per-key lag window + one hash agg — shuffles carry
    * (key, seconds) pairs only.
    */
  def burstiness(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__s") +: tieCols.map(col): _*)
    df.select((Seq(col(keyCol), expr(s"unix_millis($tsCol) div 1000").as("__s")) ++
        tieCols.map(col)): _*)
      .withColumn("__g", col("__s") - lag(col("__s"), 1).over(w))
      .where(col("__g").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__g")).as("sum_gap"),
        sum(col("__g") * col("__g")).as("sum_gap2"))
      // pinned doubles: mu = Σg/n ; var = max(Σg²/n − mu·mu, 0) ;
      // B = (sqrt(var) − mu) / (sqrt(var) + mu)
      .withColumn("__mu", col("sum_gap") / col("n_gaps"))
      .withColumn("__sd",
        sqrt(greatest(col("sum_gap2") / col("n_gaps") - col("__mu") * col("__mu"), lit(0.0))))
      .withColumn("b_micro",
        when(col("__sd") + col("__mu") === 0.0, lit(null).cast("long"))
          .otherwise(floor(lit(1000000.0) * (col("__sd") - col("__mu")) / (col("__sd") + col("__mu")))
            .cast("long")))
      .drop("__mu", "__sd")
  }

  /** Multiplicative seasonal index per group and caller-chosen season
    * cell (calendar month, day-of-month, hour — any engine-stable
    * expression): `index_ppm = ⌊10⁶ · (cell mean) / (group mean)⌋` —
    * 1 000 000 means "an average cell", 1 300 000 a +30% seasonal peak;
    * the normalization behind deseasonalized trend reads and staffing
    * curves. The means never materialize: the ratio is computed as
    * `(10⁶·Σ_c·n) / (n_c·Σ)` with exact-long numerator inputs and one
    * pinned-order double divide. Calendar extractors like `month()` /
    * `dayofmonth()` are proleptic-Gregorian-identical across engines for
    * modern dates (unlike day-of-week builtins).
    *
    * Scale shape: one (group, season) hash agg + a cells-per-group-
    * bounded broadcast of group totals. Nothing else moves.
    */
  def seasonalIndex(
      df: DataFrame,
      groupCol: String,
      seasonCol: Column,
      valueCol: Column): DataFrame = {
    val cells = df
      .groupBy(col(groupCol), seasonCol.cast("long").as("season"))
      .agg(count(lit(1)).as("n"), sum(valueCol.cast("long")).as("sum_cents"))
    val totals = cells.groupBy(col(groupCol))
      .agg(sum(col("n")).as("__n"), sum(col("sum_cents")).as("__sum"))
    cells.join(broadcast(totals), Seq(groupCol))
      .withColumn("index_ppm",
        floor(lit(1000000.0) * col("sum_cents") * col("__n") / (col("n") * col("__sum")))
          .cast("long"))
      .drop("__n", "__sum")
  }

  /** Time-in-state accounting: each interval between consecutive events
    * of a key is attributed to the STATE the key was in during it (the
    * earlier event's state — "time in cart" is the gap between entering
    * the cart and whatever came next), summed per state across all
    * keys: (state, n_intervals, total_sec, mean_sec_milli). The
    * state-duration readout behind dwell-time and bottleneck analysis,
    * where [[graft.ops.Transitions]] counts WHAT followed and this
    * measures HOW LONG it took.
    *
    * Scale shape: one per-key lead window + one state-cardinality hash
    * agg; the shuffle carries (key, second, state) triples.
    */
  def timeInState(
      df: DataFrame,
      keyCol: String,
      stateCol: String,
      tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__s") +: tieCols.map(col): _*)
    df.select((Seq(col(keyCol), col(stateCol).as("state"),
        expr(s"unix_millis($tsCol) div 1000").as("__s")) ++ tieCols.map(col)): _*)
      .withColumn("__next", lead(col("__s"), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__next") - col("__s")).as("total_sec"))
      .withColumn("mean_sec_milli", expr("(1000L * total_sec) div n_intervals"))
  }

  /** Longest consecutive-day activity streak per key — the classic
    * gaps-and-islands read (DAU streaks, uptime runs): over each key's
    * DISTINCT active days, `day − row_number()` is constant exactly
    * within a run of consecutive days, so grouping on that anchor and
    * taking the max run length needs no iteration. Emits
    * (key, n_active_days, longest_streak, n_streaks).
    *
    * Scale shape: one distinct (key, day) agg, one per-key rank window,
    * two narrow rollups — all key-partitioned.
    */
  def longestStreak(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    val runs = df
      .select(col(keyCol), expr(s"unix_millis($tsCol) div 1000 div 86400").as("__day"))
      .distinct()
      .withColumn("__anchor", col("__day") - row_number().over(w))
      .groupBy(col(keyCol), col("__anchor"))
      .agg(count(lit(1)).as("__len"))
    runs.groupBy(col(keyCol))
      .agg(sum(col("__len")).as("n_active_days"),
        max(col("__len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
  }

  /** Daily value bands — the p10/p50/p90 envelope a monitoring chart
    * draws: per engine-neutral integer day (`epoch_s div 86400`), the
    * exact LOWER-quantile elements at the requested percent levels
    * (rank `⌊p·(n−1)/100⌋ + 1` of the day's ascending sort — an element
    * pick, no interpolation, so bands are engine-exact integers).
    *
    * Scale shape: one per-day rank window (days partition richly —
    * thousands of independent partitions, never global), one bounded
    * levels-pivot per day. Shuffle carries (day, value) pairs.
    */
  def dailyBands(
      df: DataFrame,
      tsCol: String,
      valueCol: Column,
      levels: Seq[Int] = Seq(10, 50, 90)): DataFrame = {
    require(levels.nonEmpty && levels.forall(p => p >= 0 && p <= 100),
      s"levels must be percents in [0, 100]: $levels")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("day")).orderBy(col("__v"))
    val ranked = df
      .select(expr(s"unix_millis($tsCol) div 1000 div 86400").as("day"),
        valueCol.cast("long").as("__v"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("day"))))
    val picks = levels.distinct.sorted.map(p =>
      max(when(col("__rk") === expr(s"(($p * (__n - 1)) div 100) + 1"), col("__v")))
        .as(s"p$p"))
    ranked.groupBy(col("day"))
      .agg(max(col("__n")).as("n"), picks: _*)
  }

  /** Lag-k autocorrelation of per-group DAILY event counts — "does
    * yesterday predict today" (lag 1) / "is there a weekly pulse"
    * (lag 7): Pearson r between the day-t and day-t+k counts over all
    * observed day pairs, from exact integer sufficient statistics with
    * the divide-and-sqrt last mile in one pinned double order,
    * `r = (n·Σxy − Σx·Σy) / (sqrt(n·Σxx − Σx·Σx) · sqrt(n·Σyy − Σy·Σy))`.
    * Days are engine-neutral integers (`epoch_s div 86400`); only
    * OBSERVED day pairs correlate (zero-fill through
    * [[gapFillMonthlyCounts]]-style spines first if absent days should
    * count as 0 — for dense telemetry they are the same thing).
    *
    * Scale shape: one (group, day) count agg, one self-equi-join on
    * (group, day+k) over the day-cardinality table, one suff-stat agg.
    * Corpus rows shuffle once into the day counts; everything after is
    * days-sized.
    */
  def dailyAutocorrelation(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      lagDays: Int): DataFrame = {
    require(lagDays >= 1, s"lagDays must be >= 1: $lagDays")
    val days = df
      .select(col(groupCol), expr(s"unix_millis($tsCol) div 1000 div 86400").as("__day"))
      .groupBy(col(groupCol), col("__day"))
      .agg(count(lit(1)).as("__c"))
    val a = days.select(col(groupCol), col("__day"), col("__c").as("__x"))
    val b = days.select(col(groupCol), (col("__day") - lagDays).as("__day"), col("__c").as("__y"))
    a.join(b, Seq(groupCol, "__day"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .withColumn("__num", col("n_pairs") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__da", col("n_pairs") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__db", col("n_pairs") * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("r_ppm",
        when(col("__da") <= 0 || col("__db") <= 0, lit(null).cast("long"))
          .otherwise(floor(lit(1000000.0) * col("__num") / (sqrt(col("__da")) * sqrt(col("__db"))))
            .cast("long")))
      .withColumn("lag_days", lit(lagDays.toLong))
      .select(col(groupCol), col("lag_days"), col("n_pairs"), col("r_ppm"))
  }

  def hazardTable(
      df: DataFrame,
      durationCol: Column,
      eventCol: Column): DataFrame = {
    val perT = df
      .groupBy(durationCol.cast("long").as("t"))
      .agg(count(lit(1)).as("__c"), count_if(eventCol).as("d"))
    Normalize.rankedPrefixSum(perT, Seq(col("t").desc), "__c", "__rk", "__cum")
      .where(col("d") > 0)
      .select(col("t"), col("__cum").as("n_risk"), col("d"))
      .withColumn("hazard_ppm", expr("(1000000L * d) div n_risk"))
  }

  /** Best lead/lag cross-correlation between every pair of groups'
    * daily-count series — "does signups' curve predict purchases' curve
    * three days later": for each ordered pair (g_a < g_b) and each lag
    * ℓ ∈ [−maxLagDays, +maxLagDays], Pearson r between a's day-t count
    * and b's day-(t+ℓ) count over the observed day pairs
    * ([[dailyAutocorrelation]]'s exact-integer sufficient statistics
    * and pinned divide-and-sqrt last mile), then ONE row per pair: the
    * lag with the highest r (ties → smaller |lag|, then smaller lag).
    * Positive best_lag ⇒ a LEADS b by that many days.
    *
    * Scale shape: the corpus shuffles once into the (group, day) count
    * table; everything after runs on that days-sized table — a
    * (2·maxLag+1)-way lag fan-out, an equi-join on the shifted day key,
    * a suff-stat aggregate and a (pairs × lags)-sized rank window
    * (key-partitioned on the pair). With G groups and D days that is
    * O(G²·D·lags) candidate rows — group keys here are low-cardinality
    * slices (event types, sources), not user ids.
    */
  def leadLagCorrelation(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      maxLagDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxLagDays >= 1, s"maxLagDays must be >= 1: $maxLagDays")
    val days = df
      .select(col(groupCol).cast("string").as("__g"),
        expr(s"unix_millis($tsCol) div 1000 div 86400").as("__day"))
      .groupBy(col("__g"), col("__day"))
      .agg(count(lit(1)).as("__c"))
    val lags = (-maxLagDays to maxLagDays).map(l => lit(l.toLong))
    val a = days.select(col("__g").as("g_a"), col("__day"), col("__c").as("__x"))
      .withColumn("lag", explode(array(lags: _*)))
      .withColumn("__bday", col("__day") + col("lag"))
    val b = days.select(col("__g").as("g_b"), col("__day").as("__bday"), col("__c").as("__y"))
    val stats = a.join(b, Seq("__bday"))
      .where(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .withColumn("__num", col("n_pairs") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__da", col("n_pairs") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__db", col("n_pairs") * col("__syy") - col("__sy") * col("__sy"))
      .where(col("__da") > 0 && col("__db") > 0)
      .withColumn("r_ppm",
        floor(lit(1000000.0) * col("__num") / (sqrt(col("__da")) * sqrt(col("__db"))))
          .cast("long"))
    val w = Window.partitionBy(col("g_a"), col("g_b"))
      .orderBy(col("r_ppm").desc, abs(col("lag")), col("lag"))
    stats
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("g_a"), col("g_b"), col("lag").as("best_lag"),
        col("n_pairs"), col("r_ppm"))
  }

  /** Silence audit per key: from each key's active-day set, the longest
    * inactivity gap, how many gaps exceeded a threshold, the last seen
    * day, and whether the key is silent NOW (past the threshold at the
    * corpus horizon) — the sudden-silence detector for sources, sensors
    * and users that [[interArrivalHistogram]]'s distribution view can't
    * name individuals from.
    *
    * Scale shape: one distinct (key, day) pass, a per-key lag window
    * over active-day-cardinality rows, one per-key agg with the horizon
    * riding a broadcast one-row crossJoin.
    */
  def silences(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      thresholdDays: Long = 7L): DataFrame = {
    require(thresholdDays >= 1, s"threshold must be >= 1 day: $thresholdDays")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val g = keyCols.map(col)
    val days = df
      .select(g :+ expr(s"unix_millis(cast($tsCol as timestamp)) div 1000 div 86400")
        .as("__day"): _*)
      .distinct()
    val horizon = days.agg(max(col("__day")).as("__horizon"))
    val w = Window.partitionBy(g: _*).orderBy(col("__day"))
    days
      .withColumn("__gap", col("__day") - lag(col("__day"), 1).over(w))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_active_days"),
        max(col("__day")).as("last_seen_day"),
        coalesce(max(col("__gap")), lit(0L)).as("max_gap_days"),
        count_if(col("__gap") > thresholdDays).as("n_silences"))
      .crossJoin(broadcast(horizon))
      .withColumn("silent_now", col("__horizon") - col("last_seen_day") > thresholdDays)
      .drop("__horizon")
  }

  /** Burst (rage-event) detection: rows where the SAME key emitted `k`
    * events of the same kind within `windowSec` — the rage-click /
    * retry-storm / crash-loop pattern, flagged at the row that completes
    * the burst (lag(k−1) within the window), plus a per-(key, kind)
    * burst count rollup. Frustration bursts predict churn better than
    * any average; this finds them in one ordered pass.
    *
    * Scale shape: one per-(key, kind) ordered window (lag only — no
    * running state), then a map-side flag and a bounded rollup.
    */
  def bursts(
      df: DataFrame,
      keyCols: Seq[String],
      kindCol: Column,
      tsCol: String,
      k: Int = 3,
      windowSec: Long = 5L): DataFrame = {
    require(k >= 2, s"burst size must be >= 2: $k")
    require(windowSec >= 1, s"window must be >= 1s: $windowSec")
    val g = keyCols.map(col)
    val w = Window.partitionBy(g :+ kindCol: _*)
      .orderBy(expr(s"unix_millis(cast($tsCol as timestamp))"))
    val ms = expr(s"unix_millis(cast($tsCol as timestamp))")
    df
      .withColumn("__ms", ms)
      .withColumn("__lagMs", lag(col("__ms"), k - 1).over(w))
      .withColumn("is_burst_end",
        col("__lagMs").isNotNull && col("__ms") - col("__lagMs") <= windowSec * 1000L)
      .drop("__ms", "__lagMs")
  }

  /** SLO compliance and burn rate per key over a trailing window: daily
    * good/total counts, the rolling `windowDays`-day compliance in ppm,
    * and the burn rate — how fast the error budget disappears relative
    * to the objective (`burn = (1 − compliance)/(1 − objective)`,
    * reported in milli; 1000 = spending exactly the budget, 14400 =
    * Google's classic 1h-of-30d page threshold). Exact integers with
    * one truncating division per reported ratio.
    *
    * Window semantics (documented contract): the trailing window is
    * `windowDays` ACTIVE days — a ROWS frame over the days that have at
    * least one event — not `windowDays` calendar days. On a sparse
    * series (keys with zero-event days) the window therefore spans MORE
    * wall-clock time than `windowDays`, which is the right read for
    * "compliance over the last N days of traffic" but NOT for a
    * calendar-day SLO clock. `calendarDays = true` switches to calendar
    * semantics: each key's day range is densified (a day `sequence`
    * from its first to its last active day, zero-filled counts), so the
    * frame spans exactly `windowDays` calendar days; zero-traffic days
    * emit rows, with NULL compliance/burn when the whole trailing
    * window is empty (0/0 is unreportable, not 100%). A NULL key value
    * is a real group (as under `groupBy`) — the densify re-join is
    * null-safe, so NULL-keyed series report identically on both paths.
    *
    * Scale shape: one (key, day) conditional-count agg, then rolling
    * sums on a per-key frame window over day-cardinality rows —
    * [[rollingSlope]]'s contract. Densify adds one key-cardinality span
    * agg, a bounded `sequence` fan-out (each key's active span in
    * days), and one (key, day) hash join — nothing event-sized.
    */
  def sloBurn(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      isGood: Column,
      windowDays: Int = 7,
      objectivePpm: Long = 990000L,
      calendarDays: Boolean = false): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    require(0 < objectivePpm && objectivePpm < 1000000L,
      s"objective must be inside (0, 1e6) ppm: $objectivePpm")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val g = keyCols.map(col)
    val daily = df
      .withColumn("day", expr(s"unix_millis(cast($tsCol as timestamp)) div 1000 div 86400"))
      .groupBy(g :+ col("day"): _*)
      .agg(count(lit(1)).as("n"), count_if(isGood).as("n_good"))
    val base =
      if (!calendarDays) daily
      else {
        // Null-safe (<=>) re-join: a NULL key value is a real group under
        // groupBy/partitionBy, and an equality join would silently zero
        // its counts on every densified day.
        val spans = daily.groupBy(g: _*).agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
        val cal = spans.select(g :+ explode(sequence(col("__d0"), col("__d1"))).as("day"): _*)
        val fact = keyCols.foldLeft(daily)((d, c) => d.withColumnRenamed(c, s"__f_$c"))
          .withColumnRenamed("day", "__f_day")
        val cond = (keyCols.map(c => col(c) <=> col(s"__f_$c")) :+
          (col("day") === col("__f_day"))).reduce(_ && _)
        cal.join(fact, cond, "left")
          .select(g :+ col("day") :+
            coalesce(col("n"), lit(0L)).as("n") :+
            coalesce(col("n_good"), lit(0L)).as("n_good"): _*)
      }
    val frame = Window.partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    base
      .withColumn("window_n", sum(col("n")).over(frame))
      .withColumn("window_good", sum(col("n_good")).over(frame))
      .withColumn("compliance_ppm",
        when(col("window_n") === 0L, lit(null).cast("long"))
          .otherwise(expr("(1000000L * window_good) div window_n")))
      .withColumn("burn_rate_milli",
        expr(s"(1000L * (1000000L - compliance_ppm)) div ${1000000L - objectivePpm}L"))
  }

  /** Rolling regression slope per key: over the trailing `w` points of
    * each series, the least-squares slope of value against the ORDER
    * column as exact integer numerator/denominator
    * (`n·Σxy − Σx·Σy` over `n·Σx² − (Σx)²`) plus a truncated-milli
    * quotient — the local-trend signal behind "is this metric
    * accelerating" alerts, where a global [[graft.ops.Trend]] fit
    * averages the question away. Flat-x windows (den = 0) emit NULL.
    *
    * Scale shape: all four suff-stat sums share ONE per-key frame
    * window (same partitioning, same ordering, same frame → one
    * WindowExec, one sort); arithmetic is map-side after.
    */
  def rollingSlope(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: Column,
      yCol: Column,
      w: Int): DataFrame = {
    require(w >= 2, s"window must cover at least 2 points: $w")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val g = keyCols.map(col)
    val frame = Window.partitionBy(g: _*).orderBy(xCol)
      .rowsBetween(-(w - 1), Window.currentRow)
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    df
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__sx", sum(x).over(frame))
      .withColumn("__sy", sum(y).over(frame))
      .withColumn("__sxy", sum(x * y).over(frame))
      .withColumn("__sxx", sum(x * x).over(frame))
      .withColumn("slope_num", expr("__n * __sxy - __sx * __sy"))
      .withColumn("slope_den", expr("__n * __sxx - __sx * __sx"))
      .withColumn("slope_milli",
        when(col("slope_den") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000 * slope_num) div slope_den")))
      .withColumn("n_window", col("__n"))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx")
  }

  /** Floor-at-zero running balance per key — inventory on hand, credit
    * balances, token buckets: deltas accumulate but the balance never
    * goes below zero (a sale against empty stock is lost, not borrowed).
    * The sequential clamp has a closed form (Skorokhod reflection):
    * `balance_t = S_t − min(0, min_{k≤t} S_k)` with S the plain running
    * sum — so the "inherently stateful" scan is TWO ordinary per-key
    * window functions sharing one sort, no typed replay, no UDAF, and
    * an exact SQL-oracle formulation. `shortfall` (how much of this
    * row's negative delta was lost to the floor) falls out of the same
    * identity.
    *
    * Scale shape: one per-key ordered window pass (sum + min share the
    * frame), map-side arithmetic after. Keys never co-shuffle.
    */
  def clampedBalance(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      deltaCol: Column): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val g = keyCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("delta", deltaCol.cast("long"))
      .withColumn("__s", sum(col("delta")).over(w))
      .withColumn("__rmin", min(col("__s")).over(w))
      .withColumn("balance", col("__s") - least(lit(0L), col("__rmin")))
      .withColumn("__prevBal",
        coalesce(lag(col("balance"), 1).over(
          Window.partitionBy(g: _*).orderBy(orderCols: _*)), lit(0L)))
      // shortfall = requested draw beyond what the clamp allowed:
      // prev + delta would have gone negative by exactly this much
      .withColumn("shortfall",
        when(col("delta") < 0, col("balance") - col("__prevBal") - col("delta"))
          .otherwise(0L))
      .drop("__s", "__rmin", "__prevBal")
  }

  /** Single changepoint per series by least squared error: the split
    * k ∈ [1, n−1] minimizing SSE(prefix) + SSE(suffix), i.e. binary
    * segmentation's first cut — "where did this metric change level".
    * Costs are integer BY SPEC: `sse_milli = 1000·ΣY² − (1000·(ΣY)²) div n`
    * per segment (one truncating division each, Spark `div` ≡ DuckDB
    * `//`), candidates ranked (cost asc, k asc) so the argmin is a
    * deterministic total order. Output per key: n, best_k (prefix
    * length), the split cost, the unsplit cost, and `gain_milli` —
    * rank series by gain to find the real level shifts.
    *
    * Scale shape: per-key ordered prefix-sum window (key-partitioned)
    * emits every candidate split, a second per-key window picks the
    * argmin — two WindowExecs over the same key partitioning, no joins.
    * Overflow: 1000·(ΣY)² needs |ΣY| < 3×10⁶ per series-prefix in
    * Long — counts/cents series are fine; rescale first otherwise.
    */
  def varianceChangepoint(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: Column): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val g = keyCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(g: _*)
    val pre = df
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__k", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__q", sum(col("__v") * col("__v")).over(w))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__st", sum(col("__v")).over(whole))
      .withColumn("__qt", sum(col("__v") * col("__v")).over(whole))
      .where(col("__k") < col("__n"))
      .withColumn("__cost",
        expr("""(1000 * __q - (1000 * __s * __s) div __k)
              + (1000 * (__qt - __q)
                 - (1000 * (__st - __s) * (__st - __s)) div (__n - __k))"""))
    val pick = Window.partitionBy(g: _*).orderBy(col("__cost"), col("__k"))
    pre
      .withColumn("__rn", row_number().over(pick))
      .where(col("__rn") === 1)
      .select(g ++ Seq(col("__n").as("n"), col("__k").as("best_k"),
        col("__cost").as("split_sse_milli"),
        expr("1000 * __qt - (1000 * __st * __st) div __n").as("total_sse_milli")): _*)
      .withColumn("gain_milli", col("total_sse_milli") - col("split_sse_milli"))
  }

  /** OHLC candle rollup: per (key, period) the Open (first value in the
    * period's total order), High, Low, Close (last) and volume — the
    * canonical downsample for any metric stream you chart or feed to a
    * range/breakout rule, exact on integer values. `orderCols` must
    * total-order rows WITHIN a (key, period) (include a unique
    * tiebreaker) so first/last are well-defined cross-engine.
    *
    * Scale shape: one per-(key, period) ordered window pass (row_number
    * + count — same partitioning, one WindowExec) feeding one hash agg.
    * No global windows; period cardinality never matters.
    */
  def ohlc(
      df: DataFrame,
      keyCols: Seq[String],
      periodCol: Column,
      orderCols: Seq[Column],
      valueCol: Column): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val g = keyCols.map(col)
    val part = g :+ col("__period")
    val w = Window.partitionBy(part: _*).orderBy(orderCols: _*)
    df
      .withColumn("__period", periodCol)
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(part: _*)))
      .groupBy(part: _*)
      .agg(count(lit(1)).as("volume"),
        max(when(col("__rn") === 1L, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(when(col("__rn") === col("__n"), col("__v"))).as("close"))
      .withColumnRenamed("__period", "period")
  }

  /** SAX symbolization (Lin et al., DMKD 2007): reduce each key's ordered
    * integer series to a short alphabet string — Piecewise Aggregate
    * Approximation (mean of every `w` consecutive points) followed by
    * breakpoint binning — the standard prelude to motif mining, series
    * indexing, and cheap whole-series similarity at scale (compare words,
    * not raw points).
    *
    * All-integer determinism: the PAA mean is `(1000·Σv) div n` (milli
    * units, truncation toward zero — Spark `div` ≡ DuckDB `//`), the
    * symbol is the count of caller-supplied milli breakpoints ≤ the PAA
    * value, rendered 'a', 'b', … Fixed breakpoints (instead of the
    * classic Gaussian quantiles) keep the op a pure map over the PAA
    * aggregate and make the word stable under data growth — callers
    * derive them once (e.g. from [[graft.ops.Metrics]] profiles).
    *
    * Scale shape: one per-key ordered window (`row_number` PARTITIONED BY
    * key — never global), one (key, window) hash agg, one per-key word
    * assembly whose input is `⌈series length / w⌉` rows. Keys never
    * co-shuffle; word length is bounded by the per-key series span.
    */
  def saxSymbols(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: Column,
      w: Int,
      breakpointsMilli: Seq[Long]): DataFrame = {
    require(w >= 1, s"window width must be >= 1: $w")
    require(breakpointsMilli.nonEmpty, "need at least one breakpoint")
    require(breakpointsMilli == breakpointsMilli.sorted && breakpointsMilli.distinct == breakpointsMilli,
      s"breakpoints must be strictly increasing: $breakpointsMilli")
    require(breakpointsMilli.size <= 25, "alphabet beyond 'z' — cap breakpoints at 25")
    val g = keyCols.map(col)
    val wk = Window.partitionBy(g: _*).orderBy(orderCols: _*)
    val paa = df
      .withColumn("__rk", row_number().over(wk).cast("long"))
      .withColumn("__win", expr("(__rk - 1) div " + w))
      .groupBy(g :+ col("__win"): _*)
      .agg(sum(valueCol.cast("long")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__paa", expr("(1000 * __s) div __n"))
    // Symbol index = #breakpoints ≤ PAA value; a chr() off a bounded int.
    val symIdx = breakpointsMilli
      .map(bp => when(col("__paa") >= bp, 1).otherwise(0))
      .reduce(_ + _)
    paa
      .withColumn("__sym", chr(lit(97) + symIdx))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_windows"), sum(col("__n")).as("n_points"),
        array_join(transform(array_sort(collect_list(struct(col("__win"), col("__sym")))),
          x => x.getField("__sym")), "").as("sax_word"))
  }
}

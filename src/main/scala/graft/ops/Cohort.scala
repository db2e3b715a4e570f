package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the standard longitudinal engagement view
  * an analytics engine owes its users: group entities by the period of
  * their FIRST activity (the cohort), then count how many of each cohort
  * are still active 1, 2, … periods later. The reference's per-client
  * metric rollups (SURVEY §3 EP3) are single-period; this is the
  * cross-period generalization.
  *
  * Scale shape: one window min over the entity key (single shuffle on
  * the key — the same partitioning a per-entity metric rollup already
  * uses) followed by one narrow aggregation on (cohort, age). No join:
  * the cohort period rides along each activity row via the window, so
  * nothing is re-shuffled wide. `countDistinct` at the end is exact and
  * shuffles only (cohort, age, key) triples — at 100 TB swap in
  * `approx_count_distinct` per the q43 error-contract pattern if the
  * key cardinality per cell overwhelms the exact path.
  */
object Cohort {

  /** Retention matrix rows: (cohort, age, n_active) — `n_active` distinct
    * `keyCol` entities whose first-ever period equals `cohort` and who
    * were active in period `cohort + age`.
    *
    * @param periodCol integer period index (e.g. `year*12 + month`);
    *                  integer periods keep the output exactly portable
    *                  across engines (no calendar/timezone drift)
    */
  def retention(df: DataFrame, keyCol: String, periodCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    df.select(col(keyCol), periodCol.cast("long").as("__m"))
      .select(col(keyCol), col("__m"), min(col("__m")).over(w).as("cohort"))
      .groupBy(col("cohort"), (col("__m") - col("cohort")).as("age"))
      .agg(count_distinct(col(keyCol)).as("n_active"))
  }

  /** RFM segmentation: per entity, Recency (days since its last activity,
    * relative to the dataset's latest date), Frequency (activity count)
    * and Monetary (summed integer amount), each quintile-scored 1..k by
    * `ntile` — the classic customer-value segmentation grid.
    *
    * Determinism: each ntile orders by (metric, entity id) — the unique
    * tiebreak that makes bucket assignment engine-portable.
    *
    * Scale shape: the base is one narrow aggregation on the entity key;
    * the dataset max date is a 1-row broadcast. Bucket assignment is
    * EXACT ntile semantics but with no global single-partition sort:
    * each metric's global rank comes from [[Normalize.denseIds]] (range
    * repartition + broadcast per-partition offsets), and the bucket is
    * then pure arithmetic on (rank, n, k) — `ntile` deals the first
    * `n mod k` buckets one extra row, which is a closed-form floor
    * division given the rank. Three range-balanced shuffles of the
    * entity-grain table, nothing ever funnels to one partition.
    */
  /** Day-grain D1/D7 return rates by signup cohort — the growth team's
    * standard activation read, where [[retention]] is the period-grain
    * triangle: per first-active day, the cohort size and how many of
    * its users came back ON day+1 (`d1`) and within days 1..7 (`d7`),
    * with exact ppm rates. Day boundaries are engine-neutral integers
    * (`epoch_s div 86400`, UTC).
    *
    * Scale shape: one distinct (user, day) agg, one per-user min for
    * the cohort day, one semi-join-free conditional re-aggregation of
    * the SAME distinct-day table — shuffles carry (user, day) pairs.
    */
  def dailyReturns(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val days = df
      .select(col(keyCol).as("__u"), expr(s"unix_millis($tsCol) div 1000 div 86400").as("__day"))
      .distinct()
    val first = days.groupBy(col("__u")).agg(min(col("__day")).as("__first"))
    days.join(first, Seq("__u"))
      .groupBy(col("__u"), col("__first"))
      .agg(
        max(when(col("__day") === col("__first") + 1L, 1L).otherwise(0L)).as("__d1"),
        max(when(col("__day") > col("__first") && col("__day") <= col("__first") + 7L, 1L)
          .otherwise(0L)).as("__d7"))
      .groupBy(col("__first").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("__d1")).as("n_d1"), sum(col("__d7")).as("n_d7"))
      .withColumn("d1_ppm", expr("(1000000L * n_d1) div n_users"))
      .withColumn("d7_ppm", expr("(1000000L * n_d7) div n_users"))
  }

  /** Heavy-user concentration: the event share owned by the top
    * `pctPpm` (parts-per-million, e.g. 10000 = top 1%) of users by
    * activity — one number answering "is this product a broad habit or
    * a whale show". The top-k cut is exact: users rank by (count desc,
    * user) through the range-partitioned [[Normalize.denseIds]] path
    * (never a single-partition global sort), and
    * `k = max(1, ⌊n_users·pct⌋)`. One row out:
    * (n_users, n_events, top_users, top_events, share_ppm).
    */
  def powerUserShare(
      df: DataFrame,
      keyCol: String,
      pctPpm: Long = 10000L): DataFrame = {
    require(pctPpm >= 1 && pctPpm <= 1000000L, s"pctPpm must be in [1, 1e6]: $pctPpm")
    val counts = df.groupBy(col(keyCol).as("__u")).agg(count(lit(1)).as("__n"))
      .withColumn("__neg", -col("__n"))
    val ranked = Normalize.denseIds(counts, "__neg", "__u", "__rk")
    val totals = ranked.groupBy().agg(
      count(lit(1)).as("n_users"), sum(col("__n")).as("n_events"))
    ranked.crossJoin(broadcast(totals))
      .withColumn("__k", greatest(lit(1L), expr(s"(n_users * $pctPpm) div 1000000")))
      .groupBy(col("n_users"), col("n_events"), col("__k").as("top_users"))
      .agg(sum(when(col("__rk") < col("__k"), col("__n")).otherwise(0L)).as("top_events"))
      .withColumn("share_ppm", expr("(1000000L * top_events) div n_events"))
  }

  def rfm(
      df: DataFrame,
      keyCol: String,
      dateCol: Column,
      amountCents: Column,
      k: Int = 5): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val per = df.groupBy(col(keyCol)).agg(
      max(to_date(dateCol)).as("__last"),
      count(lit(1)).as("frequency"),
      sum(amountCents).as("monetary_cents"))
    val mx = per.agg(max(col("__last")).as("__mx"))
    val n = per.agg(count(lit(1)).as("__nt"))
    val base = per.crossJoin(broadcast(mx))
      .withColumn("recency_days", datediff(col("__mx"), col("__last")).cast("long"))
      .drop("__last", "__mx")
      .crossJoin(broadcast(n))
    // ntile(k) over rank r in 1..n: buckets 1..rem hold big=⌈n/k⌉ rows,
    // the rest hold small=⌊n/k⌋ (rem = n mod k). Exact integer division
    // throughout — bit-identical to the window function in any engine.
    def score(d: DataFrame, metric: String, out: String): DataFrame = {
      val ranked = Normalize.denseIds(d, metric, keyCol, "__r0")
        .withColumn("__r", col("__r0") + lit(1L)).drop("__r0")
      ranked.withColumn(out,
          expr(s"""CASE WHEN __r <= (__nt % $k) * ((__nt div $k) + 1)
                  | THEN (__r - 1) div ((__nt div $k) + 1) + 1
                  | ELSE (__nt % $k) + (__r - (__nt % $k) * ((__nt div $k) + 1) - 1)
                  |        div (__nt div $k) + 1
                  |END""".stripMargin).cast("long"))
        .drop("__r")
    }
    val scored = score(score(score(base,
      "recency_days", "r_bucket"), "frequency", "f_bucket"), "monetary_cents", "m_bucket")
    scored.drop("__nt")
  }

  /** Daily/rolling active users and stickiness: per activity day, the
    * exact distinct-key counts for that day (`dau`) and for the trailing
    * `windowDays` window ending on it (`wau`), plus
    * `stickiness_ppm = ⌊1e6·dau/wau⌋` — the engagement trio every
    * activity dashboard leads with. Output days are the OBSERVED
    * activity days (a day with no activity at all emits nothing — zero-
    * fill downstream with [[graft.ops.Metrics.zeroFill]] if the calendar
    * spine matters). `dayCol` output is a yyyy-MM-dd STRING.
    *
    * The rolling distinct is NOT a window function (count-distinct over
    * a sliding frame buffers the frame): each (key, day) activity fact
    * fans out to the `windowDays` days it keeps the key active for —
    * bounded fan-out in the map phase — and `wau` is then a plain
    * distinct-count per day. Exact at any scale, two hash aggregations.
    *
    * Scale shape: dedup to (key, day) first (map-side combined), fan out
    * ×windowDays, aggregate — shuffles carry (key, day) pairs only.
    */
  def activeUsers(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val act = df.select(col(keyCol).as("__k"), to_date(col(tsCol)).as("__d")).distinct()
    val dau = act.groupBy(col("__d").as("__day"))
      .agg(count(lit(1)).as("dau"))
    val wau = act
      .select(col("__k"), explode(sequence(col("__d"),
        date_add(col("__d"), windowDays - 1))).as("__day"))
      .distinct()
      .groupBy(col("__day"))
      .agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("__day"))
      .withColumn("stickiness_ppm", expr("(1000000L * dau) div wau"))
      .select(date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"), col("stickiness_ppm"))
  }

  /** Difference-in-differences over a 2×2 (treatment × period) design:
    * the four cell aggregates (n, sum, floor-mean) in one row, plus
    * `did = (m_treat_post − m_treat_pre) − (m_ctrl_post − m_ctrl_pre)`
    * computed from the FLOOR-MEANS — the documented convention (each
    * mean truncates once; the estimate is a difference of already-
    * published numbers, which is what a metrics review actually
    * debates). The experiment readout that subtracts out both the
    * group baseline and the secular trend. Values must be non-negative
    * integers (cents); all four cells must be non-empty or the row is
    * dropped (a missing cell means the design is broken, not zero).
    *
    * Scale shape: a single conditional aggregation — one map-side-
    * combinable pass, output is one row. Nothing shuffles but eight
    * partial sums.
    */
  def diffInDiff(
      df: DataFrame,
      isTreated: Column,
      isPost: Column,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    def n(in: Column) = count_if(in)
    def s(in: Column) = coalesce(sum(when(in, v)), lit(0L))
    val tp = isTreated && isPost
    val t0 = isTreated && !isPost
    val cp = !isTreated && isPost
    val c0 = !isTreated && !isPost
    val aggs = Seq(
      n(t0).as("n_t_pre"), s(t0).as("__s_t_pre"),
      n(tp).as("n_t_post"), s(tp).as("__s_t_post"),
      n(c0).as("n_c_pre"), s(c0).as("__s_c_pre"),
      n(cp).as("n_c_post"), s(cp).as("__s_c_post"))
    df.agg(aggs.head, aggs.tail: _*)
      .where(col("n_t_pre") > 0 && col("n_t_post") > 0 &&
        col("n_c_pre") > 0 && col("n_c_post") > 0)
      .withColumn("m_t_pre", expr("__s_t_pre div n_t_pre"))
      .withColumn("m_t_post", expr("__s_t_post div n_t_post"))
      .withColumn("m_c_pre", expr("__s_c_pre div n_c_pre"))
      .withColumn("m_c_post", expr("__s_c_post div n_c_post"))
      .withColumn("did",
        (col("m_t_post") - col("m_t_pre")) - (col("m_c_post") - col("m_c_pre")))
      .drop("__s_t_pre", "__s_t_post", "__s_c_pre", "__s_c_post")
  }

  /** Stickiness per calendar week — mean-DAU over WAU, THE
    * product-engagement ratio ("of the people who showed up this week,
    * what share shows up on an average active day"): per week,
    * `stickiness_ppm = (10⁶·Σ_day DAU(day)) div (n_active_days·WAU)`.
    * Exact integers on engine-neutral epoch-day/week ints; weeks with
    * one active day degenerate to DAU/WAU as they should.
    *
    * Scale shape: one distinct over (week, day, actor) — the only
    * full-data pass, map-side combined — then a (week, day) count, a
    * week-level distinct-actor count, and a weeks-sized join. The WAU
    * distinct re-shuffles actor ids once; no windows.
    */
  def stickiness(df: DataFrame, actorCol: String, tsCol: String): DataFrame = {
    val triples = df
      .select(expr(s"unix_millis($tsCol) div 1000 div 86400").as("__day"),
        col(actorCol).as("__a"))
      .withColumn("__week", expr("__day div 7"))
      .select(col("__week"), col("__day"), col("__a"))
      .distinct()
    val daily = triples.groupBy(col("__week"), col("__day"))
      .agg(count(lit(1)).as("__dau"))
      .groupBy(col("__week"))
      .agg(count(lit(1)).as("n_active_days"), sum(col("__dau")).as("__sumDau"))
    val weekly = triples.select(col("__week"), col("__a")).distinct()
      .groupBy(col("__week")).agg(count(lit(1)).as("wau"))
    daily.join(weekly, Seq("__week"))
      .select(col("__week").as("week"), col("n_active_days"), col("wau"),
        expr("__sumDau div n_active_days").as("mean_dau"),
        expr("(1000000L * __sumDau) div (n_active_days * wau)").as("stickiness_ppm"))
  }

  /** Decile migration matrix between two periods: every actor ranked by
    * value within each period (dense global ranking via the range-
    * partitioned [[graft.ops.Normalize.denseIds]] — never a
    * single-partition window), bucketed into deciles by
    * `(10·(rank−1)) div n`, and the (decile_a → decile_b) flow counted —
    * "did the top spenders stay top" as one 11×11 table (decile −1 =
    * absent from that period, so entries and exits are rows, not
    * footnotes).
    *
    * Scale shape: two per-period value aggs, two denseIds rankings
    * (each a balanced range-partitioned sort over actor-cardinality
    * rows), one actor-keyed full-outer join, one bounded matrix agg.
    */
  def decileMigration(
      df: DataFrame,
      actorCol: String,
      periodCol: Column,
      periodA: String,
      periodB: String,
      valueCents: Column): DataFrame = {
    val per = df
      .where(periodCol.isin(periodA, periodB))
      .groupBy(periodCol.as("__p"), col(actorCol).as("__a"))
      .agg(sum(valueCents).as("__v"))
      .withColumn("__negv", -col("__v"))
    def deciles(p: String, out: String) = {
      val ranked = graft.ops.Normalize.denseIds(
        per.where(col("__p") === p), "__negv", "__a", "__rk")
      val n = ranked.groupBy().agg(count(lit(1)).as("__n"))
      ranked.crossJoin(broadcast(n))
        .select(col("__a"), expr("(10L * __rk) div __n").as(out))
    }
    deciles(periodA, "decile_a")
      .join(deciles(periodB, "decile_b"), Seq("__a"), "full_outer")
      .groupBy(coalesce(col("decile_a"), lit(-1L)).as("decile_a"),
        coalesce(col("decile_b"), lit(-1L)).as("decile_b"))
      .agg(count(lit(1)).as("n_actors"))
  }

  /** Net / gross revenue retention per month: of the revenue base laid
    * down by month m−1's customers, how much survived into m (GRR caps
    * each customer at their prior spend; NRR lets expansion count) —
    * THE SaaS-health pair, exact in integer cents and truncated ppm.
    * New-customer revenue is excluded from both by construction.
    *
    * Scale shape: one (customer, month) revenue agg, one customer-keyed
    * self-join at lag 1 month (left join from the prior-month side so
    * full churn still contributes its zero), one month-level agg.
    */
  def revenueRetention(
      df: DataFrame,
      customerCol: String,
      monthCol: Column,
      amountCents: Column): DataFrame = {
    val monthly = df
      .groupBy(col(customerCol).as("__c"), monthCol.as("__m"))
      .agg(sum(amountCents).as("__rev"))
    val prev = monthly.select(col("__c"), (col("__m") + 1L).as("month"),
      col("__rev").as("__base"))
    val cur = monthly.select(col("__c"), col("__m").as("month"),
      col("__rev").as("__cur"))
    prev.join(cur, Seq("__c", "month"), "left")
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_base_customers"),
        sum(col("__base")).as("base_cents"),
        // NOT least(base, cur) alone: least() in BOTH engines skips
        // NULLs, so a churned customer's base would count as retained
        sum(when(col("__cur").isNull, 0L)
          .otherwise(least(col("__base"), col("__cur")))).as("retained_cents"),
        sum(coalesce(col("__cur"), lit(0L))).as("carried_cents"),
        count_if(col("__cur").isNull).as("n_churned"))
      .withColumn("grr_ppm", expr("(1000000L * retained_cents) div base_cents"))
      .withColumn("nrr_ppm", expr("(1000000L * carried_cents) div base_cents"))
  }

  /** Weekly growth accounting: every active user classifies as NEW
    * (first week ever), RETAINED (also active the week before) or
    * RESURRECTED (active before, but not last week); CHURNED counts
    * land on the first week a previously-active user goes quiet. The
    * quick ratio `(new + resurrected) / churned` is the one-line
    * growth-quality readout. Exact counts on engine-neutral epoch-week
    * integers.
    *
    * Scale shape: one distinct (user, week) pass, per-USER lag/lead/min
    * windows (key-partitioned), two week-level aggs outer-merged. The
    * churn week may extend one week past the data horizon — that final
    * row reports the last week's quiet-goers, by design.
    */
  def growthAccounting(df: DataFrame, actorCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weeks = df
      .select(col(actorCol).as("__a"),
        expr(s"unix_millis($tsCol) div 1000 div 86400 div 7").as("week"))
      .distinct()
    val w = Window.partitionBy(col("__a")).orderBy(col("week"))
    val tagged = weeks
      .withColumn("__first", min(col("week")).over(Window.partitionBy(col("__a"))))
      .withColumn("__prev", lag(col("week"), 1).over(w))
      .withColumn("__next", lead(col("week"), 1).over(w))
    val states = tagged.groupBy(col("week"))
      .agg(count_if(col("week") === col("__first")).as("n_new"),
        count_if(col("__prev") === col("week") - 1).as("n_retained"),
        count_if(col("week") =!= col("__first") &&
          (col("__prev").isNull || col("__prev") < col("week") - 1)).as("n_resurrected"),
        count(lit(1)).as("n_active"))
    val churn = tagged
      .where(col("__next").isNull || col("__next") > col("week") + 1)
      .select((col("week") + 1L).as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("n_churned"))
    states.join(churn, Seq("week"), "full_outer")
      .select(col("week"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .withColumn("quick_ratio_milli",
        when(col("n_churned") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000L * (n_new + n_resurrected)) div n_churned")))
  }

  /** Cohort LTV curve: per (first-purchase cohort month, months-since)
    * the active-customer count, period revenue, and the cumulative
    * revenue per original cohort member — the "do newer cohorts
    * monetize faster" table behind every growth model, exact in integer
    * cents/milli.
    *
    * Scale shape: one min-agg for cohort assignment, a customer-keyed
    * join back (both sides shuffle on the customer key once), one
    * (cohort, age) agg, then a PER-COHORT cumulative window over
    * age-cardinality rows. Cohort sizes ride a broadcast join.
    */
  def ltvCurve(
      df: DataFrame,
      customerCol: String,
      monthCol: Column,
      amountCents: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(customerCol).as("__c"), monthCol.as("__m"),
      amountCents.as("__amt"))
    val cohorts = base.groupBy(col("__c")).agg(min(col("__m")).as("cohort_month"))
    val sizes = cohorts.groupBy(col("cohort_month")).agg(count(lit(1)).as("cohort_size"))
    val aged = base.join(cohorts, Seq("__c"))
      .withColumn("age_months", col("__m") - col("cohort_month"))
      .groupBy(col("cohort_month"), col("age_months"))
      .agg(countDistinct(col("__c")).as("n_active"),
        sum(col("__amt")).as("revenue_cents"))
    val w = Window.partitionBy(col("cohort_month")).orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aged
      .join(broadcast(sizes), Seq("cohort_month"))
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(w))
      .withColumn("cum_rev_per_user_milli",
        expr("(1000L * cum_revenue_cents) div (100L * cohort_size)"))
  }

  /** Exact audience overlap between every pair of segments: shared
    * actors, per-segment sizes, Jaccard and overlap-coefficient ppm —
    * the "how distinct are these cohorts really" matrix behind campaign
    * dedup and segment-consolidation calls. [[graft.ops.Dedup]]'s
    * bottom-k sketch is the fixed-memory estimate of exactly this; here
    * segments are few enough to pay for the truth.
    *
    * Scale shape: one distinct (segment, actor) pass, then a self-join
    * keyed on ACTOR — the intermediate is Σ_actor segcount(actor)²,
    * bounded by the segment count per actor (≤ S, the number of
    * segments), never by actor cardinality. Segment sizes ride in on a
    * segments-sized broadcast join.
    */
  def audienceOverlap(df: DataFrame, segmentCol: String, actorCol: String): DataFrame = {
    val sa = df.select(col(segmentCol).cast("string").as("__s"), col(actorCol).as("__a"))
      .where(col("__s").isNotNull && col("__a").isNotNull)
      .distinct()
    val sizes = sa.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
    val inter = sa.alias("a")
      .join(sa.alias("b"), col("a.__a") === col("b.__a") && col("a.__s") < col("b.__s"))
      .groupBy(col("a.__s").as("seg_a"), col("b.__s").as("seg_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("__s").as("seg_a"), col("__n").as("size_a"))), Seq("seg_a"))
      .join(broadcast(sizes.select(col("__s").as("seg_b"), col("__n").as("size_b"))), Seq("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("size_a"), col("size_b"), col("n_common"),
        expr("(1000000L * n_common) div (size_a + size_b - n_common)").as("jaccard_ppm"),
        expr("(1000000L * n_common) div least(size_a, size_b)").as("overlap_ppm"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates a 100 TB pipeline runs before promoting a table:
  * declarative constraint checks (completeness / uniqueness / range) and
  * an order-independent content checksum for replication verification.
  *
  * Both are single-pass aggregations: the audit never materializes
  * violating rows (counts only), the checksum never ships rows (one
  * 40-bit fingerprint per row, combined map-side). At 1000 executors the
  * only traffic is the final partial-aggregate merge.
  */
object Audit {

  /** Resolve a caller-provided column NAME literally: `col("a.b")` would
    * parse the dot as struct-field access, so audit ops (whose whole job
    * is profiling arbitrary landing-zone columns) quote the name,
    * doubling embedded backticks per the SQL identifier-escape rule.
    */
  private def colExact(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** One-pass constraint audit. Emits one row per check:
    * `(check, column, violations, n_rows, pass)`.
    *
    *  - `not_null`: rows where the column IS NULL;
    *  - `unique`: `count(col) − count(DISTINCT col)` — duplicate surplus
    *    over NON-NULL rows (both counts skip NULLs, so a nullable key
    *    never misreports its NULL rows as duplicates; pair with a
    *    `not_null` check on the same column to police NULLs explicitly).
    *    Exact distinct is fine for a handful of audited key columns (one
    *    expand each); at extreme cardinality swap for HLL and a
    *    tolerance, which changes the contract — keep that a caller
    *    decision, not a silent fallback;
    *  - `range`: non-null values of the integer expression outside
    *    `[lo, hi]`.
    *
    * All checks compute in ONE `agg` over one scan (map-side combined),
    * then pivot to long form with a 0-shuffle `explode` of a literal
    * array — the audit costs one pass regardless of how many checks run.
    */
  def constraints(
      df: DataFrame,
      notNullCols: Seq[String],
      uniqueCols: Seq[String],
      ranges: Seq[(String, Column, Long, Long)]): DataFrame = {
    require(notNullCols.nonEmpty || uniqueCols.nonEmpty || ranges.nonEmpty,
      "at least one constraint required")
    val nn = notNullCols.map(c => (s"not_null:$c", count_if(col(c).isNull)))
    val uq = uniqueCols.map(c =>
      (s"unique:$c", count(col(c)) - countDistinct(col(c))))
    val rg = ranges.map { case (name, e, lo, hi) =>
      (s"range:$name", count_if(e.isNotNull && (e < lo || e > hi)))
    }
    val checks = nn ++ uq ++ rg
    val aggs = checks.map { case (name, e) => e.as(name) } :+
      count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.map { case (name, _) =>
      val Array(kind, column) = name.split(":", 2)
      struct(lit(kind).as("check"), lit(column).as("column"),
        col(name).as("violations"))
    }
    one.select(explode(array(entries: _*)).as("c"), col("__n").as("n_rows"))
      .select(col("c.check"), col("c.column"), col("c.violations"),
        col("n_rows"), (col("c.violations") === 0L).as("pass"))
  }

  /** Order-independent content checksum per group — the cheap "are these
    * two replicas / two runs identical?" answer that does not require
    * sorting or shipping data: per row, the first 10 hex digits (40 bits)
    * of `md5(concat_ws('|', cols))` decoded to a Long; per group, the
    * COUNT, SUM and XOR of those fingerprints. Sum and xor are both
    * commutative, so the result is partitioning- and order-invariant,
    * and 40-bit fingerprints keep the sum inside Long up to ~10⁶ rows
    * per group (pre-scale to more groups beyond that).
    *
    * NULL handling: `concat_ws` skips NULLs, so `(NULL,'a')` and
    * `('a',NULL)` collide — callers with nullable columns should
    * coalesce to a sentinel first. Collision posture: 40 bits is a
    * verification checksum (like a CRC), not a cryptographic identity.
    */
  def groupChecksum(df: DataFrame, groupCols: Seq[String], hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty, "hashCols must be non-empty")
    val fp = graft.functions.TextFunctions.md5Prefix(
      concat_ws("|", hashCols.map(col): _*), 10)
    val grouped =
      if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols.map(col): _*)
    grouped.agg(
      count(lit(1)).as("n_rows"),
      sum(fp).as("checksum_sum"),
      bit_xor(fp).as("checksum_xor"))
  }

  /** Functional-dependency audit: does `detCols → depCol` hold? For each
    * determinant value that maps to MORE than one dependent value, emits
    * `(detCols…, n_rows, n_distinct_dep, top_count, violations)` where
    * `violations = n_rows − top_count` — the minimum number of rows that
    * must be corrected (or the FD candidate rejected) for the dependency
    * to hold. Clean determinants are omitted, so output is bounded by the
    * actual violation count, not key cardinality.
    *
    * Scale shape: two stacked narrow aggregations — `(det, dep)` counts
    * (map-side combined) then per-det max/sum — both on the same key
    * prefix, so AQE plans the second from the first's statistics. No
    * joins, no windows. NULL dependents count as ONE distinct value (an
    * FD violated by NULLs is still violated; GROUP BY groups NULLs into a
    * single class in Spark and ANSI SQL alike, so no sentinel is needed).
    */
  def functionalDependency(
      df: DataFrame,
      detCols: Seq[String],
      depCol: String): DataFrame = {
    require(detCols.nonEmpty, "detCols must be non-empty")
    df.groupBy((detCols :+ depCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(detCols.map(col): _*)
      .agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_distinct_dep"),
        max(col("__n")).as("top_count"))
      .where(col("n_distinct_dep") > 1)
      .withColumn("violations", col("n_rows") - col("top_count"))
  }

  /** k-anonymity audit over quasi-identifier columns: every equivalence
    * class smaller than `k` — the rows that would have to be suppressed
    * or generalized before a privacy-safe release. Emits
    * `(quasiCols…, group_size)` per violating class; total suppressed
    * rows = Σ group_size of the result.
    *
    * Scale shape: one map-side-combined count aggregation + a post-agg
    * filter — output is bounded at (k−1)·|violating classes|, never the
    * table. NULLs in a quasi column form their own class (they are an
    * identifiable value to an attacker too).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .where(col("group_size") < k)
  }

  /** k-anonymity SUPPRESSION — [[kAnonymity]] is the audit, this is the
    * release transform: rows whose quasi-identifier class is smaller
    * than `k` get those columns nulled (cell suppression) and flagged,
    * everything else passes untouched — the output table is safe to
    * hand over wholesale, with `suppressed` telling the analyst exactly
    * which rows lost precision and why their quasi columns are NULL.
    *
    * Scale shape: one map-side-combined class count (class-cardinality
    * output), hash-joined back on the quasi key — no window over the
    * table. NULL quasi values form their own class, as in the audit.
    */
  def kSuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2: $k")
    // counts-side keys renamed so the self-derived join is unambiguous
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__gs"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("__gs"): _*)
    // null-safe join keys: a NULL quasi value must match its own class
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    val keep = col("__gs") >= k
    val out = quasiCols.map(c => when(keep, col(c)).otherwise(lit(null)).as(c)) ++
      df.columns.filterNot(quasiCols.contains).map(c => col(c)) :+
      (!keep).as("suppressed")
    df.join(counts, cond, "left").select(out: _*)
  }

  /** l-diversity audit — [[kAnonymity]]'s necessary complement: a class
    * can be k-large yet still leak if everyone in it shares the same
    * sensitive value (the homogeneity attack). Per quasi-identifier
    * class: size, distinct sensitive values, and `violates = 1` when
    * diversity < `l`. Emits EVERY class (the release gate needs the
    * passing ones too — filter on `violates` for the suppression list).
    * NULL sensitive values count as one distinct value (an attacker
    * learns "missing", which is information).
    *
    * Scale shape: one two-level aggregation — (quasi…, sensitive)
    * counts collapse map-side, then per-class distinct = count of the
    * first level — so the shuffle carries class×value counts, never
    * rows.
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(l >= 2, s"l must be >= 2: $l")
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("group_size"),
        count(lit(1)).as("n_sensitive"))
      .withColumn("violates", when(col("n_sensitive") < l, 1L).otherwise(0L))
  }

  /** t-closeness audit — the third leg of the release-privacy tripod
    * ([[kAnonymity]] → class size, [[lDiversity]] → value variety, this →
    * value DISTRIBUTION): a class is unsafe when its sensitive-attribute
    * distribution diverges from the table-wide one (an attacker who knows
    * someone's class learns "this class skews rich" even with l diverse
    * values present). Distance is the ordered-attribute earth-mover
    * distance of the t-closeness paper: over the globally-observed
    * ordered bucket domain (index 0..m−1, unit spacing),
    * `t = Σᵢ |CumP(i) − CumQ(i)| / (m−1)`, computed cross-multiplied so
    * every comparison is exact integer:
    * `t_num = Σᵢ |N·cum_c(i) − n_c·cum_g(i)|`,
    * `t_ppm = ⌊10⁶·t_num / ((m−1)·N·n_c)⌋`. Per class out:
    * (quasi…, n_rows, m_buckets, t_num, t_ppm) — every class, so the
    * caller thresholds `t_ppm` for the suppression list. Buckets the
    * class never saw still shift its cumulative gap — the zero-fill grid
    * below is semantics, not cosmetics.
    *
    * Scale shape: two count aggregations (class×bucket, bucket) + a
    * broadcast of the bucket table (bounded: buckets are a deliberate
    * quantization, ≤ hundreds) against the class list — the grid is
    * |classes|·m narrow rows; running sums are per-class windows
    * (partitioned, range-balanced). No global window, no row-grain
    * shuffle beyond the first count agg.
    */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveBucket: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    val q = quasiCols.map(col)
    val classes = df.groupBy(q: _*).agg(count(lit(1)).as("n_rows"))
    val global = df.groupBy(sensitiveBucket.cast("long").as("__b"))
      .agg(count(lit(1)).as("__gb"))
    val perClass = df.groupBy((q :+ sensitiveBucket.cast("long").as("__b")): _*)
      .agg(count(lit(1)).as("__cb"))
    val totals = global.groupBy().agg(sum(col("__gb")).as("__n"), count(lit(1)).as("m_buckets"))
    val w = Window.partitionBy(q: _*).orderBy(col("__b"))
    classes
      .crossJoin(broadcast(global.crossJoin(totals)))
      .join(perClass, quasiCols :+ "__b", "left")
      .na.fill(0L, Seq("__cb"))
      .withColumn("__cumc", sum(col("__cb")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__cumg", sum(col("__gb")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__gap", abs(col("__n") * col("__cumc") - col("n_rows") * col("__cumg")))
      .groupBy((q ++ Seq(col("n_rows"), col("m_buckets"), col("__n"))): _*)
      .agg(sum(col("__gap")).as("t_num"))
      .withColumn("t_ppm",
        when(col("m_buckets") < 2, lit(null).cast("long"))
          .otherwise(expr("(1000000L * t_num) div ((m_buckets - 1) * __n * n_rows)")))
      .drop("__n")
  }

  /** One-row DATASET CARD for a document corpus — the headline numbers a
    * training-data release ships with: document/language/source counts,
    * exact char/word/token totals, the exact-duplicate rate
    * (md5-fingerprint collisions over normalized text), and mean
    * document length — each exact-integer so the card reproduces
    * bit-for-bit on any engine.
    *
    * Scale shape: one (lang, source, fingerprint) aggregation collapses
    * the corpus to distinct-document-sized rows map-side (document
    * bodies never shuffle — only fingerprints and counters), then the
    * final multi-distinct aggregate's Expand runs over THAT collapsed
    * table, not the corpus. Two shuffles total, both narrow.
    */
  def datasetCard(
      docs: DataFrame,
      langCol: String = "lang",
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    val t = coalesce(col(textCol), lit(""))
    val collapsed = docs
      .select(col(langCol).as("__lang"), col(sourceCol).as("__source"),
        md5(trim(lower(t))).as("__fp"),
        length(t).cast("long").as("__chars"),
        TextFunctions.wordCount(t).cast("long").as("__words"),
        TextFunctions.tokenCount(t).cast("long").as("__tokens"))
      .groupBy(col("__lang"), col("__source"), col("__fp"))
      .agg(count(lit(1)).as("__n"), sum(col("__chars")).as("__c"),
        sum(col("__words")).as("__w"), sum(col("__tokens")).as("__t"))
    collapsed.agg(
      sum(col("__n")).as("n_docs"),
      count_distinct(col("__lang")).as("n_langs"),
      count_distinct(col("__source")).as("n_sources"),
      count_distinct(col("__fp")).as("n_distinct"),
      sum(col("__c")).as("total_chars"),
      sum(col("__w")).as("total_words"),
      sum(col("__t")).as("total_tokens"))
      .withColumn("dup_ppm", expr("(1000000L * (n_docs - n_distinct)) div n_docs"))
      .withColumn("mean_words_milli", expr("(1000L * total_words) div n_docs"))
      .withColumn("fertility_ppm",
        when(col("total_words") === 0, 0L)
          .otherwise(expr("(1000000L * total_tokens) div total_words")))
  }

  /** Conversion lift per segment vs the whole population, exact-integer:
    * `lift_ppm = ⌊10⁶·(k_s·n)/(n_s·k)⌋` (1 000 000 = average, 2 000 000
    * = double the global rate) plus both rates in ppm — the campaign /
    * cohort screening table, with the cross-multiplied division keeping
    * everything in 64-bit integers (k_s·n ≤ n² — fine to 3·10⁹ rows).
    *
    * Scale shape: one map-side-combinable segment aggregation + a
    * broadcast one-row global; nothing else moves.
    */
  def segmentLift(
      df: DataFrame,
      segCols: Seq[String],
      flagCol: Column): DataFrame = {
    require(segCols.nonEmpty, "segCols must be non-empty")
    val seg = df.groupBy(segCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), count_if(flagCol).as("n_flagged"))
    val glob = seg.groupBy()
      .agg(sum(col("n_rows")).as("__n"), sum(col("n_flagged")).as("__k"))
    seg.crossJoin(broadcast(glob))
      .withColumn("rate_ppm", expr("(1000000L * n_flagged) div n_rows"))
      .withColumn("global_rate_ppm", expr("(1000000L * __k) div __n"))
      .withColumn("lift_ppm",
        when(col("__k") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * n_flagged * __n) div (n_rows * __k)")))
      .drop("__n", "__k")
  }

  /** Referential-integrity audit over a set of foreign-key relations:
    * for each `(name, child, childKey, parent, parentKey)`, the number of
    * child rows whose key has no parent (NULL child keys are skipped —
    * they are [[constraints]]' `not_null` business, not orphanhood).
    * Emits `(relation, n_orphans, n_rows, pass)` — the gate every
    * warehouse promotion runs before trusting joins downstream.
    *
    * Scale shape: per relation, one left-anti join on projected KEY
    * columns only (bodies never shuffle) feeding a count; parents
    * deduplicate map-side via the anti join itself. Results union as
    * literal-sized rows.
    */
  def fkOrphans(
      relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "at least one relation required")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val c = child.select(col(childKey).as("__k")).where(col("__k").isNotNull)
      val p = parent.select(col(parentKey).as("__k"))
      val orphans = c.join(p, Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val total = c.agg(count(lit(1)).as("n_rows"))
      orphans.crossJoin(total).select(
        lit(name).as("relation"), col("n_orphans"), col("n_rows"),
        (col("n_orphans") === 0L).as("pass"))
    }.reduce(_ unionAll _)
  }

  /** Join-key skew profile: the top-`topN` heaviest values of `keyCol`
    * with exact count, share of all rows (ppm), and cumulative share —
    * the pre-flight audit run before any large join or aggregation to
    * decide whether a key needs salting ([[SkewJoin]]), an AQE skew
    * threshold, or a broadcast instead. Reading it: a top key holding
    * >5–10% of rows means one reducer inherits that fraction of the
    * shuffle; a flat profile means hash partitioning is safe as-is.
    *
    * Scale shape: one map-side-combined count aggregation (the only
    * full-data pass), then a global top-N via TakeOrdered — no full sort
    * — and the cumulative window runs over just `topN` rows on a single
    * task, which is exactly where a driver-sized window belongs. The
    * grand total rides along as a broadcast one-row crossJoin.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1: $topN")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    val top = counts
      .orderBy(col("n").desc, col(keyCol))
      .limit(topN)
      .crossJoin(broadcast(total))
    val w = Window.orderBy(col("n").desc, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(keyCol), col("n"),
        floor(lit(1000000L) * col("n") / col("__total")).as("share_ppm"),
        floor(lit(1000000L) * sum(col("n")).over(w) / col("__total")).as("cum_share_ppm"))
  }

  /** Pre-flight join cardinality estimate: the exact output row count a
    * key-equi-join would produce (Σ_k n_left(k)·n_right(k)) and the
    * `topN` keys contributing most of it — run on the KEY HISTOGRAMS
    * (two count aggregations), never the join itself. This is the audit
    * that catches a many-to-many key blow-up before it takes down a
    * cluster: a single key pair (10⁶ × 10⁶) predicts 10¹² output rows
    * from two cheap counts.
    *
    * Emits `(rank, key, n_left, n_right, est_rows, est_share_ppm)`,
    * ranked by per-key output size desc. Scale shape: two map-side-
    * combined count aggs, a key-cardinality-sized inner join, TakeOrdered
    * for the top-N, one-row broadcast total.
    */
  /** Train/test contamination audit: how many related pairs straddle a
    * split boundary. `pairs` is any relatedness relation (near-dup pairs,
    * same-user sessions, citation edges); `splits` assigns each id a split
    * label. A leak-free grouped split (e.g. [[Sampling.groupSplit]] over
    * the same relation's components) must report 0 — run this as the
    * release gate that PROVES it, and on naive per-row splits to quantify
    * what grouping bought.
    *
    * Scale shape: two equi-joins of the pair list against the (id, split)
    * projection — the pair relation is near-dup-sized (≪ corpus), and
    * only ids/labels shuffle. One global one-row agg at the end.
    */
  def splitLeakage(
      pairs: DataFrame,
      splits: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      idCol: String = "doc_id",
      splitCol: String = "split"): DataFrame = {
    val s = splits.select(col(idCol), col(splitCol))
    pairs.select(col(aCol), col(bCol))
      .join(s.select(col(idCol).as(aCol), col(splitCol).as("__sa")), Seq(aCol))
      .join(s.select(col(idCol).as(bCol), col(splitCol).as("__sb")), Seq(bCol))
      .agg(
        count(lit(1)).as("n_pairs"),
        count(when(col("__sa") =!= col("__sb"), 1)).as("cross_split_pairs"))
  }

  def joinEstimate(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN must be >= 1: $topN")
    val ln = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val rn = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    val per = ln.join(rn, "key")
      .withColumn("est_rows", col("n_left") * col("n_right"))
    val total = per.agg(sum(col("est_rows")).as("__total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("est_rows").desc, col("key"))
    per
      .orderBy(col("est_rows").desc, col("key"))
      .limit(topN)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("key"), col("n_left"), col("n_right"), col("est_rows"),
        floor(lit(1000000L) * col("est_rows") / col("__total")).as("est_share_ppm"))
  }

  /** Column-level drift report between two snapshots of the same table —
    * the per-column complement of row-level [[TableDiff]]: one row per
    * profiled column with (rows, nulls, distinct, min, max, sum) from
    * each side, the data-quality monitor a pipeline runs between loads
    * ("did this column's null rate / range / mass shift?").
    *
    * All stats are integer-exact on long-castable columns, so the report
    * hashes identically across engines.
    *
    * Scale shape: ONE full-scan aggregation per snapshot producing a
    * single row (every stat is an ordinary agg), unpivoted to per-column
    * rows by a `stack` over that 1-row result, then a tiny
    * columns-count-sized join. The multiple `count(DISTINCT ...)`s plan
    * as one Expand (k× row multiplication for k profiled columns) feeding
    * one shuffle of per-column partial distinct sets — the k× input
    * expansion of exact multi-distinct. `approxDistinct = true` swaps in
    * `approx_count_distinct` (HyperLogLog++): partials collapse to one
    * fixed-size sketch per column with NO Expand — the bounded-memory
    * path for a wide audit over a huge table, at ~2% relative error on
    * the distinct counts only (every other stat stays exact). Exact is
    * the default because the report is oracled.
    */
  def columnDrift(
      a: DataFrame,
      b: DataFrame,
      cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    def profile(df: DataFrame, tag: String): DataFrame = {
      def nd(c: String) =
        if (approxDistinct) approx_count_distinct(colExact(c)) else count_distinct(colExact(c))
      // Internal aliases are INDEX-based and the label is a lit(): no raw
      // column name is ever spliced into parsed SQL text, so names with
      // quotes/backticks/dots can't break or mislabel the unpivot.
      val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
        count(lit(1)).as(s"__n$i"),
        count(when(colExact(c).isNull, 1)).as(s"__nulls$i"),
        nd(c).as(s"__nd$i"),
        min(colExact(c)).cast("long").as(s"__min$i"),
        max(colExact(c)).cast("long").as(s"__max$i"),
        sum(colExact(c)).cast("long").as(s"__sum$i")) }
      val row = df.agg(aggs.head, aggs.tail: _*)
      val kvs = cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("column_name"),
          col(s"__n$i").as(s"n_$tag"), col(s"__nulls$i").as(s"nulls_$tag"),
          col(s"__nd$i").as(s"distinct_$tag"), col(s"__min$i").as(s"min_$tag"),
          col(s"__max$i").as(s"max_$tag"), col(s"__sum$i").as(s"sum_$tag")) }
      row.select(explode(array(kvs: _*)).as("kv")).select(col("kv.*"))
    }
    profile(a, "a").join(profile(b, "b"), "column_name")
  }

  /** Value-type inference over STRING columns — the landing-zone
    * profiler that answers "what is actually in this column" before any
    * schema is trusted: each value classifies into one of
    * null / empty / int / float / bool / date / datetime / json / other
    * by anchored regexes (first match in that precedence wins), and the
    * op emits (column_name, inferred, n) counts. A column that sniffs
    * 99.8% int and 0.2% other is a typed column with dirty rows — the
    * 0.2% is the actionable output.
    *
    * The regexes are deliberately conservative (no exponent floats, no
    * locale dates) and use only syntax with identical semantics in
    * Java regex and RE2, so any engine reproduces the same classes.
    *
    * Scale shape: one narrow projection + a (columns × 9)-cardinality
    * hash aggregate over the melted stream — map-side combined, no
    * windows, no joins; the melt multiplies rows by |cols| but each row
    * is two small strings.
    */
  def typeSniff(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to sniff")
    def classify(c: Column): Column =
      when(c.isNull, "null")
        .when(c === "", "empty")
        .when(c.rlike("^[+-]?[0-9]+$"), "int")
        .when(c.rlike("^[+-]?[0-9]+\\.[0-9]+$"), "float")
        .when(lower(c) === "true" || lower(c) === "false", "bool")
        .when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"), "date")
        .when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?$"),
          "datetime")
        .when(c.rlike("^\\{.*\\}$"), "json")
        .otherwise("other")
    // Index-aliased melt (struct/explode, no SQL-text splicing) — same
    // row multiplication as a stack, immune to hostile column names.
    val classified = df.select(cols.zipWithIndex.map { case (c, i) =>
      classify(colExact(c).cast("string")).as(s"__c$i") }: _*)
    val kvs = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column_name"), col(s"__c$i").as("inferred")) }
    val melted = classified.select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.column_name").as("column_name"), col("kv.inferred").as("inferred"))
    melted.groupBy(col("column_name"), col("inferred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Co-missingness matrix: for every ordered pair of audited columns,
    * how often both are null TOGETHER vs what independence predicts —
    * the structural-missingness detector ("these two fields come from
    * the same upstream call; when it fails, both vanish") that a
    * per-column null count can never see. Emits exact counts plus
    * `conull_ppm = (10⁶·both) div n` and the association lift
    * `lift_milli = (10³·both·n) div (nullA·nullB)` (NULL when either
    * marginal is zero; 1000 = independent, ≫1000 = co-missing).
    *
    * Scale shape: ONE full-scan aggregation — k marginal null counts
    * and C(k,2) pair counts as plain conditional sums in a single
    * 1-row agg (map-side combined, no Expand, no join, no second
    * pass), unpivoted to pair rows by a struct/explode melt. Cost is
    * O(k²) AGGREGATE EXPRESSIONS, not rows — bounded by the audited
    * column list, same contract as [[columnDrift]].
    */
  def coMissingness(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns: $cols")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield (i, j)
    // Index-based internal aliases + lit() labels: raw column names never
    // enter parsed SQL text (names with quotes/backticks stay safe).
    val aggs = Seq(count(lit(1)).as("__n")) ++
      cols.zipWithIndex.map { case (c, i) =>
        count(when(colExact(c).isNull, 1)).as(s"__null$i") } ++
      pairs.map { case (i, j) =>
        count(when(colExact(cols(i)).isNull && colExact(cols(j)).isNull, 1))
          .as(s"__both${i}_$j") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val kvs = pairs.map { case (i, j) =>
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col(s"__null$i").as("null_a"), col(s"__null$j").as("null_b"),
        col(s"__both${i}_$j").as("both_null")) }
    row
      .select(col("__n"), explode(array(kvs: _*)).as("kv"))
      .select(col("kv.col_a").as("col_a"), col("kv.col_b").as("col_b"), col("__n").as("n_rows"),
        col("kv.null_a").as("null_a"), col("kv.null_b").as("null_b"),
        col("kv.both_null").as("both_null"))
      .select(col("col_a"), col("col_b"), col("n_rows"),
        col("null_a"), col("null_b"), col("both_null"),
        expr("(1000000L * both_null) div n_rows").as("conull_ppm"),
        when(col("null_a") === 0 || col("null_b") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000L * both_null * n_rows) div (null_a * null_b)"))
          .as("lift_milli"))
  }

  /** Hashing-trick collision profile: bucket the DISTINCT values of a
    * feature by an md5 prefix (16^prefixLen buckets — the deterministic,
    * engine-neutral stand-in for murmur-mod-B feature hashing) and
    * report the bucket-load distribution `(load, n_buckets,
    * n_values = load·n_buckets)` — the pre-flight answer to "how much
    * signal does B buckets destroy" before committing a hashed feature
    * space. A load histogram hugging 1 is safe; a fat tail says raise B
    * or keep a vocabulary.
    *
    * Scale shape: distinct values collapse to their bucket id at the map
    * side, then two count aggs (values→bucket load, load→histogram);
    * output is at most 16^prefixLen rows and the histogram is tiny.
    */
  def hashBucketProfile(df: DataFrame, valueCol: Column, prefixLen: Int = 2): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8, s"prefixLen must be in [1,8]: $prefixLen")
    val loads = df
      .select(valueCol.cast("string").as("__v")).where(col("__v").isNotNull).distinct()
      .select(substring(md5(col("__v")), 1, prefixLen).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("load"))
    loads.groupBy(col("load")).agg(count(lit(1)).as("n_buckets"))
      .withColumn("n_values", col("load") * col("n_buckets"))
  }

  /** Parent/child total reconciliation: for every parent key, the
    * parent's stated amount vs the sum of its children, the signed
    * difference, the relative mismatch in ppm of the parent amount, and
    * an in-tolerance flag — the warehouse closing check ("does the
    * order header agree with its lines") that catches partial loads and
    * double-applied adjustments the moment they land. Parents with no
    * children reconcile against 0 (full mismatch), orphan children are
    * [[foreignKeyOrphans]]'s job.
    *
    * Scale shape: one child-side sum agg, one parent-keyed left join —
    * both sides shuffle on the key once; everything after is map-side.
    */
  def reconcileTotals(
      parent: DataFrame,
      parentKey: String,
      parentAmount: Column,
      child: DataFrame,
      childKey: String,
      childAmount: Column,
      tolerancePpm: Long = 0L): DataFrame = {
    require(tolerancePpm >= 0, s"tolerance must be >= 0 ppm: $tolerancePpm")
    val sums = child.groupBy(col(childKey).as("__k"))
      .agg(sum(childAmount).as("__childSum"))
    parent
      .select(col(parentKey), parentAmount.as("parent_amount"))
      .join(sums, col(parentKey) === col("__k"), "left")
      .withColumn("child_sum", coalesce(col("__childSum"), lit(0L)))
      .withColumn("diff", col("parent_amount") - col("child_sum"))
      .withColumn("mismatch_ppm",
        when(col("parent_amount") === 0,
          when(col("child_sum") === 0, 0L).otherwise(lit(1000000L)))
          .otherwise(expr("(1000000L * abs(diff)) div abs(parent_amount)")))
      .withColumn("reconciled", col("mismatch_ppm") <= tolerancePpm)
      .drop("__k", "__childSum")
  }

  /** Candidate-key discovery: for each proposed column subset, the
    * distinct-combination count against the row count and the
    * uniqueness ratio — `1e6` means the subset IS a key; the gap below
    * says exactly how many duplicate collisions block it. The
    * schema-archaeology pass you run before trusting any "id" column a
    * landing zone hands you ([[functionalDependencies]] asks which
    * columns determine others; this asks which combinations identify
    * ROWS).
    *
    * Scale shape: ONE aggregation with a multi-distinct (Catalyst plans
    * k subsets as one Expand — k× the input rows through a single
    * shuffle of per-subset partials, the [[columnDrift]] exact-path
    * contract), unpivoted by a struct/explode melt. NULLs count as
    * values (two all-NULL rows collide, as they would in a join).
    * `approxDistinct = true` swaps every subset count to
    * `approx_count_distinct` (HyperLogLog++): the Expand disappears —
    * one scan, one fixed-size sketch per subset — the bounded-memory
    * path for probing many subsets over a huge table, at ~2% relative
    * error (a subset can then only be CONFIRMED as a key by the exact
    * path; the approx path is the cheap first-pass filter). Exact is
    * the default because the report is oracled.
    */
  def candidateKeys(
      df: DataFrame,
      subsets: Seq[Seq[String]],
      approxDistinct: Boolean = false): DataFrame = {
    require(subsets.nonEmpty && subsets.forall(_.nonEmpty), "need non-empty subsets")
    def nd(cols: Seq[String]) =
      if (approxDistinct) approx_count_distinct(struct(cols.map(colExact): _*))
      else count_distinct(struct(cols.map(colExact): _*))
    val aggs = count(lit(1)).as("__n") +:
      subsets.zipWithIndex.map { case (s, i) => nd(s).as(s"__d$i") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // lit() labels + index aliases — no raw names in parsed SQL text.
    val kvs = subsets.zipWithIndex.map { case (s, i) =>
      struct(lit(s.mkString(",")).as("columns"), col(s"__d$i").as("n_distinct")) }
    row
      .select(col("__n"), explode(array(kvs: _*)).as("kv"))
      .select(col("kv.columns").as("columns"), col("__n").as("n_rows"),
        col("kv.n_distinct").as("n_distinct"),
        expr("(1000000L * kv.n_distinct) div __n").as("uniqueness_ppm"),
        (col("__n") - col("kv.n_distinct")).as("n_collisions"))
  }

  /** Corpus release gate: the go/no-go checklist a training-data
    * release runs last — each row one named check with its measured
    * value, its threshold, and a pass flag. Checks: exact-duplicate
    * share, non-NFC share ([[graft.ops.Lexical.unicodeAudit]]'s
    * signal), empty-document share, and source concentration
    * (Herfindahl over sources). One failing row blocks the release;
    * the table IS the audit trail.
    *
    * Scale shape: three independent map-side-combined aggregates
    * (digest distinct, flag counts, per-source counts) unioned into a
    * four-row report — nothing bigger than the source table's
    * cardinality ever shuffles.
    */
  def releaseGate(
      docs: DataFrame,
      textCol: Column,
      sourceCol: Column,
      maxDupPpm: Long = 100000L,
      maxNonNfcPpm: Long = 1000L,
      maxEmptyPpm: Long = 1000L,
      maxHhiPpm: Long = 500000L): DataFrame = {
    val t = coalesce(textCol, lit(""))
    val dup = docs
      .agg(count(lit(1)).as("__n"),
        count_distinct(md5(t)).as("__d"))
      .select(lit("exact_dup_ppm").as("check"),
        expr("(1000000L * (__n - __d)) div __n").as("value"),
        lit(maxDupPpm).as("threshold"))
    val flags = docs
      .agg(count(lit(1)).as("__n"),
        count_if(graft.functions.TextFunctions.nfc(t) =!= t).as("__nn"),
        count_if(length(t) === 0).as("__e"))
      .select(
        struct(lit("non_nfc_ppm").as("check"),
          expr("(1000000L * __nn) div __n").as("value"),
          lit(maxNonNfcPpm).as("threshold")).as("r1"),
        struct(lit("empty_doc_ppm").as("check"),
          expr("(1000000L * __e) div __n").as("value"),
          lit(maxEmptyPpm).as("threshold")).as("r2"))
      .select(explode(array(col("r1"), col("r2"))).as("r"))
      .select(col("r.check"), col("r.value"), col("r.threshold"))
    val hhi = docs.groupBy(sourceCol.as("__s")).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("__n"), sum(col("__c") * col("__c")).as("__s2"))
      .select(lit("source_hhi_ppm").as("check"),
        expr("(1000000L * __s2) div (__n * __n)").as("value"),
        lit(maxHhiPpm).as("threshold"))
    dup.unionAll(flags).unionAll(hhi)
      .withColumn("pass", col("value") <= col("threshold"))
  }

  /** 1:N fan-out profile of a join key: one row with the key count, row
    * count, max and floor-milli mean children-per-key, and EXACT p50/p90
    * fan-outs (lower-element picks, the q-th key in fan-out order at
    * `⌊q·(n−1)/100⌋+1`) — the data-modeling pre-flight that tells you
    * whether `orders→lineitem`-shaped joins carry a long tail that needs
    * skew handling before you discover it as a straggler task.
    *
    * Scale shape: one per-key count agg (the only full-data pass), one
    * count agg onto the DISTINCT-fan-out-sized histogram, then a
    * range-partitioned prefix-sum scan
    * ([[graft.ops.Normalize.rankedPrefixSum]] — no global window) over
    * that histogram for the percentile picks, finished by a one-row agg
    * with totals broadcast alongside.
    */
  def fanoutProfile(fact: DataFrame, keyCol: Column): DataFrame = {
    val counts = fact.groupBy(keyCol.as("__k")).agg(count(lit(1)).as("__f"))
    val hist = counts.groupBy(col("__f")).agg(count(lit(1)).as("__nk"))
    val ranked = graft.ops.Normalize.rankedPrefixSum(
      hist, Seq(col("__f")), "__nk", "__rk", "__cum")
    val tot = ranked.agg(sum(col("__nk")).as("__keys"),
      sum(col("__f") * col("__nk")).as("__rows"), max(col("__f")).as("__max"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("__p50t", expr("((50 * (__keys - 1)) div 100) + 1"))
      .withColumn("__p90t", expr("((90 * (__keys - 1)) div 100) + 1"))
      .groupBy()
      .agg(max(col("__keys")).as("n_keys"), max(col("__rows")).as("n_rows"),
        max(col("__max")).as("max_fanout"),
        min(when(col("__cum") >= col("__p50t"), col("__f"))).as("p50_fanout"),
        min(when(col("__cum") >= col("__p90t"), col("__f"))).as("p90_fanout"))
      .withColumn("mean_fanout_milli", expr("(1000L * n_rows) div n_keys"))
  }

  /** Benford's-law first-digit ppm constants, log₁₀(1 + 1/d) for
    * d = 1..9 — they sum to exactly 1e6, and are the shared contract
    * between [[benford]] and its oracle.
    */
  val BenfordPpm: Seq[Long] = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L)

  /** BENFORD'S-LAW first-digit audit — the classic fabricated-data /
    * unit-mix-up detector for naturally-occurring amounts (prices,
    * populations, file sizes): one row per leading digit 1..9 with the
    * observed count, observed share in ppm, the Benford expectation
    * ([[BenfordPpm]]) and the signed deviation. Everything integer:
    * the digit comes from the value's decimal string, shares are exact
    * integer division, the expectation is a fixed constant table — no
    * log is ever evaluated at query time.
    *
    * Scale shape: map-only digit extraction into a 9-row
    * map-side-combined count; the output is always exactly 9 rows
    * (zero-filled), so two audits merge by adding counts.
    * Non-positive values are excluded (Benford is defined on positive
    * magnitudes); callers pre-scale decimals to integer units.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df.select(col(valueCol).cast("long").as("__v"))
      .where(col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expect = df.sparkSession.range(1, 10).select(col("id").as("digit"))
      .withColumn("benford_ppm",
        BenfordPpm.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
          when(col("digit") === (i + 1).toLong, lit(p)).otherwise(acc)
        })
    expect.join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"), col("benford_ppm"))
      .crossJoin(broadcast(digits.agg(sum(col("n")).as("__tot"))))
      .select(col("digit"), col("n"), col("benford_ppm"),
        expr("(1000000L * n) div greatest(__tot, 1L)").as("share_ppm"))
      .withColumn("dev_ppm", col("share_ppm") - col("benford_ppm"))
  }
}

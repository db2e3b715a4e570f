package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join — the relational form of the reference's
  * "most recent start before this end" pairing (`src/batch_tlb.py:46-62`
  * generalizes to: for each probe row, the closest build row at-or-before
  * it on the same key).
  *
  * Spark has no built-in as-of join. The naive encodings both fail at
  * scale: an equi-join on key + filter + max_by re-shuffles the full
  * cross-product of each key group, and a range-condition join degenerates
  * to a per-key nested loop. This implementation instead unions the two
  * inputs into one stream tagged by side and takes a running
  * `last(buildPayload, ignoreNulls)` over a single
  * `Window.partitionBy(key).orderBy(order, side)`:
  *
  *   - ONE shuffle total (both inputs hash-partitioned by key together);
  *   - in-partition sort-merge, O(1) window state (one pending payload) —
  *     no per-key materialization, so a 100 TB skewed key streams through;
  *   - build rows sort before probe rows at equal `order`, pinning the
  *     inclusive `build.order <= probe.order` bound (DuckDB ASOF JOIN
  *     semantics, which the oracle uses).
  *
  * Requirements: `key` is a column name present in both inputs;
  * `valueCols` (build-side payload columns) must not clash with probe
  * column names. Ties among build rows at the same `order` resolve to the
  * last in `tieBreak` order (unspecified if empty — pass one for
  * determinism).
  */
object AsOfJoin {

  /** For each `probe` row: the latest `build` row with the same `key` and
    * `build(buildOrder) <= probe(probeOrder)`. Output = all probe columns +
    * `valueCols` from the matched build row; `inner=false` keeps unmatched
    * probe rows with null payload.
    */
  def backward(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeOrder: String,
      buildOrder: String,
      valueCols: Seq[String],
      inner: Boolean = true,
      tieBreak: Seq[String] = Nil): DataFrame =
    joined(probe, build, key, probeOrder, buildOrder, valueCols, inner, tieBreak, asc = true)

  /** Mirror image: the earliest `build` row with
    * `build(buildOrder) >= probe(probeOrder)`.
    */
  def forward(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeOrder: String,
      buildOrder: String,
      valueCols: Seq[String],
      inner: Boolean = true,
      tieBreak: Seq[String] = Nil): DataFrame =
    joined(probe, build, key, probeOrder, buildOrder, valueCols, inner, tieBreak, asc = false)

  /** Nearest-event join: for each probe row, the build row with the same
    * key MINIMUM |buildOrder − probeOrder| in either direction (ties →
    * the backward match) — sensor/series alignment where "closest
    * reading" beats "latest preceding". Orders must be numeric (e.g.
    * epoch millis); emits probe columns + `valueCols` + `nearest_dist`.
    *
    * Same single-shuffle architecture as [[backward]]: ONE union, ONE
    * sort, and BOTH direction scans as two frames over that one sorted
    * run (`last(…) ignoreNulls` over the preceding frame, `first(…)`
    * over the following frame) — not two joins. An exactly-equal build
    * row sorts before its probe row and wins as a backward match at
    * distance 0.
    */
  def nearest(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeOrder: String,
      buildOrder: String,
      valueCols: Seq[String],
      inner: Boolean = true,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val payload = struct((valueCols.map(col) :+ col(buildOrder).cast("long").as("__bord")): _*)
    val payloadType = build.select(payload).schema.head.dataType
    val tbTypes = tieBreak.map(c => build.select(col(c)).schema.head.dataType)

    val probeSide = probe.select(
      col(key).as("__k") +: col(probeOrder).cast("long").as("__ord") +: lit(1).as("__side") +:
        struct(probe.columns.map(col): _*).as("__p") +:
        lit(null).cast(payloadType).as("__b") +:
        tbTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"__tb$i") }: _*)
    val buildSide = build.select(
      col(key).as("__k") +: col(buildOrder).cast("long").as("__ord") +: lit(0).as("__side") +:
        lit(null).cast(probeSide.schema("__p").dataType).as("__p") +:
        payload.as("__b") +:
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*)

    val order = col("__ord").asc +: col("__side").asc +:
      tieBreak.indices.map(i => col(s"__tb$i").asc)
    val base = Window.partitionBy(col("__k")).orderBy(order: _*)
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = probeSide.unionByName(buildSide)
      .withColumn("__mb", last(col("__b"), ignoreNulls = true).over(wPrev))
      .withColumn("__mf", first(col("__b"), ignoreNulls = true).over(wNext))
      .where(col("__side") === 1)
      .withColumn("__db", col("__ord") - col("__mb.__bord"))
      .withColumn("__df", col("__mf.__bord") - col("__ord"))
      .withColumn("__m",
        when(col("__mb").isNull, col("__mf"))
          .when(col("__mf").isNull, col("__mb"))
          .when(col("__db") <= col("__df"), col("__mb"))
          .otherwise(col("__mf")))
    val kept = if (inner) matched.where(col("__m").isNotNull) else matched
    kept.select(probe.columns.map(c => col(s"__p.$c")) ++
      valueCols.map(c => col(s"__m.$c").as(c)) :+
      abs(col("__ord") - col("__m.__bord")).as("nearest_dist"): _*)
  }

  private def joined(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeOrder: String,
      buildOrder: String,
      valueCols: Seq[String],
      inner: Boolean,
      tieBreak: Seq[String],
      asc: Boolean): DataFrame = {
    val payload = struct(valueCols.map(col): _*)
    val payloadType = build.select(payload).schema.head.dataType
    val tbTypes = tieBreak.map(c => build.select(col(c)).schema.head.dataType)

    val probeSide = probe.select(
      col(key).as("__k") +: col(probeOrder).as("__ord") +: lit(1).as("__side") +:
        struct(probe.columns.map(col): _*).as("__p") +:
        lit(null).cast(payloadType).as("__b") +:
        tbTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"__tb$i") }: _*)
    val buildSide = build.select(
      col(key).as("__k") +: col(buildOrder).as("__ord") +: lit(0).as("__side") +:
        lit(null).cast(probeSide.schema("__p").dataType).as("__p") +:
        payload.as("__b") +:
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }: _*)

    // Build rows first at equal __ord (side 0 < 1), so an exactly-equal
    // build row is visible to the probe row — the inclusive bound. For the
    // forward join the scan runs in descending order: "latest preceding in
    // desc order" = "earliest following".
    val dir: Column => Column = if (asc) c => c.asc else c => c.desc
    val order = dir(col("__ord")) +: col("__side").asc +:
      tieBreak.indices.map(i => dir(col(s"__tb$i")))
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = probeSide.unionByName(buildSide)
      .withColumn("__m", last(col("__b"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val kept = if (inner) matched.where(col("__m").isNotNull) else matched
    kept.select(probe.columns.map(c => col(s"__p.$c")) ++
      valueCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling — the politeness stage between URL
  * discovery ([[Html.extractLinks]] → [[Urls.resolve]] →
  * [[Urls.canonicalize]]) and fetching. Reference behavior modeled:
  * none (the reference fetches one hard-coded URL); §2.9 extension
  * surface completing the web-corpus family ([[Urls]] identity,
  * [[Html]] hygiene, [[Robots]] admission, this module scheduling).
  *
  * Semantics (the classic Mercator frontier, Heydon & Najork 1999, at
  * batch grain): the frontier first DEDUPS on canonical URL (a URL
  * queued twice fetches once, the highest queued priority wins), then
  * each HOST — politeness is per-server, a registrable domain may span
  * many servers — serializes its fetches: its URLs rank by
  * (priority desc, canonical_url asc) and the i-th ranked URL is
  * offset `(i−1)·delayMs` from the host's first slot, with at most
  * `maxPerHost` URLs admitted per host per scheduling round.
  */
object Crawl {

  /** Schedule a frontier of raw (`urlCol`, `priorityCol`) rows into
    * per-host politeness slots. Returns one row per admitted fetch:
    * `host`, `url` (canonical), `priority` (max over queued
    * duplicates), `fetch_offset_ms`. Malformed URLs (canonicalize to
    * NULL) drop — quarantine upstream if they matter.
    *
    * Scale shape: two key-change exchanges of URL-sized rows — the
    * canonical-URL dedup agg (map-side combined) and the per-host
    * window — and the `row_number ≤ maxPerHost` filter lets Catalyst
    * insert a PARTIAL WindowGroupLimit below the window's shuffle
    * (pinned in PlanShapeSpec), so a mega-host contributes at most
    * `maxPerHost` rows per upstream task to the sort: per-host skew is
    * bounded at the map side, never concentrated on one reducer.
    */
  def politenessSchedule(
      frontier: DataFrame,
      urlCol: String = "url",
      priorityCol: String = "priority",
      delayMs: Long = 1000L,
      maxPerHost: Int = 1000): DataFrame = {
    require(delayMs > 0, s"delayMs must be > 0: $delayMs")
    require(maxPerHost > 0, s"maxPerHost must be > 0: $maxPerHost")
    val deduped = Urls.canonicalize(frontier, urlCol)
      .where(col("canonical_url").isNotNull)
      .groupBy(col("host"), col("canonical_url").as("url"))
      .agg(max(col(priorityCol)).as("priority"))
    val slot = row_number().over(
      Window.partitionBy(col("host"))
        .orderBy(col("priority").desc, col("url").asc))
    deduped.withColumn("__slot", slot)
      .where(col("__slot") <= maxPerHost)
      .select(col("host"), col("url"), col("priority"),
        ((col("__slot") - 1) * delayMs).as("fetch_offset_ms"))
  }
}

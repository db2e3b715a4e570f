package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** [[politenessSchedule]] with PER-HOST delays — the robots
    * `Crawl-delay` consumer ([[Robots.crawlDelay]] produces the hint
    * column): every frontier row may carry a delay hint in `delayMsCol`
    * (NULL = no opinion), a host's delay is the MAX hint over its rows
    * (the politest interpretation of conflicting declarations) and
    * `defaultDelayMs` when nobody opined. Non-positive hints count as
    * no opinion too — `Crawl-delay: 0` ("no delay required") must not
    * defeat the positive-delay invariant the fixed-delay form enforces
    * with its `require`, and a negative hint from bad upstream data
    * must not mint negative offsets. Appends `delay_ms` next to
    * the slot offset. Same dedup, ordering, cap and map-side skew bound
    * as the fixed-delay form; the host-level delay fold is a
    * host-cardinality agg joined back on the host key — it must see all
    * of a host's rows, so it cannot ride the capped window.
    */
  def politenessScheduleWithDelays(
      frontier: DataFrame,
      urlCol: String = "url",
      priorityCol: String = "priority",
      delayMsCol: String = "delay_ms",
      defaultDelayMs: Long = 1000L,
      maxPerHost: Int = 1000): DataFrame = {
    require(defaultDelayMs > 0, s"defaultDelayMs must be > 0: $defaultDelayMs")
    require(maxPerHost > 0, s"maxPerHost must be > 0: $maxPerHost")
    val deduped = Urls.canonicalize(frontier, urlCol)
      .where(col("canonical_url").isNotNull)
      .groupBy(col("host"), col("canonical_url").as("url"))
      .agg(max(col(priorityCol)).as("priority"),
        max(when(col(delayMsCol) > 0, col(delayMsCol))).as("__d"))
    val hostDelay = deduped.groupBy(col("host"))
      .agg(coalesce(max(col("__d")), lit(defaultDelayMs)).as("delay_ms"))
    val slot = row_number().over(
      Window.partitionBy(col("host"))
        .orderBy(col("priority").desc, col("url").asc))
    deduped.withColumn("__slot", slot)
      .where(col("__slot") <= maxPerHost)
      .join(hostDelay, Seq("host"))
      .select(col("host"), col("url"), col("priority"), col("delay_ms"),
        ((col("__slot") - 1) * col("delay_ms")).as("fetch_offset_ms"))
  }

  /** Sitemap entries (sitemaps.org protocol, the XML form) as an array
    * of `(loc, lastmod, is_index)` structs — all `<url>` entries in
    * document order, then all `<sitemap>` entries in document order
    * (the spec forbids mixing the two in one file, so for conformant
    * input that IS document order; a spec-violating mixed file gets
    * the two families stably separated, not interleaved) — the
    * publisher-declared half of URL discovery ([[Html.extractAnchors]]
    * is the crawled half). `<url>` entries carry `is_index = false`,
    * `<sitemapindex>`-style `<sitemap>` entries `true` (their locs are
    * MORE sitemaps to fetch, not pages); an entry without a `<loc>`
    * drops; `<lastmod>` is kept verbatim (nullable) — date parsing has
    * its own operators. Scope (documented contract): no CDATA sections,
    * no XML entity decode beyond [[Html]]'s named set — the protocol
    * requires entity-escaped URLs, which pass through verbatim the same
    * conservatism as [[Urls.canonicalize]]'s no-percent-decode rule.
    * Map-side, no shuffle.
    */
  def sitemapEntries(xml: Column): Column = {
    def entries(tag: String, isIndex: Boolean): Column =
      filter(
        transform(
          regexp_extract_all(xml, lit(s"(?is)<$tag>(.*?)</$tag>"), lit(1)),
          e => {
            val loc = trim(regexp_extract(e, "(?is)<loc>(.*?)</loc>", 1))
            val lastmod = regexp_extract(e, "(?is)<lastmod>(.*?)</lastmod>", 1)
            when(loc =!= "", struct(
              loc.as("loc"),
              when(lastmod =!= "", trim(lastmod)).otherwise(lit(null).cast("string"))
                .as("lastmod"),
              lit(isIndex).as("is_index")))
          }),
        e => e.isNotNull)
    concat(entries("url", isIndex = false), entries("sitemap", isIndex = true))
  }

  /** The publisher-declared discovery COMPOSITE, robots to entries in
    * one plan: each page's robots body yields its `Sitemap:`
    * declarations ([[Robots.sitemapUrls]] — global scope, comments
    * stripped), the declared URLs join to the fetched sitemap FILES
    * (gunzip'd when gzip'd — real sitemaps ship as `sitemap.xml.gz`;
    * plain XML passes through; a corrupt gzip body quarantines its
    * file), and each file's entries explode via [[sitemapEntries]].
    * Inner join: a declaration whose file was never fetched contributes
    * nothing (fetch-gap accounting belongs to the frontier, not here).
    *
    * Scale shape: `sitemapFiles` is the small side — a crawl has orders
    * of magnitude fewer sitemap files than pages — so it decompresses
    * map-side ONCE per file and broadcasts; the robots side never
    * shuffles. Input columns: `robotsPages (doc_id, robots)`,
    * `sitemapFiles (url, payload: binary)`.
    */
  def sitemapDiscovery(
      robotsPages: DataFrame,
      sitemapFiles: DataFrame,
      maxBytes: Int = 1 << 26): DataFrame = {
    val declared = robotsPages
      .select(col("doc_id"), explode(Robots.sitemapUrls(col("robots"))).as("sitemap_url"))
    explodeEntries(declared, decodedXmlFiles(sitemapFiles, maxBytes))
  }

  /** [[sitemapDiscovery]] following `<sitemapindex>` one level per
    * round, to `maxDepth` — real publishers shard large sitemaps behind
    * an index file, so the single-level walk sees only pointers. Depth
    * 1 is the robots-declared files' entries; each further depth joins
    * the previous level's `is_index` locs back to the fetched files
    * (same broadcast — the file set is the small side at every level).
    * `depth` labels each row; index entries whose file was never
    * fetched contribute nothing (the fetch-gap rule). The loop is
    * driver-side over a FIXED small depth (real nesting is 2), never
    * data-dependent.
    */
  def sitemapDiscoveryRecursive(
      robotsPages: DataFrame,
      sitemapFiles: DataFrame,
      maxDepth: Int = 2,
      maxBytes: Int = 1 << 26): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 8, s"maxDepth out of range: $maxDepth")
    val decoded = decodedXmlFiles(sitemapFiles, maxBytes)
    var declared = robotsPages
      .select(col("doc_id"), explode(Robots.sitemapUrls(col("robots"))).as("sitemap_url"))
    var out: DataFrame = null
    var d = 1
    while (d <= maxDepth) {
      val entries = explodeEntries(declared, decoded)
        .withColumn("depth", lit(d).cast("long"))
      out = if (out == null) entries else out.unionByName(entries)
      declared = entries.where(col("is_index"))
        .select(col("doc_id"), col("loc").as("sitemap_url")).distinct()
      d += 1
    }
    out
  }

  /** Feed entries (RSS 2.0 / Atom, the two web-feed dialects) as an
    * array of `(loc, dialect)` structs — all RSS `<item><link>` targets
    * in document order, then all Atom `<entry><link href=…/>` targets
    * in document order (a real feed file is one dialect, so that IS
    * document order). [[sitemapEntries]]'s sibling for the second
    * publisher-declared discovery channel; entries without a link
    * drop, values pass through verbatim (feeds carry absolute URLs by
    * convention; [[Urls.resolve]] composes where a publisher violates
    * it). Map-side, no shuffle.
    */
  def feedEntries(xml: Column): Column = {
    val rss = filter(
      transform(
        regexp_extract_all(xml, lit("(?is)<item>(.*?)</item>"), lit(1)),
        e => {
          val loc = trim(regexp_extract(e, "(?is)<link>(.*?)</link>", 1))
          when(loc =!= "", struct(loc.as("loc"), lit("rss").as("dialect")))
        }),
      e => e.isNotNull)
    val atom = filter(
      transform(
        regexp_extract_all(xml, lit("(?is)<entry>(.*?)</entry>"), lit(1)),
        e => {
          // Atom's rule: rel="alternate" (or rel ABSENT) names the
          // entry's page — a self/edit API link listed first must not
          // win, so pick the first alternate-or-relless link's href
          val links = regexp_extract_all(e, lit("(?is)<link(?:\\s[^>]*)?/?>"), lit(0))
          val cand = filter(
            transform(links, t => {
              val rel = lower(regexp_replace(
                regexp_extract(t, "(?is)\\srel=(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1),
                "^[\"']|[\"']$", ""))
              val href = regexp_replace(
                regexp_extract(t, "(?is)\\shref=(\"[^\"]*\"|'[^']*'|[^\\s>]+)", 1),
                "^[\"']|[\"']$", "")
              when(href =!= "" && (rel === "" || rel === "alternate"), href)
            }),
            x => x.isNotNull)
          val loc = when(size(cand) > 0, element_at(cand, 1))
          when(loc.isNotNull, struct(loc.as("loc"), lit("atom").as("dialect")))
        }),
      e => e.isNotNull)
    concat(rss, atom)
  }

  /** Feed-driven URL discovery — [[sitemapDiscovery]]'s sibling for the
    * second publisher-declared channel: each page's
    * `<link rel="alternate">` feed pointers ([[Html.feedLinks]])
    * resolve against the page URL (feed hrefs are commonly relative),
    * join to the fetched feed FILES (gunzip'd when gzip'd — the same
    * quarantine and dedup discipline as sitemaps), and each file's
    * entries explode via [[feedEntries]]. Inner join: a declared feed
    * that was never fetched contributes nothing (the fetch-gap rule —
    * accounting belongs to the frontier).
    *
    * Scale shape: identical to [[sitemapDiscovery]] — the feed-file set
    * is frontier metadata (orders of magnitude smaller than pages), so
    * it decodes map-side once and broadcasts; the page side never
    * shuffles. Input columns: `pages (doc_id, page_url, html)`,
    * `feedFiles (url, payload: binary)`.
    */
  def feedDiscovery(
      pages: DataFrame,
      feedFiles: DataFrame,
      maxBytes: Int = 1 << 26): DataFrame = {
    val declared = pages
      .select(col("doc_id"), col("page_url"),
        explode(Html.feedLinks(col("html"))).as("__f"))
      .select(col("doc_id"),
        Urls.resolve(col("page_url"), col("__f.href")).as("feed_url"),
        col("__f.feed_type").as("feed_type"))
    declared
      .join(broadcast(decodedXmlFiles(feedFiles, maxBytes)),
        col("feed_url") === col("__sm_url"))
      .select(col("doc_id"), col("feed_url"), col("feed_type"),
        posexplode(feedEntries(col("__sm_xml"))))
      .select(col("doc_id"), col("feed_url"), col("feed_type"),
        col("pos").cast("long").as("entry_pos"),
        col("col.loc").as("loc"), col("col.dialect").as("dialect"))
  }

  /** The fetched sitemap/feed FILES decoded once (gunzip'd when gzip'd,
    * plain XML passes through; corrupt gzip quarantines the file) —
    * the shared broadcast side of the discovery walks.
    */
  private def decodedXmlFiles(sitemapFiles: DataFrame, maxBytes: Int): DataFrame = {
    import sitemapFiles.sparkSession.implicits._
    import graft.functions.BinaryCodecs
    // One file per URL before the broadcast join: a fetch layer that
    // delivered the same sitemap twice would otherwise fan out every
    // matching declaration's entries into duplicate rows. Arbitrary
    // survivor among duplicates (re-fetches of one URL are the same
    // bytes in any sane fetch log); dedup BEFORE decode so the loser
    // never pays the gunzip.
    sitemapFiles.dropDuplicates("url").select(col("url"), col("payload"))
      .as[(String, Array[Byte])]
      .flatMap { case (url, payload) =>
        val bytes = Option(payload).getOrElse(Array.emptyByteArray)
        val xml =
          if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
            BinaryCodecs.gunzip(bytes, maxBytes).map(new String(_, "UTF-8"))
          else Some(new String(bytes, "UTF-8"))
        xml.map(x => (url, x))
      }.toDF("__sm_url", "__sm_xml")
  }

  /** The three-channel discovery front half, factored so the BATCH
    * frontier (q422) and the STREAMING frontier
    * ([[graft.streaming.StreamingOps.discoveryFrontierStream]]) are
    * literally one code path: crawled anchors
    * ([[Html.extractLinks]] resolved against the page) ∪
    * robots-declared sitemap entries ([[sitemapDiscovery]]) ∪
    * page-declared feed entries ([[feedDiscovery]]), then robots
    * admission (`admissionRobots` is the policy body every candidate
    * is judged against) and URL canonicalization — one `url` column of
    * admitted canonical URLs, duplicates preserved (the count IS the
    * downstream priority signal). Every stage is map-side page work or
    * a broadcast join against the static file sets, which is exactly
    * what makes it legal verbatim on a streaming `pages` frame.
    * Input: `(doc_id, page_url, html, robots)`.
    */
  def discoveryAdmitted(
      pages: DataFrame,
      sitemapFiles: DataFrame,
      feedFiles: DataFrame,
      admissionRobots: Column): DataFrame = {
    val anchors = pages
      .select(col("page_url"), explode(Html.extractLinks(col("html"))).as("__ref"))
      .select(Urls.resolve(col("page_url"), col("__ref")).as("url"))
    val smLocs = sitemapDiscovery(
      pages.select(col("doc_id"), col("robots")), sitemapFiles)
      .select(col("loc").as("url"))
    val feedLocs = feedDiscovery(
      pages.select(col("doc_id"), col("page_url"), col("html")), feedFiles)
      .select(col("loc").as("url"))
    val admitted = Robots.filterAllowed(
      anchors.unionByName(smLocs).unionByName(feedLocs)
        .withColumn("path", regexp_extract(col("url"), "^[a-z]+://[^/]*(/.*)$", 1))
        .withColumn("robots", admissionRobots))
      .where(col("allowed"))
    Urls.canonicalize(admitted)
      .where(col("canonical_url").isNotNull)
      .select(col("canonical_url").as("url"))
  }

  /** One discovery level: declared `(doc_id, sitemap_url)` joined to
    * the decoded files (broadcast), entries exploded in document order.
    */
  private def explodeEntries(declared: DataFrame, decoded: DataFrame): DataFrame =
    declared
      .join(broadcast(decoded), col("sitemap_url") === col("__sm_url"))
      .select(col("doc_id"), col("sitemap_url"),
        posexplode(sitemapEntries(col("__sm_xml"))))
      .select(col("doc_id"), col("sitemap_url"),
        col("pos").cast("long").as("entry_pos"),
        col("col.loc").as("loc"), col("col.lastmod").as("lastmod"),
        col("col.is_index").as("is_index"))

  /** Recrawl priority from fetch history (Cho & Garcia-Molina 2003,
    * freshness-driven re-crawling, at estimate grain): per URL, the
    * observed change rate — fetches whose content hash differs from the
    * PREVIOUS fetch, over the fetch intervals — times the staleness age,
    * both in exact integer units. A page that changes often and hasn't
    * been fetched lately outranks both the static page and the
    * just-fetched one.
    *
    * Output per URL: `n_fetches`, `n_changes` (first fetch is not a
    * change), `change_rate_ppm` = `10⁶·n_changes div (n_fetches − 1)`
    * (0 for a single fetch), `age_ms` since the URL's last fetch
    * relative to `asOfMs` (pass the corpus max — determinism forbids
    * wall clocks), and `priority = change_rate_ppm · age_ms div 1000`.
    *
    * Scale shape: ONE exchange keyed by URL — the change-detection lag
    * window and the per-URL aggregation share the same hash
    * partitioning, so the agg rides the window's shuffle; history rows
    * carry (url, ts, hash), never bodies.
    */
  def recrawlPriority(
      history: DataFrame,
      urlCol: String = "url",
      tsMsCol: String = "ts_ms",
      hashCol: String = "content_hash",
      asOfMs: Long): DataFrame = {
    // (ts, hash) order — the same tie-break the streaming sibling
    // (changeDetectStream) uses: two fetches at one timestamp would
    // otherwise make the lag comparison order-dependent across engines
    val w = Window.partitionBy(col(urlCol)).orderBy(col(tsMsCol).asc, col(hashCol).asc)
    val changed = when(lag(col(hashCol), 1).over(w).isNull, lit(0L))
      .when(col(hashCol) =!= lag(col(hashCol), 1).over(w), lit(1L))
      .otherwise(lit(0L))
    priorityFromCounters(
      history
        .select(col(urlCol).as("url"), col(tsMsCol).as("__ts"), changed.as("__chg"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n_fetches"),
          sum(col("__chg")).as("n_changes"),
          max(col("__ts")).as("__last")),
      asOfMs)
  }

  /** The rate × staleness arithmetic of [[recrawlPriority]] from
    * already-folded per-URL counters `(url, n_fetches, n_changes,
    * __last)` — ONE implementation shared with the streaming control
    * loop ([[graft.streaming.StreamingOps.crawlSchedulerStream]], whose
    * counters come from the state store instead of a window), so the
    * batch and streaming priorities cannot drift.
    */
  private[graft] def priorityFromCounters(
      counters: DataFrame, asOfMs: Long): DataFrame =
    counters
      .select(col("url"), col("n_fetches"), col("n_changes"),
        when(col("n_fetches") > 1,
          expr("(1000000L * n_changes) div (n_fetches - 1L)")).otherwise(lit(0L))
          .as("change_rate_ppm"),
        (lit(asOfMs) - col("__last")).as("age_ms"))
      // decimal(38,0) product: rate ≤ 10⁶ times an epoch-ms age brushes
      // the Long ceiling (10⁶ · 4·10¹² ≈ 4·10¹⁸ of 9.2·10¹⁸) — one
      // decade of clock headroom is not a safety margin
      .withColumn("priority",
        expr("cast((cast(change_rate_ppm as decimal(38,0)) * age_ms) div 1000 as bigint)"))

  /** Largest-remainder (Hamilton) apportionment of a global fetch
    * budget across domains, proportional to an integer weight (priority
    * mass, inlink count, …): every domain gets its floor share
    * `budget·w div W`, and the `budget − Σfloors` leftover slots go to
    * the largest remainders (`budget·w mod W`), ties broken by domain
    * name — exact, deterministic, and Σ`alloc` = `budget` ALWAYS (the
    * property naive rounding loses). Zero/negative-weight domains
    * allocate 0 and don't distort the remainder race.
    *
    * Scale shape: one map-side-combined weight agg, a broadcast 1-row
    * total, and one domain-keyed window for the remainder rank —
    * domain-cardinality data, never fetch-cardinality.
    */
  def allocateBudget(
      domains: DataFrame,
      domainCol: String = "domain",
      weightCol: String = "weight",
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val w = domains.groupBy(col(domainCol).as("domain"))
      .agg(sum(when(col(weightCol) > 0, col(weightCol)).otherwise(lit(0L))).as("w"))
    val tot = w.agg(sum(col("w")).as("tw"))
    // decimal(38,0) product: budget·w must not wrap a long when both are
    // large (10¹² budget × 10⁹ weight mass is a legitimate corpus)
    val based = w.crossJoin(broadcast(tot))
      .select(col("domain"), col("w"), col("tw"),
        when(col("tw") > 0,
          expr(s"cast((cast($budget as decimal(38,0)) * w) div tw as bigint)"))
          .otherwise(lit(0L)).as("__floor"),
        when(col("tw") > 0,
          expr(s"cast((cast($budget as decimal(38,0)) * w) % tw as bigint)"))
          .otherwise(lit(0L)).as("__rem"))
    val leftover = based
      .withColumn("__spent", sum(col("__floor")).over(Window.partitionBy()))
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__rem").desc, col("domain").asc)))
    // tw = 0 (no positive weight anywhere) allocates NOTHING — without
    // the guard the remainder top-up would hand the whole budget to the
    // first `budget` domains alphabetically
    leftover.select(col("domain"), col("w").as("weight"),
      (col("__floor") +
        when(col("tw") > 0 && col("__rank") <= lit(budget) - col("__spent"),
          lit(1L)).otherwise(lit(0L)))
        .as("alloc"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus identity primitive: crawl
  * frontiers, URL-level dedup and per-domain mixing all key on a
  * CANONICAL form, because the same page arrives as `HTTP://Host:80/p/`,
  * `http://host/p?utm_source=feed` and `http://host/p#frag`. Reference
  * behavior modeled: the reference pipeline has no URL handling at all
  * (its one URL is a hard-coded curl target,
  * `/root/reference/src/data_processor.py:62`) — this is §2.9 extension
  * surface for the corpus-pipeline use case.
  *
  * Everything is a codegen'd Column expression (regex + array ops):
  * map-side, no shuffle, replayable in any SQL engine with the same
  * regex semantics — the whole contract is deterministic string
  * rewriting, no network, no IDN/punycode (documented below).
  */
object Urls {

  /** Canonical form of `urlCol` under the classic normalization rules:
    *
    *  - scheme and host lowercased (paths/queries stay case-sensitive
    *    per RFC 3986);
    *  - default ports stripped (`:80` for http, `:443` for https — a
    *    NON-default port is kept, including `:80` on https);
    *  - fragment dropped;
    *  - tracking parameters dropped (`utm_*`, `fbclid`, `gclid` — the
    *    standard click-id strippers), remaining query parameters SORTED
    *    byte-wise so parameter order stops mattering, empty query
    *    dropped entirely;
    *  - trailing slashes stripped from the path, empty path normalized
    *    to `/`.
    *
    * Scope (documented contract): absolute http(s) URLs; no IDN
    * (punycode hosts pass through verbatim), no percent-decoding (two
    * encodings of one byte stay distinct — decoding safely needs a
    * reserved-set table this surface keeps out), userinfo kept verbatim
    * if present. Malformed rows (no `scheme://`) canonicalize to NULL —
    * filter or quarantine upstream.
    *
    * Appends `canonical_url`, `host` (lowercased, port stripped) and
    * `registered_domain` — a PSL-lite heuristic: hosts whose last label
    * is a 2-letter ccTLD with a generic second-level label
    * (co/com/org/net/ac/gov, e.g. `co.uk`, `com.au`) keep THREE labels,
    * everything else keeps two. A full Public Suffix List is a data
    * file, not an algorithm; the heuristic covers the dominant cases
    * and is bit-replayable.
    */
  def canonicalize(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_extract(hostport, "^([^:]*)", 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rawPath = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = {
      val stripped = regexp_replace(rawPath, "/+$", "")
      when(stripped === "", lit("/")).otherwise(stripped)
    }
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)")))
    val qpart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    val canonical = when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path, qpart))
    df.withColumn("canonical_url", canonical)
      .withColumn("host", when(host === "", lit(null).cast("string")).otherwise(host))
      .withColumn("registered_domain", registeredDomain(host))
  }

  /** PSL-lite registered domain of a lowercased host (see
    * [[canonicalize]] for the heuristic's contract).
    */
  private[graft] def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last = element_at(labels, -1)
    val second = element_at(labels, -2)
    val ccSld = length(last) === 2 &&
      second.isin("co", "com", "org", "net", "ac", "gov")
    when(host === "" || n < 2, lit(null).cast("string"))
      .otherwise(when(n >= 3 && ccSld,
        concat_ws(".", element_at(labels, -3), second, last))
        .otherwise(concat_ws(".", second, last)))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt evaluation — the crawl-side admission filter every web
  * corpus applies before a page ever reaches the pipeline. Reference
  * behavior modeled: none (the reference fetches one hard-coded URL);
  * §2.9 extension surface completing the web-corpus family
  * ([[Urls]] identity, [[Html]] hygiene, this module admission).
  *
  * Scope (documented contract): the original 1994 REP prefix rules for
  * the `User-agent: *` group — `Allow`/`Disallow` path PREFIXES with
  * longest-match-wins and Allow winning length ties (the Google
  * tie-break) — no `*`/`$` wildcard extension. The two de-facto
  * extensions every crawler honors are parsed too: `Crawl-delay`
  * ([[crawlDelay]], star-group-scoped) and the GLOBAL `Sitemap:`
  * declaration ([[sitemapUrls]]). Everything is codegen'd Column
  * expressions over the split-line array: map-side, no shuffle,
  * replayable in any engine.
  */
object Robots {

  /** The raw lines strictly inside the `User-agent: *` group (between
    * its header and the next `User-agent:` line or EOF); empty when no
    * star group exists. Shared by [[starRules]] and [[crawlDelay]] so
    * the two can't disagree about group boundaries.
    */
  private[graft] def starGroupLines(robots: Column): Column = {
    val lines = split(robots, "\n")
    // canonical "key:value" — colon spacing varies in the wild
    // (`User-agent:*` and `User-agent: *` are the same directive)
    val norm = transform(lines, l =>
      regexp_replace(trim(regexp_replace(lower(l), "#.*$", "")), "\\s*:\\s*", ":"))
    val n = size(norm)
    val ua = array_position(norm, "user-agent:*")
    // n >= 1 always: split() of a non-null string yields at least [""]
    val nextUa = array_min(filter(
      transform(sequence(lit(1), n), i =>
        when(i > ua && element_at(norm, i).startsWith("user-agent:"), i)),
      x => x.isNotNull))
    val end = coalesce(nextUa, n + 1)
    when(ua > 0, slice(lines, ua + 1, end - ua - lit(1)))
      .otherwise(array().cast("array<string>"))
  }

  /** The star group's `Crawl-delay` in MILLISECONDS (the de-facto
    * Bing/Yandex extension; integer or decimal seconds accepted,
    * millisecond precision kept), NULL when absent or unparseable —
    * callers coalesce their own default. First declaration wins, the
    * same first-match conservatism parsers apply to duplicated
    * directives.
    */
  def crawlDelay(robots: Column): Column =
    delayFromLines(starGroupLines(robots))

  /** [[crawlDelay]] under agent-group selection ([[agentGroupLines]]):
    * the `Crawl-delay` of the group(s) the REQUESTING AGENT obeys —
    * real sites quote slower delays for aggressive bots and faster ones
    * for preferred crawlers, so a star-scoped read applies the wrong
    * fetch budget the moment a named group exists. Same milliseconds /
    * first-declaration-wins / NULL-when-absent contract; feed the
    * result to [[Crawl.politenessScheduleWithDelays]].
    */
  def crawlDelayForAgent(robots: Column, agent: Column): Column =
    delayFromLines(agentGroupLines(robots, agent))

  /** Group lines → Crawl-delay milliseconds, the shared back half of
    * both delay readers.
    */
  private def delayFromLines(group: Column): Column = {
    val norm = transform(group, l =>
      regexp_replace(trim(regexp_replace(lower(l), "#.*$", "")), "\\s*:\\s*", ":"))
    val decl = filter(norm, l => l.rlike("^crawl-delay:[0-9]+(\\.[0-9]+)?$"))
    val v = element_at(decl, 1)
    when(size(decl) > 0,
      regexp_extract(v, "^crawl-delay:([0-9]+)", 1).cast("long") * 1000 +
        regexp_extract(concat(regexp_extract(v, "\\.([0-9]+)$", 1), lit("000")),
          "^([0-9]{3})", 1).cast("long"))
      .otherwise(lit(null).cast("long"))
  }

  /** All `Sitemap:` declarations in the body, in file order, as an
    * array Column — the sitemaps.org extension makes them GLOBAL
    * (valid anywhere in the file, independent of any user-agent
    * group), so this scans every line, not just the star group: the
    * publisher's pointer from admission control into
    * [[Crawl.sitemapEntries]] discovery. URL values stay verbatim
    * (URLs are case-sensitive; only the key matches
    * case-insensitively), comments strip first, valueless lines drop.
    * Map-side, no shuffle.
    */
  def sitemapUrls(robots: Column): Column =
    filter(
      transform(split(robots, "\n"), l => {
        val noComment = regexp_replace(l, "#.*$", "")
        val key = lower(trim(regexp_extract(noComment, "^([^:]+):", 1)))
        val value = trim(regexp_extract(noComment, "^[^:]+:(.*)$", 1))
        when(key === "sitemap" && value =!= "", value)
      }),
      v => v.isNotNull)

  /** The raw lines of the group(s) a REQUESTING AGENT selects — the
    * full REP group model the star-only view ([[starGroupLines]])
    * simplifies away. Real robots.txt files carry agent-specific groups
    * next to `*`, and a crawler identifying as its own product token
    * must obey the MOST SPECIFIC matching group, not the star one:
    *
    *  - a group's `User-agent:` token matches when it is `*` or a
    *    case-insensitive PREFIX of the requesting agent's PRODUCT TOKEN
    *    — the agent string up to its first character outside
    *    `[A-Za-z_-]`, so `graftbot/1.0` matches as `graftbot` (RFC 9309
    *    §2.2.1 / the Google "most specific user agent" selection: a
    *    version-qualified group line like `graftbot/1` matches NO
    *    agent, rather than accidentally matching only version 1.x);
    *    exact match is the longest possible prefix;
    *  - the longest matching token wins; `*` only applies when no named
    *    token matches (fall-through);
    *  - CONSECUTIVE `User-agent:` lines share the rule block that
    *    follows them (RFC 9309 group formation — `User-agent: a` /
    *    `User-agent: b` / `Disallow: /x` binds the rule to both);
    *  - when several groups carry the winning token (a duplicated
    *    group), their rule lines COMBINE in file order (RFC 9309's
    *    merge rule).
    *
    * Everything stays a codegen'd Column fold over the split-line
    * array — map-side, no shuffle, robots bodies are KB-sized. Note
    * equal-length distinct tokens cannot both be prefixes of one agent,
    * so "longest match" is unambiguous.
    */
  private[graft] def agentGroupLines(robots: Column, agent: Column): Column = {
    val lines = split(robots, "\n")
    val norm = normLines(lines)
    val score = scoreLines(norm, agent)
    val best = array_max(filter(score, s => s.isNotNull))
    groupMembers(lines, norm, score, best)
  }

  /** Normalized (lowercased, comment-stripped, colon-canonical) lines. */
  private def normLines(lines: Column): Column =
    transform(lines, l =>
      regexp_replace(trim(regexp_replace(lower(l), "#.*$", "")), "\\s*:\\s*", ":"))

  /** Per-line agent-match score over normalized lines: `*` → 0, a token
    * that prefixes the agent's PRODUCT TOKEN (the agent string up to
    * its first non-`[a-z_-]` character, lowercased — RFC 9309 matches
    * tokens, not the full `product/version` string) → its length, else
    * null (non-headers and non-matching headers).
    */
  private def scoreLines(norm: Column, agent: Column): Column = {
    val agentLc = regexp_extract(lower(trim(agent)), "^[a-z_-]*", 0)
    transform(norm, l => {
      val t = when(l.startsWith("user-agent:"),
        regexp_extract(l, "^user-agent:(.*)$", 1))
      when(t === "*", lit(0))
        .when(t =!= "" && agentLc.startsWith(t), length(t))
    })
  }

  /** Member lines of every winning header, concatenated in file order —
    * the ONE group-formation implementation behind both the Column form
    * ([[agentGroupLines]]) and the staged DataFrame form
    * ([[withAgentGroupLines]]), so the two cannot diverge. RFC 9309
    * group formation: a run of `User-agent:` headers — blank and
    * comment-only lines between them included, the grammar ignores both
    * — shares the rule block that follows; a header's block runs from
    * the first non-blank non-header line after it to the next header.
    */
  private def groupMembers(
      lines: Column, norm: Column, score: Column, best: Column): Column = {
    val n = size(norm)
    val idx = sequence(lit(1), n)
    val winners = filter(idx, i =>
      element_at(score, i).isNotNull && element_at(score, i) === best)
    val members = flatten(transform(winners, p => {
      // first line after the header that is neither another header of
      // the run nor a blank/comment filler (normalized-empty)
      val start = array_min(filter(
        transform(idx, i =>
          when(i > p && element_at(norm, i) =!= "" &&
            !element_at(norm, i).startsWith("user-agent:"), i)),
        x => x.isNotNull))
      val nextUa = coalesce(
        array_min(filter(
          transform(idx, i =>
            when(i > start && element_at(norm, i).startsWith("user-agent:"), i)),
          x => x.isNotNull)),
        n + 1)
      when(start.isNotNull, slice(lines, start, nextUa - start))
        .otherwise(array().cast("array<string>"))
    }))
    when(best.isNotNull, members).otherwise(array().cast("array<string>"))
  }

  /** [[starRules]] for a specific requesting agent: the rule array of
    * the group(s) [[agentGroupLines]] selects, same `(allow, prefix)`
    * struct shape, feeding the SAME [[isAllowed]] longest-match /
    * Allow-tie-break evaluation. With `agent = "*"` only star groups
    * can match (product tokens are letter-only, never a prefix of
    * `"*"`), so the star view is the degenerate case of this one.
    */
  def agentRules(robots: Column, agent: Column): Column =
    rulesFromLines(agentGroupLines(robots, agent))

  /** [[filterAllowed]] with agent selection: appends `allowed` for a
    * (robots body, path) pair as seen by `agent` — group selection,
    * longest-match and the Allow tie-break, still one map-side pass but
    * STAGED through intermediate projections: the single-expression
    * form ([[agentRules]]) re-evaluates the normalized-line array once
    * per REFERENCE inside the nested folds (Catalyst inlines cheap-only
    * aliases), which measured ~4× this plan's cost at bench scale —
    * binding each array as a real column makes every regexp pass run
    * once per row.
    */
  def filterAllowedForAgent(
      df: DataFrame,
      agent: Column,
      robotsCol: String = "robots",
      pathCol: String = "path",
      out: String = "allowed"): DataFrame =
    withAgentGroupLines(df, agent, robotsCol, "__rob_group")
      .withColumn(out, isAllowed(col(pathCol), rulesFromLines(col("__rob_group"))))
      .drop("__rob_group")

  /** [[crawlDelayForAgent]] as a staged DataFrame pass — appends the
    * agent-selected `Crawl-delay` milliseconds (NULL when absent) as
    * `out`, the frontier-side producer for
    * [[Crawl.politenessScheduleWithDelays]]. Note the consumer's
    * documented contract: it treats NON-POSITIVE hints as "no opinion",
    * so an explicit `Crawl-delay: 0` here (emitted as 0 ms, faithfully)
    * does NOT zero the host's schedule — the default delay applies, the
    * politest reading and the one that preserves the positive-delay
    * invariant. Same staging rationale as [[filterAllowedForAgent]].
    */
  def withCrawlDelayForAgent(
      df: DataFrame,
      agent: Column,
      robotsCol: String = "robots",
      out: String = "delay_ms"): DataFrame =
    withAgentGroupLines(df, agent, robotsCol, "__rob_group")
      .withColumn(out, delayFromLines(col("__rob_group")))
      .drop("__rob_group")

  /** The [[agentGroupLines]] computation STAGED through intermediate
    * projections: the single-Column form re-evaluates the normalized
    * line array once per REFERENCE inside the nested folds (Catalyst
    * inlines aliases into consumers unless they are attribute-cheap),
    * which measured ~10× this plan's cost at bench scale — binding each
    * array as a real column runs every regexp pass once per row. Same
    * semantics, same output lines, interim columns dropped by callers.
    */
  private def withAgentGroupLines(
      df: DataFrame,
      agent: Column,
      robotsCol: String,
      outCol: String): DataFrame =
    df
      .withColumn("__rob_lines", split(col(robotsCol), "\n"))
      .withColumn("__rob_norm", normLines(col("__rob_lines")))
      .withColumn("__rob_score", scoreLines(col("__rob_norm"), agent))
      .withColumn("__rob_best",
        array_max(filter(col("__rob_score"), s => s.isNotNull)))
      .withColumn(outCol, groupMembers(col("__rob_lines"), col("__rob_norm"),
        col("__rob_score"), col("__rob_best")))
      .drop("__rob_lines", "__rob_norm", "__rob_score", "__rob_best")

  /** Parse the `User-agent: *` group of a robots.txt body into an array
    * of `(allow: boolean, prefix: string)` rules, in file order: the
    * lines strictly between the `User-agent: *` line and the next
    * `User-agent:` line (or EOF). Comments (`# …`) strip first; field
    * names match case-insensitively; prefixes keep their case (paths
    * are case-sensitive); empty prefixes and non-rule lines
    * (Crawl-delay, Sitemap, blanks) drop — an empty `Disallow:` is the
    * spec's allow-everything no-op. A body with no star group yields no
    * rules (everything allowed).
    */
  def starRules(robots: Column): Column =
    rulesFromLines(starGroupLines(robots))

  /** Group lines → `(allow, prefix)` rule structs, the shared back half
    * of [[starRules]] and [[agentRules]]: comments strip, keys match
    * case-insensitively, prefixes keep case, empty values and non-rule
    * lines drop.
    */
  private def rulesFromLines(group: Column): Column = {
    val parsed = transform(group, l => {
      val noComment = regexp_replace(l, "#.*$", "")
      val key = lower(trim(regexp_extract(noComment, "^([^:]+):", 1)))
      val value = trim(regexp_extract(noComment, "^[^:]+:(.*)$", 1))
      when(key === "allow" && value =!= "",
        struct(lit(true).as("allow"), value.as("prefix")))
        .when(key === "disallow" && value =!= "",
          struct(lit(false).as("allow"), value.as("prefix")))
    })
    filter(parsed, r => r.isNotNull)
  }

  /** Longest-match decision for a path against [[starRules]] output:
    * among rules whose prefix starts the path, the longest wins; a
    * length tie goes to Allow; no matching rule means allowed. Pure
    * integer/boolean fold over the (small) rule array.
    */
  def isAllowed(path: Column, rules: Column): Column = {
    val matching = filter(rules, r =>
      path.startsWith(r.getField("prefix")))
    val best = aggregate(
      matching,
      struct(lit(-1).as("len"), lit(true).as("allow")),
      (acc, r) => {
        val rl = length(r.getField("prefix"))
        when(rl > acc.getField("len"),
          struct(rl.as("len"), r.getField("allow").as("allow")))
          .when(rl === acc.getField("len") && r.getField("allow"),
            struct(rl.as("len"), lit(true).as("allow")))
          .otherwise(acc)
      })
    best.getField("allow")
  }

  /** Appends `allowed` for a (robots body, path) pair of columns —
    * [[starRules]] ∘ [[isAllowed]] in one map-side pass.
    */
  def filterAllowed(
      df: DataFrame,
      robotsCol: String = "robots",
      pathCol: String = "path",
      out: String = "allowed"): DataFrame =
    df.withColumn(out, isAllowed(col(pathCol), starRules(col(robotsCol))))
}

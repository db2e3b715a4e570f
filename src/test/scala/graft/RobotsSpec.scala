package graft

import org.apache.spark.sql.functions._
import graft.ops.Robots

/** robots.txt star-group evaluation: group isolation, longest match,
  * the Allow tie-break, comment/blank/no-op handling, and the
  * no-star-group default.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body = Seq(
    "# corpus crawler policy",
    "User-agent: special-bot",
    "Disallow: /",
    "",
    "User-Agent: *   # case-insensitive field names",
    "Disallow: /private",
    "Allow: /private/ok",
    "Disallow: /tmp",
    "Crawl-delay: 5",
    "Disallow:",
    "",
    "User-agent: other",
    "Disallow: /x").mkString("\n")

  private def allowed(paths: String*): Seq[Boolean] =
    paths.map(p => (body, p)).toDF("robots", "path")
      .select(Robots.isAllowed(col("path"), Robots.starRules(col("robots"))))
      .collect().map(_.getBoolean(0)).toSeq

  test("star group parses in order; other groups and no-op lines are invisible") {
    val rules = Seq(body).toDF("robots")
      .select(Robots.starRules(col("robots")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getBoolean(0), r.getString(1)))
    assert(rules == Seq(
      (false, "/private"), (true, "/private/ok"), (false, "/tmp")))
  }

  test("longest match wins; Allow beats Disallow on ties; no match allows") {
    assert(allowed(
      "/private/secret",   // /private disallow
      "/private/ok/page",  // /private/ok allow outranks /private
      "/tmp/x",            // /tmp disallow
      "/public/a",         // no rule matches
      "/x/y")              // the `other` group's rule must NOT leak
      == Seq(false, true, false, true, true))
    // tie: equal-length allow+disallow prefixes → allow
    val tie = Seq(("User-agent: *\nDisallow: /a\nAllow: /b", "/a"),
      ("User-agent: *\nDisallow: /same\nAllow: /same", "/same/x"))
      .toDF("robots", "path")
      .select(Robots.isAllowed(col("path"), Robots.starRules(col("robots"))))
      .collect().map(_.getBoolean(0)).toSeq
    assert(tie == Seq(false, true))
  }

  test("colon spacing variants: `User-agent:*` and padded fields both parse") {
    val tight = "User-agent:*\nDisallow:/secret"
    val padded = "User-agent  :  *\nDisallow : /secret"
    val got = Seq((tight, "/secret/x"), (tight, "/open"),
      (padded, "/secret/x"), (padded, "/open"))
      .toDF("robots", "path")
      .select(Robots.isAllowed(col("path"), Robots.starRules(col("robots"))))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(false, true, false, true))
  }

  test("no star group means everything is allowed; star group at EOF parses") {
    val noStar = "User-agent: special\nDisallow: /"
    val eofStar = "User-agent: special\nDisallow: /z\nUser-agent: *\nDisallow: /end"
    val got = Seq((noStar, "/anything"), (eofStar, "/end/x"), (eofStar, "/open"))
      .toDF("robots", "path")
      .select(Robots.isAllowed(col("path"), Robots.starRules(col("robots"))))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, true))
  }

  test("filterAllowed appends the decision column") {
    val df = Seq((body, "/tmp/q"), (body, "/fine")).toDF("robots", "path")
    val got = Robots.filterAllowed(df).collect()
      .map(r => (r.getString(1), r.getBoolean(2))).toSeq
    assert(got == Seq(("/tmp/q", false), ("/fine", true)))
  }

  private def agentAllowed(agent: String, paths: String*): Seq[Boolean] =
    paths.map(p => (body, p)).toDF("robots", "path")
      .select(Robots.isAllowed(col("path"),
        Robots.agentRules(col("robots"), lit(agent))))
      .collect().map(_.getBoolean(0)).toSeq

  test("agent groups: longest-token match selects the agent's own group over star") {
    // special-bot's group disallows everything — star's rules must not apply
    assert(agentAllowed("special-bot", "/anything", "/private/ok/x")
      == Seq(false, false))
    // prefix selection: agent token 'special-bot/1.2' matches 'special-bot'
    assert(agentAllowed("Special-Bot/1.2", "/anything") == Seq(false))
    // a foreign agent falls through to star
    assert(agentAllowed("neverbot", "/private/secret", "/private/ok/x", "/x/y")
      == Seq(false, true, true))
    // agent 'other' selects ITS group (only /x disallowed)
    assert(agentAllowed("other", "/x/y", "/private/secret") == Seq(false, true))
    // agentRules with "*" degenerates to starRules
    assert(agentAllowed("*", "/private/secret", "/private/ok/x", "/x/y")
      == Seq(false, true, true))
  }

  test("agent groups: matching is against the PRODUCT TOKEN, not product/version") {
    // RFC 9309 §2.2.1: the requesting agent's token ends at the first
    // character outside [A-Za-z_-], so a version-qualified group line
    // matches no agent (it is never a prefix of a bare token) and the
    // version suffix of the agent string never influences selection.
    val b = Seq(
      "User-agent: verbot/1",
      "Disallow: /v1only",
      "",
      "User-agent: verbot",
      "Disallow: /vall",
      "",
      "User-agent: *",
      "Disallow: /star").mkString("\n")
    def dec(agent: String, path: String): Boolean =
      Seq((b, path)).toDF("robots", "path")
        .select(Robots.isAllowed(col("path"),
          Robots.agentRules(col("robots"), lit(agent))))
        .collect().head.getBoolean(0)
    // 'verbot/1.0' selects the 'verbot' group — NOT 'verbot/1'
    assert(dec("verbot/1.0", "/v1only/x"))
    assert(!dec("verbot/1.0", "/vall/x"))
    assert(dec("verbot/1.0", "/star/x"))
    // the bare token selects the same group
    assert(!dec("verbot", "/vall/x") && dec("verbot", "/v1only/x"))
    // an agent with no letter token at all falls through to star
    assert(!dec("1.0", "/star/x") && dec("1.0", "/vall/x"))
  }

  test("agent groups: consecutive UA headers share a block; duplicate groups combine") {
    val shared = Seq(
      "User-agent: abot",
      "User-agent: bbot",
      "Disallow: /x",
      "",
      "User-agent: bbot",
      "Disallow: /y",
      "",
      "User-agent: *",
      "Disallow: /z").mkString("\n")
    def dec(agent: String, path: String): Boolean =
      Seq((shared, path)).toDF("robots", "path")
        .select(Robots.isAllowed(col("path"),
          Robots.agentRules(col("robots"), lit(agent))))
        .collect().head.getBoolean(0)
    // both agents of the run get the shared rule
    assert(!dec("abot", "/x/1") && !dec("bbot", "/x/1"))
    // bbot's two groups COMBINE: /x and /y both disallowed, /z is star-only
    assert(!dec("bbot", "/y/1") && dec("bbot", "/z/1") && dec("abot", "/y/1"))
    // the star group still binds everyone else
    assert(!dec("cbot", "/z/1") && dec("cbot", "/x/1"))
    // longest-match selection is case-insensitive on the token
    assert(!dec("BBot-Images", "/y/1"))
    // RFC 9309 group formation ignores blank and comment-only lines
    // BETWEEN headers of a run: goodbot shares the star block here
    val filler = Seq(
      "User-agent: goodbot",
      "# our crawler",
      "",
      "User-agent: *",
      "Disallow: /").mkString("\n")
    val got = Seq(("goodbot", "/any"), ("other", "/any"))
      .map { case (a, p) => (filler, a, p) }.toDF("robots", "agent", "path")
      .select(Robots.isAllowed(col("path"),
        Robots.agentRules(col("robots"), col("agent"))))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(false, false),
      "a comment/blank between UA headers must not hand goodbot an empty rule set")
    // the staged DataFrame form shares the same group formation
    val staged = Robots.filterAllowedForAgent(
      Seq((filler, "goodbot", "/any")).toDF("robots", "agent", "path"),
      col("agent")).collect().head.getBoolean(3)
    assert(!staged)
  }

  test("crawlDelayForAgent: the agent's group delay, star fall-through, absence is NULL") {
    val b = "User-agent: fastbot\nCrawl-delay: 0.25\n\nUser-agent: *\n" +
      "Crawl-delay: 2.5\n\nUser-agent: nodelay\nDisallow: /x"
    val got = Seq("FastBot/1.0", "other", "nodelay").map(a => (b, a))
      .toDF("robots", "agent")
      .select(Robots.crawlDelayForAgent(col("robots"), col("agent")))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(got == Seq(250L, 2500L, -1L))
    // star view unchanged by the refactor
    val star = Seq(b).toDF("robots")
      .select(Robots.crawlDelay(col("robots"))).collect().head.getLong(0)
    assert(star == 2500L)
  }

  test("filterAllowedForAgent appends the agent-scoped decision") {
    val df = Seq((body, "/tmp/q"), (body, "/fine")).toDF("robots", "path")
    val got = Robots.filterAllowedForAgent(df, lit("special-bot")).collect()
      .map(r => (r.getString(1), r.getBoolean(2))).toSeq
    assert(got == Seq(("/tmp/q", false), ("/fine", false)))
  }
}

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
}

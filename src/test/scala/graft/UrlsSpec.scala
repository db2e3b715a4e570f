package graft

import graft.ops.Urls

/** URL canonicalization: one hand-written fixture per normalization
  * rule, plus the PSL-lite registered-domain cases and idempotence.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[(String, String, String)] =
    Urls.canonicalize(urls.toDF("url"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq

  test("scheme/host case, default ports, fragments, trailing slashes") {
    val got = canon(
      "HTTP://WWW.Example.COM:80/A/b/#frag",
      "https://example.com:443/x",
      "https://example.com:80/x", // :80 on https is NON-default — kept
      "http://example.com:8080/x",
      "http://example.com",       // empty path → /
      "http://example.com///")    // all trailing slashes strip → /
    assert(got(0) == (("http://www.example.com/A/b", "www.example.com", "example.com")))
    assert(got(1) == (("https://example.com/x", "example.com", "example.com")))
    assert(got(2) == (("https://example.com:80/x", "example.com", "example.com")))
    assert(got(3) == (("http://example.com:8080/x", "example.com", "example.com")))
    assert(got(4)._1 == "http://example.com/")
    assert(got(5)._1 == "http://example.com/")
  }

  test("tracking params drop, the rest sort, empty query disappears") {
    val got = canon(
      "http://h.com/p?utm_source=a&z=9&a=1&fbclid=xyz&gclid=1",
      "http://h.com/p?z=9&a=1",   // same params, other order
      "http://h.com/p?utm_campaign=only",
      "http://h.com/p?")
    assert(got(0)._1 == "http://h.com/p?a=1&z=9")
    assert(got(1)._1 == got(0)._1)
    assert(got(2)._1 == "http://h.com/p")
    assert(got(3)._1 == "http://h.com/p")
  }

  test("registered domain: ccTLD second-level keeps three labels, else two") {
    val got = canon(
      "http://www.shop.example.co.uk/x",
      "http://a.b.example.com/x",
      "http://example.org/x",
      "http://localhost/x")
    assert(got(0)._3 == "example.co.uk")
    assert(got(1)._3 == "example.com")
    assert(got(2)._3 == "example.org")
    assert(got(3)._3 == null) // single label: no registrable domain
  }

  test("malformed rows canonicalize to NULL; canonicalization is idempotent") {
    val bad = Urls.canonicalize(Seq("not a url", "ftp-ish//x").toDF("url"))
      .collect().map(_.isNullAt(1))
    assert(bad.forall(identity))
    val once = canon("HTTP://H.CoM:80/a/?z=1&utm_source=x#f").head._1
    assert(canon(once).head._1 == once, "canonical form must be a fixed point")
  }
}

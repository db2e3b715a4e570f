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

  test("PSL: wildcard, exception, geographic and private-section rules") {
    val got = canon(
      "http://foo.bar.ck/x",            // *.ck: bar.ck is a public suffix
      "http://bar.ck/x",                //   ... so bar.ck itself registers nothing
      "http://www.ck/x",                // !www.ck exception: ps = ck
      "http://sub.city.kawasaki.jp/x",  // !city.kawasaki.jp under *.kawasaki.jp
      "http://ward.kawasaki.jp/x",      // *.kawasaki.jp: ward.kawasaki.jp is a ps
      "http://www.pref.aichi.jp/x",     // geographic SLD aichi.jp
      "http://host.ne.jp/x",            // ne.jp family (PSL-lite mislabeled this)
      "http://ne.jp/x",                 // host IS a public suffix → null
      "http://alice.github.io/x",       // private section
      "http://bucket.s3.amazonaws.com/x",
      "http://my-lb.us-east-1.elb.amazonaws.com/x") // 3-label wildcard rule
    assert(got(0)._3 == "foo.bar.ck")
    assert(got(1)._3 == null)
    assert(got(2)._3 == "www.ck")
    assert(got(3)._3 == "city.kawasaki.jp")
    assert(got(4)._3 == null)
    assert(got(5)._3 == "pref.aichi.jp")
    assert(got(6)._3 == "host.ne.jp")
    assert(got(7)._3 == null)
    assert(got(8)._3 == "alice.github.io")
    assert(got(9)._3 == "bucket.s3.amazonaws.com")
    assert(got(10)._3 == "my-lb.us-east-1.elb.amazonaws.com")
  }

  test("userinfo is kept verbatim but never read as the host") {
    val got = canon(
      "http://User:Pw@Example.COM:80/x",
      "http://token@h.co.uk/p/")
    assert(got(0) == (("http://User:Pw@example.com/x", "example.com", "example.com")))
    assert(got(1) == (("http://token@h.co.uk/p", "h.co.uk", "h.co.uk")))
    val once = got(0)._1 // canonical form with userinfo is still a fixed point
    assert(canon(once).head._1 == once)
  }

  test("resolve: the RFC 3986 reference cases against a directory base") {
    import org.apache.spark.sql.functions.col
    val base = "https://h.example.com/dir/index.html?q=1#top"
    val refs = Seq(
      "https://other.org/x",       // absolute
      "mailto:a@b.c",              // non-http scheme passes through
      "//cdn.net/lib.js",          // protocol-relative
      "/root/p",                   // root-relative
      "sub/p.html",                // path-relative (dir of base)
      "?p=2",                      // query replacement
      "#frag",                     // fragment replacement
      "")                          // empty = base
    val got = refs.map(r => (base, r)).toDF("base", "ref")
      .select(graft.ops.Urls.resolve(col("base"), col("ref")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "https://other.org/x",
      "mailto:a@b.c",
      "https://cdn.net/lib.js",
      "https://h.example.com/root/p",
      "https://h.example.com/dir/sub/p.html",
      "https://h.example.com/dir/index.html?p=2",
      "https://h.example.com/dir/index.html?q=1#frag",
      base))
    // non-absolute base → NULL, host-only base resolves relatives at /
    val edge = Seq(("not a url", "x"), ("http://h.co", "a/b")).toDF("base", "ref")
      .select(graft.ops.Urls.resolve(col("base"), col("ref")))
      .collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getString(0) == "http://h.co/a/b")
  }

  test("malformed rows canonicalize to NULL; canonicalization is idempotent") {
    val bad = Urls.canonicalize(Seq("not a url", "ftp-ish//x").toDF("url"))
      .collect().map(_.isNullAt(1))
    assert(bad.forall(identity))
    val once = canon("HTTP://H.CoM:80/a/?z=1&utm_source=x#f").head._1
    assert(canon(once).head._1 == once, "canonical form must be a fixed point")
  }
}

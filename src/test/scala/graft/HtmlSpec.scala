package graft

import org.apache.spark.sql.functions._
import graft.ops.Html

/** Markup stripping and the link-density main-content filter: span
  * handling (incl. multi-line), entity decode order, whitespace
  * collapse, plain-text fixed point, and the line filter's keep/drop
  * contract.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def strip(htmls: String*): Seq[String] =
    Html.stripMarkup(htmls.toDF("html")).collect().map(_.getString(1)).toSeq

  test("stripMarkup: script/style/comment spans drop with their content") {
    val got = strip(
      "a<script type=x>\nvar n = 1 < 2;\n</script>b", // multi-line, inner '<'
      "a<style>p { color: red }</style>b<style>q{}</style>c", // non-greedy: two spans
      "a<!-- hidden\nacross lines -->b",
      "<SCRIPT>loud()</SCRIPT>quiet") // case-insensitive
    assert(got == Seq("a b", "a b c", "a b", "quiet"))
  }

  test("stripMarkup: tags become spaces, entities decode once, in order") {
    val got = strip(
      "one<br>two<div class=x>three</div>",
      "&lt;b&gt; &amp; &quot;q&quot; &#39;a&#39; &apos;b&apos; x&nbsp;y",
      "&amp;lt; stays encoded", // amp decodes LAST: &amp;lt; → &lt;, not <
      "  spaced \t out \n text  ")
    assert(got(0) == "one two three")
    assert(got(1) == "<b> & \"q\" 'a' 'b' x y")
    assert(got(2) == "&lt; stays encoded")
    assert(got(3) == "spaced out text")
  }

  test("stripMarkup: markup-free plain text is a fixed point") {
    val plain = "Just ordinary prose, nothing special at all."
    assert(strip(plain) == Seq(plain))
    assert(strip(strip(plain).head) == Seq(plain))
  }

  test("mainContent: link-dense and too-short lines drop, prose survives in order") {
    val html = Seq(
      "<html><head><script>var n=1;</script></head>", // cleans to empty
      "<h1>Title here</h1>",
      "<div><a href=/h>Home</a> <a href=/a>About</a> <a href=/c>Contact</a></div>",
      "<p>This paragraph has one <a href=/m>small link</a> inside a lot of prose.</p>",
      "<ul><li><a href=/1>Long link one</a></li><li><a href=/2>Long link two</a></li></ul>",
      "ok", // under minTextChars
      "</body></html>").mkString("\n")
    val got = Html.mainContent(Seq(html).toDF("html"))
      .collect().head.getString(1)
    assert(got ==
      "Title here This paragraph has one small link inside a lot of prose.")
  }

  test("extractLinks: quoted, single-quoted and unquoted hrefs in order; script anchors don't count") {
    val html = """<a href="https://a.org/1">one</a>
      |<a class=x href='/two'>two</a>
      |<a href=three.html>three</a>
      |<script>var s = '<a href=/fake>no</a>';</script>
      |<a name=anchor>no href</a>""".stripMargin
    val got = Seq(html).toDF("html")
      .select(Html.extractLinks(col("html")))
      .collect().head.getSeq[String](0)
    assert(got == Seq("https://a.org/1", "/two", "three.html"))
  }

  test("feedLinks: both dialects, any attribute order/quoting, token-list rel; others drop") {
    val html = """<link rel="alternate" type="application/rss+xml" href="/feed.xml">
      |<link type='application/atom+xml' rel='alternate nofollow' href='https://f.org/atom.xml'>
      |<link href=feed2.xml type=application/rss+xml rel=alternate>
      |<link rel="stylesheet" href="/style.css">
      |<link rel="alternate" type="text/html" href="/mobile">
      |<link rel="alternate" type="application/rss+xml">""".stripMargin
    val got = Seq(html).toDF("html")
      .select(Html.feedLinks(col("html")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))
    assert(got == Seq(
      ("/feed.xml", "rss"),
      ("https://f.org/atom.xml", "atom"),
      ("feed2.xml", "rss")))
  }

  test("extractAnchors: (href, text) pairs — inner markup, entities, squish, dangling tags") {
    val html = """<a href="https://a.org/1">Read   <b>more</b></a>
      |<a class=x href='/two'>R&amp;D news</a>
      |<a href=three.html></a>
      |<a href=/dangling>never closed
      |<a name=anchor>no href</a>""".stripMargin
    val got = Seq(html).toDF("html")
      .select(Html.extractAnchors(col("html")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))
    // the dangling <a href=/dangling> has no </a> before the next anchor
    // opens — its capture runs to THAT anchor's close; contract: only
    // well-formed elements yield faithful pairs, malformed nesting folds
    // into one (the /dangling element swallows the hrefless anchor)
    assert(got.take(3) == Seq(
      ("https://a.org/1", "Read more"),
      ("/two", "R&D news"),
      ("three.html", "")))
    assert(got.length == 4 && got(3)._1 == "/dangling")
  }

  test("tags merely STARTING with 'a' are not anchors: <area>/<abbr> don't extract or count") {
    val html = """<area shape=rect href=/map-target>
      |<abbr href=/malformed>AB</abbr>
      |<a href=/real>genuine</a>
      |<map><area href=/m2 alt=x></map> trailing</a>""".stripMargin
    val links = Seq(html).toDF("html")
      .select(Html.extractLinks(col("html"))).collect().head.getSeq[String](0)
    assert(links == Seq("/real"))
    val anchors = Seq(html).toDF("html")
      .select(Html.extractAnchors(col("html"))).collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getString(1)))
    assert(anchors == Seq(("/real", "genuine")))
    // linkChars (the density numerator) applies the same boundary: the
    // <abbr…>AB</abbr> span must not count as anchor text
    val n = Seq("<abbr title=x>ABCDEFGH</abbr> and <a href=/y>hi</a> prose</a>")
      .toDF("l").select(Html.linkChars(col("l"))).collect().head.getInt(0)
    assert(n == 2)
  }

  test("extractAnchors: '>' inside a quoted attribute value doesn't end the tag") {
    val html = """<a href="/x?q=a>b">click</a> <a title="a>b" href=/y>go</a>"""
    val got = Seq(html).toDF("html")
      .select(Html.extractAnchors(col("html")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))
    assert(got == Seq(("/x?q=a>b", "click"), ("/y", "go")))
  }

  test("baseHref: first base wins, quoting forms, boundary, absence is NULL") {
    val got = Seq(
      """<head><base href="https://cdn.example/a/"><base href=/second></head>""",
      """<base target=_blank href='/x'>""",   // other attrs before href
      """<basefont href=/nope><a href=/y>z</a>""", // tag-name boundary
      "no base here at all")
      .toDF("html")
      .select(Html.baseHref(col("html")))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(
      Some("https://cdn.example/a/"), Some("/x"), None, None))
  }

  test("title and metaContent: entity decode, both attribute orders, og: keys, absence") {
    val html = """<head><title> A &amp; B <b>bold</b> </title>
      |<meta content="desc first" name=description>
      |<meta name="keywords" content="k1, k2">
      |<meta property='og:title' content='OG &quot;T&quot;'>
      |<meta name="empty" content="">
      |</head>""".stripMargin
    val df = Seq(html).toDF("html")
    def one(c: org.apache.spark.sql.Column) =
      Option(df.select(c).collect().head.getString(0))
    assert(one(Html.title(col("html"))) == Some("A & B bold"))
    assert(one(Html.metaContent(col("html"), "description")) == Some("desc first"))
    assert(one(Html.metaContent(col("html"), "keywords")) == Some("k1, k2"))
    assert(one(Html.metaContent(col("html"), "og:title")) == Some("OG \"T\""))
    assert(one(Html.metaContent(col("html"), "empty")).isEmpty)   // empty → NULL
    assert(one(Html.metaContent(col("html"), "missing")).isEmpty) // absent → NULL
    assert(one(Html.title(lit("<p>no title</p>"))).isEmpty)
    intercept[IllegalArgumentException](Html.metaContent(col("html"), "bad key!"))
  }

  test("mainContent: multi-line script bodies are stripped before the line split") {
    val html = Seq(
      "<p>Real opening prose stays.</p>",
      "<script>",
      "var leakedLooksLikeProse = 'long enough to pass every line filter';",
      "</script>",
      "<p>Real closing prose stays.</p>").mkString("\n")
    val got = Html.mainContent(Seq(html).toDF("html")).collect().head.getString(1)
    assert(got == "Real opening prose stays. Real closing prose stays.")
  }

  test("mainContent: density threshold is integer-exact and tunable") {
    // 10 anchor chars / 27 cleaned chars: 1000 <= 50*27 keeps, > 30*27 drops
    val df = Seq("<a href=/x>1234567890</a> extra prose here").toDF("html")
    assert(Html.mainContent(df).collect().head.getString(1) ==
      "1234567890 extra prose here")
    assert(Html.mainContent(df, maxLinkDensityPct = 30)
      .collect().head.getString(1) == "")
    intercept[IllegalArgumentException] {
      Html.mainContent(df, maxLinkDensityPct = 101)
    }
  }
  test("removeTemplateLines: host-scoped frequency, order preserved, all-template pages empty") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // host A: 3 pages sharing a navbar; host B: 2 pages sharing the SAME
    // line text — per-host scoping must drop it only where df >= 3
    val pages = Seq(
      (0L, "A", "shared nav\nalpha prose 0\nshared nav"),
      (1L, "A", "shared nav\nbeta prose 1"),
      (2L, "A", "shared nav\ngamma prose 2"),
      (3L, "B", "shared nav\ndelta prose 3"),
      (4L, "B", "shared nav\nepsilon prose 4"),
      (5L, "A", "shared nav") // everything template -> empty page
    ).toDF("doc_id", "host", "text")
    val got = graft.ops.Html.removeTemplateLines(pages, minPages = 3)
      .select(col("doc_id"), col("clean_text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got(0) == ((0L, "alpha prose 0")))
    assert(got(1) == ((1L, "beta prose 1")))
    assert(got(2) == ((2L, "gamma prose 2")))
    // host B's df for "shared nav" is 2 < 3: the line SURVIVES there
    assert(got(3) == ((3L, "shared nav\ndelta prose 3")))
    assert(got(4) == ((4L, "shared nav\nepsilon prose 4")))
    assert(got(5) == ((5L, "")))
    // repeated occurrences WITHIN one page count that page once: doc 0
    // had the navbar twice, both dropped, prose order preserved
  }

}

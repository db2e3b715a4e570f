package graft

import graft.ops.Crawl

/** Politeness scheduling: frontier dedup (max priority wins), per-host
  * serialization with deterministic tie-breaks, the per-host cap, and
  * malformed-URL quarantine.
  */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private val frontier = Seq(
    // host a: three distinct URLs + one duplicate spelled with tracking
    // params and the other param order (must collapse, higher priority wins)
    ("http://a.com/p1?z=9&a=1", 10L),
    ("http://a.com/p1?a=1&utm_source=x&z=9", 40L),
    ("http://a.com/p2", 30L),
    ("http://a.com/p3", 30L), // ties with p2 → URL order breaks it
    // host b: one URL; malformed row drops
    ("https://b.com/only", 5L),
    ("not-a-url", 99L))
    .toDF("url", "priority")

  test("dedup keeps max priority; slots serialize per host; ties break by URL") {
    val got = Crawl.politenessSchedule(frontier, delayMs = 250L)
      .orderBy("host", "fetch_offset_ms")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a.com", "http://a.com/p1?a=1&z=9", 40L, 0L), // dup collapsed, 40 wins
      ("a.com", "http://a.com/p2", 30L, 250L),       // 30-tie → p2 before p3
      ("a.com", "http://a.com/p3", 30L, 500L),
      ("b.com", "https://b.com/only", 5L, 0L)))      // hosts schedule independently
  }

  test("maxPerHost admits only the top-priority slots") {
    val got = Crawl.politenessSchedule(frontier, delayMs = 250L, maxPerHost = 1)
      .orderBy("host").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("a.com", 40L), ("b.com", 5L)))
  }

  test("invalid arguments are rejected loudly") {
    intercept[IllegalArgumentException](Crawl.politenessSchedule(frontier, delayMs = 0L))
    intercept[IllegalArgumentException](Crawl.politenessSchedule(frontier, maxPerHost = 0))
  }

  test("recrawlPriority: change flags, rates, ages and the priority product") {
    // u1: hashes a,a,b,a over ts 10..40 → 2 changes / 3 intervals; last 40
    // u2: single fetch → rate 0, priority 0
    // u3: a,a → 0 changes / 1 interval
    val hist = Seq(
      ("u1", 10L, "a"), ("u1", 20L, "a"), ("u1", 30L, "b"), ("u1", 40L, "a"),
      ("u2", 15L, "x"),
      ("u3", 5L, "a"), ("u3", 25L, "a"))
      .toDF("url", "ts_ms", "content_hash")
    val got = Crawl.recrawlPriority(hist, asOfMs = 100L)
      .orderBy("url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("u1", 4L, 2L, 666666L, 60L, 39999L), // (2/3)e6 = 666666; *60/1000 = 39999
      ("u2", 1L, 0L, 0L, 85L, 0L),
      ("u3", 2L, 0L, 0L, 75L, 0L)))
  }

  test("allocateBudget: floors + largest remainders, sum is exactly the budget") {
    // weights 5,3,2 over budget 7: floors 3,2,1 (Σ6), remainders 5,1,4 →
    // the 1 leftover slot goes to a (largest remainder)
    val got = Crawl.allocateBudget(
      Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("domain", "weight"), budget = 7L)
      .orderBy("domain").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 4L), ("b", 2L), ("c", 1L)))
  }

  test("allocateBudget: remainder ties break by domain; zero weights allocate zero") {
    val got = Crawl.allocateBudget(
      Seq(("b", 1L), ("a", 1L), ("z", 0L), ("n", -5L)).toDF("domain", "weight"), budget = 3L)
      .orderBy("domain").collect().map(r => (r.getString(0), r.getLong(2)))
    // w = {a:1, b:1}: floors 1,1; 1 leftover → tie on remainder → 'a' wins
    assert(got.toSeq == Seq(("a", 2L), ("b", 1L), ("n", 0L), ("z", 0L)))
    assert(got.map(_._2).sum == 3L)
  }

  test("allocateBudget conservation on adversarial weights (property)") {
    val rnd = new scala.util.Random(7)
    val doms = (1 to 50).map(i => (s"d$i", rnd.nextInt(1000).toLong))
    for (budget <- Seq(0L, 1L, 97L, 100000L)) {
      val alloc = Crawl.allocateBudget(doms.toDF("domain", "weight"), budget = budget)
        .collect().map(_.getLong(2))
      assert(alloc.sum == (if (doms.exists(_._2 > 0)) budget else 0L),
        s"budget $budget not conserved")
      assert(alloc.forall(_ >= 0))
    }
  }

  test("allocateBudget: zero total weight allocates nothing at all") {
    val got = Crawl.allocateBudget(
      Seq(("a", 0L), ("b", 0L)).toDF("domain", "weight"), budget = 5L)
      .collect().map(_.getLong(2))
    assert(got.forall(_ == 0L))
  }

  test("Robots.crawlDelay: integer and fractional seconds, group isolation, absence") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Robots
    val got = Seq(
      "User-agent: *\nCrawl-delay: 2\nDisallow: /x",      // 2 s
      "User-agent: *\ncrawl-delay:1.5",                    // 1.5 s, colon-tight, case
      "User-agent: *\nCrawl-delay: 0.25\nCrawl-delay: 9", // first declaration wins
      "User-agent: bot\nCrawl-delay: 7\n\nUser-agent: *\nDisallow: /", // foreign group
      "User-agent: *\nCrawl-delay: soon",                  // unparseable → NULL
      "User-agent: *\nDisallow: /x")                       // absent → NULL
      .toDF("robots")
      .select(Robots.crawlDelay(col("robots")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(2000L), Some(1500L), Some(250L), None, None, None))
  }

  test("Robots.sitemapUrls: global scope, file order, comment strip, valueless drops") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Robots
    val body = Seq(
      "Sitemap: https://a/s1.xml\n" +              // before any group
        "User-agent: *\nDisallow: /x\n" +
        "sitemap:https://a/S2.xml  # comment\n" +  // colon-tight, case key, URL case kept
        "User-agent: bot\n" +
        "Sitemap: https://a/s3.xml\n" +            // inside a FOREIGN group: still global
        "Sitemap:\n" +                              // valueless: drops
        "Crawl-delay: 2")
      .toDF("robots")
      .select(Robots.sitemapUrls(col("robots")))
      .collect().head.getSeq[String](0)
    assert(body == Seq("https://a/s1.xml", "https://a/S2.xml", "https://a/s3.xml"))
  }

  test("politenessScheduleWithDelays: per-host max hint, default fallback, delay-scaled slots") {
    val f = Seq(
      ("http://a.com/p1", 10L, Some(2000L)),
      ("http://a.com/p2", 30L, Some(500L)),  // a.com delay = max(2000, 500) = 2000
      ("https://b.com/x", 5L, None),          // nobody opined → default 300
      ("https://b.com/y", 9L, None))
      .toDF("url", "priority", "delay_ms")
    val got = Crawl.politenessScheduleWithDelays(f, defaultDelayMs = 300L)
      .orderBy("host", "fetch_offset_ms").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a.com", "http://a.com/p2", 2000L, 0L),
      ("a.com", "http://a.com/p1", 2000L, 2000L),
      ("b.com", "https://b.com/y", 300L, 0L),
      ("b.com", "https://b.com/x", 300L, 300L)))
  }

  test("politenessScheduleWithDelays: Crawl-delay 0 and negative hints fall back to default") {
    val f = Seq(
      ("http://c.com/1", 1L, Some(0L)),    // declared zero — no opinion
      ("http://c.com/2", 2L, Some(-5L)))   // garbage — no opinion
      .toDF("url", "priority", "delay_ms")
    val got = Crawl.politenessScheduleWithDelays(f, defaultDelayMs = 250L)
      .orderBy("fetch_offset_ms").collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((250L, 0L), (250L, 250L)),
      "non-positive hints must not defeat the positive-delay invariant")
  }

  test("recrawlPriority: equal-timestamp fetches are deterministic and nulls never count as change") {
    val hist = Seq(
      ("u1", 100L, "a"), ("u1", 100L, "b"), ("u1", 200L, "a"), // tie → (ts, hash) order: a,b then a
      ("u2", 1L, "a"), ("u2", 2L, null), ("u2", 3L, "a"))       // null on either side = no change
      .toDF("url", "ts_ms", "content_hash")
    val got = Crawl.recrawlPriority(hist, asOfMs = 300L)
      .orderBy("url").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("u1", 2L), ("u2", 0L)))
  }

  test("sitemapEntries: urls, index entries, loc-less drops, lastmod nullable, loc trims") {
    import org.apache.spark.sql.functions.col
    val xml = """<?xml version="1.0"?><urlset>
      |<url><loc> https://a.com/1 </loc><lastmod>2024-01-02</lastmod></url>
      |<url><loc>https://a.com/2</loc></url>
      |<url><lastmod>2024-09-09</lastmod></url>
      |<sitemap><loc>https://a.com/more.xml</loc></sitemap>
      |</urlset>""".stripMargin
    val got = Seq(xml).toDF("xml")
      .select(Crawl.sitemapEntries(col("xml")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))
    assert(got == Seq(
      ("https://a.com/1", Some("2024-01-02"), false),
      ("https://a.com/2", None, false),
      ("https://a.com/more.xml", None, true)))
  }

  test("sitemapDiscovery: robots declarations join fetched files, gzip'd or plain") {
    import graft.functions.BinaryCodecs
    val robots = Seq(
      (0L, "User-agent: *\nSitemap: https://a.com/sm.xml.gz\n"),
      (1L, "Sitemap: https://b.com/sm.xml\nSitemap: https://never.fetched/x.xml\n"),
      (2L, "Disallow: /private\n") // declares nothing
    ).toDF("doc_id", "robots")
    def xml(host: String) =
      s"<urlset><url><loc>https://$host/1</loc><lastmod>2024-02-03</lastmod></url>" +
        s"<url><loc>https://$host/2</loc></url></urlset>"
    val files = Seq(
      ("https://a.com/sm.xml.gz", BinaryCodecs.gzip(xml("a.com").getBytes("UTF-8"))),
      ("https://b.com/sm.xml", xml("b.com").getBytes("UTF-8")),
      // corrupt gzip: the file quarantines, its declarer gets nothing
      ("https://never.fetched/x.xml",
        BinaryCodecs.gzip("x".getBytes).dropRight(2))
    ).toDF("url", "payload")
    val got = graft.ops.Crawl.sitemapDiscovery(robots, files)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        Option(r.getString(4)), r.getBoolean(5)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == Seq(
      (0L, "https://a.com/sm.xml.gz", 0L, "https://a.com/1", Some("2024-02-03"), false),
      (0L, "https://a.com/sm.xml.gz", 1L, "https://a.com/2", None, false),
      (1L, "https://b.com/sm.xml", 0L, "https://b.com/1", Some("2024-02-03"), false),
      (1L, "https://b.com/sm.xml", 1L, "https://b.com/2", None, false)))
    // the small side broadcasts: no shuffle exchange feeding the join
    val plan = graft.ops.Crawl.sitemapDiscovery(robots, files)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("sitemapDiscoveryRecursive: index pointers at depth 1, child entries at depth 2") {
    import graft.functions.BinaryCodecs
    val robots = Seq((0L, "Sitemap: https://a.com/index.xml.gz\n")).toDF("doc_id", "robots")
    val indexXml = "<sitemapindex><sitemap><loc>https://a.com/c0.xml</loc></sitemap>" +
      "<sitemap><loc>https://a.com/missing.xml</loc></sitemap></sitemapindex>"
    val childXml = "<urlset><url><loc>https://a.com/p/1</loc></url>" +
      "<url><loc>https://a.com/p/2</loc><lastmod>2024-03-04</lastmod></url></urlset>"
    val files = Seq(
      ("https://a.com/index.xml.gz", BinaryCodecs.gzip(indexXml.getBytes("UTF-8"))),
      ("https://a.com/c0.xml", childXml.getBytes("UTF-8"))
      // missing.xml was never fetched: depth-2 contributes nothing for it
    ).toDF("url", "payload")
    val got = graft.ops.Crawl.sitemapDiscoveryRecursive(robots, files, maxDepth = 2)
      .collect()
      .map(r => (r.getLong(6), r.getString(1), r.getLong(2), r.getString(3),
        Option(r.getString(4)), r.getBoolean(5)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == Seq(
      (1L, "https://a.com/index.xml.gz", 0L, "https://a.com/c0.xml", None, true),
      (1L, "https://a.com/index.xml.gz", 1L, "https://a.com/missing.xml", None, true),
      (2L, "https://a.com/c0.xml", 0L, "https://a.com/p/1", None, false),
      (2L, "https://a.com/c0.xml", 1L, "https://a.com/p/2", Some("2024-03-04"), false)))
    // depth 1 alone = the single-level walk
    assert(graft.ops.Crawl.sitemapDiscoveryRecursive(robots, files, maxDepth = 1)
      .count() == 2)
  }

  test("feedDiscovery: declared feeds resolve against the page, join fetched files, entries in order") {
    import graft.functions.BinaryCodecs
    val pages = Seq(
      (0L, "https://a.com/p/1",
        "<head><link rel=\"alternate\" type=\"application/rss+xml\" href=\"/feed.xml\">" +
          "<link type='application/atom+xml' rel='alternate' href='https://f.org/atom.xml'>" +
          "<link rel=\"stylesheet\" href=\"/s.css\"></head>"),
      // declared but never fetched: the fetch-gap rule
      (1L, "https://b.com/p/2",
        "<head><link rel=\"alternate\" type=\"application/rss+xml\" " +
          "href=\"https://never.fetched/f.xml\"></head>")
    ).toDF("doc_id", "page_url", "html")
    val rssXml = "<rss><channel><item><link>https://a.com/x/1</link></item>" +
      "<item><link> https://a.com/x/2 </link></item>" +
      "<item><title>no link</title></item></channel></rss>"
    val atomXml = "<feed><entry><link href=\"https://f.org/e/1\"/></entry>" +
      "<entry><link href='https://f.org/e/2'/></entry></feed>"
    val files = Seq(
      ("https://a.com/feed.xml", BinaryCodecs.gzip(rssXml.getBytes("UTF-8"))),
      ("https://f.org/atom.xml", atomXml.getBytes("UTF-8"))
    ).toDF("url", "payload")
    val got = Crawl.feedDiscovery(pages, files).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getString(5)))
      .sortBy(t => (t._2, t._4))
    assert(got.toSeq == Seq(
      (0L, "https://a.com/feed.xml", "rss", 0L, "https://a.com/x/1", "rss"),
      (0L, "https://a.com/feed.xml", "rss", 1L, "https://a.com/x/2", "rss"),
      (0L, "https://f.org/atom.xml", "atom", 0L, "https://f.org/e/1", "atom"),
      (0L, "https://f.org/atom.xml", "atom", 1L, "https://f.org/e/2", "atom")))
    // Atom rel discipline: a self/edit API link listed FIRST must not
    // win — rel="alternate" (or rel absent) names the entry's page;
    // an entry with only non-alternate links contributes nothing
    val relXml = "<feed>" +
      "<entry><link rel=\"self\" href=\"https://api.example/e/1\"/>" +
      "<link rel=\"alternate\" href=\"https://example.com/post/1\"/></entry>" +
      "<entry><link rel='edit' href='https://api.example/e/2'/></entry></feed>"
    import org.apache.spark.sql.functions.col
    val relGot = Seq(relXml).toDF("xml")
      .select(Crawl.feedEntries(col("xml")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))
    assert(relGot == Seq(("https://example.com/post/1", "atom")))
    // the feed-file side broadcasts, the page side never shuffles
    val plan = Crawl.feedDiscovery(pages, files).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("sitemapDiscovery: a re-fetched (duplicate-URL) file does not fan out entries") {
    val robots = Seq((0L, "Sitemap: https://a.com/sm.xml\n")).toDF("doc_id", "robots")
    val xml = "<urlset><url><loc>https://a.com/1</loc></url>" +
      "<url><loc>https://a.com/2</loc></url></urlset>"
    val files = Seq(
      ("https://a.com/sm.xml", xml.getBytes("UTF-8")),
      ("https://a.com/sm.xml", xml.getBytes("UTF-8")) // fetch log delivered it twice
    ).toDF("url", "payload")
    assert(graft.ops.Crawl.sitemapDiscovery(robots, files).count() == 2)
    assert(graft.ops.Crawl.sitemapDiscoveryRecursive(robots, files, maxDepth = 2)
      .count() == 2)
  }
}

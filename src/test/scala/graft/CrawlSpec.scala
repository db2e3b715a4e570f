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
}

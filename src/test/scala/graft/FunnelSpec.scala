package graft

import org.apache.spark.sql.functions._
import graft.ops.{Funnel, TimeSeries}

/** Ordered funnel + debounce throttle-dedup (round 3). */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  private def ev(rows: (String, String, String)*) =
    rows.zipWithIndex.map { case ((u, t, at), i) => (u, t, ts(at), i.toLong) }
      .toDF("user", "etype", "at", "eid")

  // ---------------------------------------------------------------- funnel

  test("funnel: steps must occur strictly in order") {
    val df = ev(
      // u1 completes all three in order
      ("u1", "view", "2024-01-01T00:00:00Z"),
      ("u1", "click", "2024-01-01T00:01:00Z"),
      ("u1", "purchase", "2024-01-01T00:02:00Z"),
      // u2 clicked BEFORE viewing — click doesn't count; no purchase
      ("u2", "click", "2024-01-01T00:00:00Z"),
      ("u2", "view", "2024-01-01T00:01:00Z"),
      // u3 views only
      ("u3", "view", "2024-01-01T00:00:00Z"),
      // u4 never views (purchase alone doesn't enter the funnel)
      ("u4", "purchase", "2024-01-01T00:00:00Z"))
    val got = Funnel.counts(df, "user", "etype", "at", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("funnel: equal timestamps do not advance the funnel; later occurrences do") {
    val df = ev(
      // click at the same instant as view → not strictly after; the later
      // click advances the funnel instead
      ("u1", "view", "2024-01-01T00:00:00Z"),
      ("u1", "click", "2024-01-01T00:00:00Z"),
      ("u1", "click", "2024-01-01T00:05:00Z"),
      // u2's only click ties its view → stuck at step 1
      ("u2", "view", "2024-01-01T00:00:00Z"),
      ("u2", "click", "2024-01-01T00:00:00Z"))
    val t = Funnel.stepTimes(df, "user", "etype", "at", Seq("view", "click"))
      .collect().map(r => (r.getString(0), Option(r.getTimestamp(2)))).toMap
    assert(t("u1").contains(ts("2024-01-01T00:05:00Z")))
    assert(t("u2").isEmpty)
  }

  test("funnel: counts equal a sequential per-user replay on random event streams") {
    val rnd = new scala.util.Random(17)
    val types = Seq("view", "click", "purchase", "error")
    val rows = (1 to 400).map { i =>
      (s"u${rnd.nextInt(25)}", types(rnd.nextInt(types.size)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + rnd.nextInt(100000))),
        i.toLong)
    }
    val steps = Seq("view", "click", "purchase")
    // driver-side oracle: literal definition, min event strictly after prev
    val expect = Array.fill(3)(0L)
    rows.groupBy(_._1).foreach { case (_, es) =>
      var prev: Option[java.sql.Timestamp] = None
      var alive = true
      steps.zipWithIndex.foreach { case (st, i) =>
        if (alive) {
          val cand = es.filter(e => e._2 == st &&
            (i == 0 || e._3.after(prev.get))).map(_._3)
          if (cand.nonEmpty) { prev = Some(cand.min); expect(i) += 1 }
          else alive = false
        }
      }
    }
    val got = Funnel.counts(rows.toDF("user", "etype", "at", "eid"),
      "user", "etype", "at", steps)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).map(_._2)
    assert(got.toSeq == expect.toSeq)
  }

  // -------------------------------------------------------------- debounce

  test("debounce keeps the first of each burst (lag semantics)") {
    val df = ev(
      ("u1", "click", "2024-01-01T00:00:00Z"),  // keep
      ("u1", "click", "2024-01-01T00:00:30Z"),  // 30s after prev → drop
      ("u1", "click", "2024-01-01T00:00:50Z"),  // 20s after prev (dropped) → drop
      ("u1", "click", "2024-01-01T00:02:00Z"),  // 70s after prev → keep
      ("u2", "click", "2024-01-01T00:00:10Z"))  // other key → keep
    val got = TimeSeries.debounce(df, Seq("user", "etype"), "at", 60000L, Seq("eid"))
      .select("eid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(0L, 3L, 4L))
  }

  test("debounce with zero gap keeps everything; equal timestamps keep tiebreak-first only for positive gap") {
    val df = ev(
      ("u1", "view", "2024-01-01T00:00:00Z"),
      ("u1", "view", "2024-01-01T00:00:00Z"))
    assert(TimeSeries.debounce(df, Seq("user"), "at", 0L, Seq("eid")).count() == 2L)
    val kept = TimeSeries.debounce(df, Seq("user"), "at", 1L, Seq("eid"))
      .select("eid").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(0L))
  }
}

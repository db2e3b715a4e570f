package graft

import org.apache.spark.sql.functions._
import graft.ops.{IntervalJoin, Scd, Sessionize}

/** Temporal operators added in round 3: SCD2 history build, native
  * session_window aggregation, bucketized interval join.
  */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  // ---------------------------------------------------------------- SCD2

  private def scdRows(rows: Seq[(String, String, String)]) = {
    val df = rows.zipWithIndex
      .map { case ((k, t0, a), i) => (k, ts(t0), a, i.toLong) }
      .toDF("k", "t", "attr", "seq")
    Scd.history(df, "k", "t", Seq("attr"), Seq("seq"))
      .select("k", "t", "attr", "valid_to", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
      .sortBy(x => (x._1, x._2.getTime))
  }

  test("scd2: consecutive duplicates collapse; intervals chain; last is current") {
    val got = scdRows(Seq(
      ("k1", "2024-01-01T00:00:00Z", "a"),
      ("k1", "2024-01-02T00:00:00Z", "a"), // same state — collapsed
      ("k1", "2024-01-03T00:00:00Z", "b"),
      ("k1", "2024-01-04T00:00:00Z", "a")))
    assert(got.map(x => (x._3, x._4.map(_.toInstant.toString), x._5)).toSeq == Seq(
      ("a", Some("2024-01-03T00:00:00Z"), false),
      ("b", Some("2024-01-04T00:00:00Z"), false),
      ("a", None, true)))
  }

  test("scd2: null attribute is a state; null→value and value→null are changes") {
    val got = scdRows(Seq(
      ("k1", "2024-01-01T00:00:00Z", null),
      ("k1", "2024-01-02T00:00:00Z", null), // collapsed into the null state
      ("k1", "2024-01-03T00:00:00Z", "x"),
      ("k1", "2024-01-04T00:00:00Z", null)))
    assert(got.map(x => Option(x._3)).toSeq == Seq(None, Some("x"), None))
    assert(got.count(_._5) == 1)
  }

  test("scd2: keys are independent; single-row key is current with open interval") {
    val got = scdRows(Seq(
      ("k1", "2024-01-01T00:00:00Z", "a"),
      ("k2", "2024-01-05T00:00:00Z", "z")))
    assert(got.forall(x => x._4.isEmpty && x._5))
  }

  // ---------------------------------------------- session_window batch agg

  test("session windows: gap merge, close at last+gap, per-key isolation") {
    val df = Seq(
      ("u1", "2024-01-01T00:00:00Z"),
      ("u1", "2024-01-01T00:05:00Z"),  // < 10 min after prev — same session
      ("u1", "2024-01-01T00:20:00Z"),  // ≥ 10 min gap — new session
      ("u2", "2024-01-01T00:06:00Z"))  // other key — own session
      .map { case (u, t0) => (u, ts(t0)) }.toDF("user", "t")
    val got = Sessionize.sessionWindows(df, "user", "t", "10 minutes")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant.toString,
        r.getTimestamp(2).toInstant.toString, r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      ("u1", "2024-01-01T00:00:00Z", "2024-01-01T00:15:00Z", 2L),
      ("u1", "2024-01-01T00:20:00Z", "2024-01-01T00:30:00Z", 1L),
      ("u2", "2024-01-01T00:06:00Z", "2024-01-01T00:16:00Z", 1L)))
  }

  test("session windows: event exactly at prev+gap MERGES (inclusive close); 1µs past splits") {
    // Pins the engine's boundary semantics the q66 oracle must replay:
    // sessions merge while ts <= prev + gap, split strictly after.
    val touching = Seq(("u", ts("2024-01-01T00:00:00Z")), ("u", ts("2024-01-01T00:10:00Z")))
      .toDF("user", "t")
    assert(Sessionize.sessionWindows(touching, "user", "t", "10 minutes").count() == 1)
    val past = Seq(("u", ts("2024-01-01T00:00:00Z")),
      ("u", java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:10:00Z").plusMillis(1))))
      .toDF("user", "t")
    assert(Sessionize.sessionWindows(past, "user", "t", "10 minutes").count() == 2)
  }

  // ------------------------------------------------------- interval join

  test("interval join: inclusive start, exclusive end, bucket-straddling intervals") {
    val iv = Seq(
      (1L, "2024-01-01T00:00:00Z", "2024-01-01T02:00:00Z"),  // spans 2 one-hour buckets
      (2L, "2024-01-01T01:30:00Z", "2024-01-01T02:30:00Z"))  // straddles a grid line
      .map { case (id, s, e) => (id, ts(s), ts(e)) }.toDF("iv_id", "s", "e")
    val pts = Seq(
      "2024-01-01T00:00:00Z",  // == start of 1 → inclusive
      "2024-01-01T01:45:00Z",  // in both
      "2024-01-01T02:00:00Z",  // == end of 1 (excluded), inside 2
      "2024-01-01T03:00:00Z")  // in neither
      .map(t0 => Tuple1(ts(t0))).toDF("p")
    val got = IntervalJoin.pointsInIntervals(iv, "s", "e", pts, "p", 3600L)
      .select("iv_id", "p").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString)).sorted
    assert(got.toSeq == Seq(
      (1L, "2024-01-01T00:00:00Z"),
      (1L, "2024-01-01T01:45:00Z"),
      (2L, "2024-01-01T01:45:00Z"),
      (2L, "2024-01-01T02:00:00Z")))
  }

  test("interval join: agrees with the naive inequality join on random data") {
    val rnd = new scala.util.Random(7)
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val iv = (1 to 60).map { i =>
      val s = base.plusSeconds(rnd.nextInt(100000).toLong)
      (i.toLong, java.sql.Timestamp.from(s),
        java.sql.Timestamp.from(s.plusSeconds(1 + rnd.nextInt(5000).toLong)))
    }.toDF("iv_id", "s", "e")
    val pts = (1 to 300).map { i =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(rnd.nextInt(110000).toLong)))
    }.toDF("p_id", "p")
    val bucketized = IntervalJoin.pointsInIntervals(iv, "s", "e", pts, "p", 1800L)
      .select("iv_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = pts.join(iv, col("p") >= col("s") && col("p") < col("e"))
      .select("iv_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(bucketized.toSeq == naive.toSeq && bucketized.nonEmpty)
    // exactly-once: no (interval, point) pair duplicated by the fan-out
    assert(bucketized.distinct.length == bucketized.length)
  }
}

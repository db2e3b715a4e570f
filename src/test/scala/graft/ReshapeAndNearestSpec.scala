package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Normalize, Reshape, TimeSeries}

/** Round-3 additions: melt, time-weighted average, dictionary encoding,
  * nearest-event join.
  */
class ReshapeAndNearestSpec extends SparkSpec {
  import spark.implicits._

  test("melt turns k measure columns into k labelled rows per input row") {
    val df = Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "a", "b")
    val got = Reshape.melt(df, Seq("id"), Seq("a", "b"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L), (2L, "b", 40L)))
    // map-only: no exchange in the plan
    val plan = Reshape.melt(df, Seq("id"), Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("timeWeighted weights each value by its holding interval") {
    // value 10 holds 0→100ms, 30 holds 100→300ms, last point unweighted
    val df = Seq(("k", 0L, 10L), ("k", 100L, 30L), ("k", 300L, 99L)).toDF("k", "ms", "v")
    val r = TimeSeries.timeWeighted(df, Seq("k"), "ms", "v").head()
    assert(r.getAs[Long]("weighted_sum") == 10 * 100 + 30 * 200)
    assert(r.getAs[Long]("total_ms") == 300)
    assert(r.getAs[Double]("twa") == (10 * 100 + 30 * 200).toDouble / 300)
    // a key with a single observation has no interval → no output row
    val single = TimeSeries.timeWeighted(Seq(("s", 5L, 7L)).toDF("k", "ms", "v"),
      Seq("k"), "ms", "v")
    assert(single.isEmpty)
  }

  test("dictEncode assigns dense sort-order codes via broadcast") {
    val df = Seq((1L, "fr"), (2L, "de"), (3L, "fr"), (4L, "en")).toDF("id", "lang")
    val got = Normalize.dictEncode(df, "lang", "lang_code")
      .select("id", "lang_code").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 3L, 4L -> 2L)) // de=1, en=2, fr=3
    val plan = Normalize.dictEncode(df, "lang").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"), plan)
  }

  test("nearest picks the closer side, backward on ties, and handles edges") {
    val probe = Seq(("u", 1L, 100L), ("u", 2L, 5L), ("u", 3L, 1000L))
      .toDF("k", "pid", "pms")
    val build = Seq(("u", 10L, 90L), ("u", 11L, 104L), ("u", 12L, 200L))
      .toDF("k", "bid", "bms")
    val got = AsOfJoin.nearest(probe, build, "k", "pms", "bms", Seq("bid"),
        inner = true, tieBreak = Seq("bid"))
      .select("pid", "bid", "nearest_dist").as[(Long, Long, Long)].collect().toSet
    // pid 1 at 100: backward 90 (d=10) vs forward 104 (d=4) → forward
    // pid 2 at 5: nothing before → forward 90 (d=85)
    // pid 3 at 1000: nothing after → backward 200 (d=800)
    assert(got == Set((1L, 11L, 4L), (2L, 10L, 85L), (3L, 12L, 800L)))
    // exact tie in distance prefers the backward match
    val tied = AsOfJoin.nearest(
      Seq(("u", 1L, 100L)).toDF("k", "pid", "pms"),
      Seq(("u", 20L, 95L), ("u", 21L, 105L)).toDF("k", "bid", "bms"),
      "k", "pms", "bms", Seq("bid"), inner = true, tieBreak = Seq("bid"))
      .select("bid").as[Long].head()
    assert(tied == 20L)
    // equal timestamp is a distance-0 backward match
    val eq = AsOfJoin.nearest(
      Seq(("u", 1L, 100L)).toDF("k", "pid", "pms"),
      Seq(("u", 30L, 100L)).toDF("k", "bid", "bms"),
      "k", "pms", "bms", Seq("bid"), inner = true, tieBreak = Seq("bid"))
      .select("bid", "nearest_dist").as[(Long, Long)].head()
    assert(eq == ((30L, 0L)))
  }
}

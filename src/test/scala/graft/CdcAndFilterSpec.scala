package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cdc, RuntimeFilter}

/** CDC changelog apply + bloom-filter runtime filter (round 3). */
class CdcAndFilterSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ CDC

  private val base = Seq(
    (1L, "a", 10L),
    (2L, "b", 20L),
    (3L, "c", 30L)).toDF("k", "name", "v")

  test("cdc: last change per key wins; deletes drop; inserts appear; untouched pass through") {
    val changes = Seq(
      // k=1: update then delete → dropped
      (1L, 1L, "U", "a2", 11L),
      (1L, 2L, "D", "xx", 0L),
      // k=2: delete then resurrect → upserted with latest values
      (2L, 3L, "D", "xx", 0L),
      (2L, 4L, "U", "b2", 22L),
      // k=9: insert-only key
      (9L, 5L, "U", "new", 99L)).toDF("k", "seq", "op", "name", "v")
    val got = Cdc.applyChangelog(base, changes, "k", "seq", "op", Seq("name", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, "b2", 22L, 2L),  // resurrected, 2 changes
      (3L, "c", 30L, 0L),   // untouched base row
      (9L, "new", 99L, 1L)))
  }

  test("cdc: an upsert may SET a value to null — it must not resurrect the base value") {
    val changes = Seq((1L, 1L, "U", Option.empty[String], Option(11L)))
      .toDF("k", "seq", "op", "name", "v")
    val got = Cdc.applyChangelog(base, changes, "k", "seq", "op", Seq("name", "v"))
      .where(col("k") === 1L).head()
    assert(got.isNullAt(1) && got.getLong(2) == 11L && got.getLong(3) == 1L)
  }

  test("cdc: empty changelog returns the base unchanged (n_changes = 0)") {
    val changes = Seq.empty[(Long, Long, String, String, Long)].toDF("k", "seq", "op", "name", "v")
    val got = Cdc.applyChangelog(base, changes, "k", "seq", "op", Seq("name", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 10L, 0L), (2L, "b", 20L, 0L), (3L, "c", 30L, 0L)))
  }

  test("cdc: result equals replaying the log sequentially on random inputs") {
    val rnd = new scala.util.Random(7)
    val keys = (0L until 40L)
    val baseRows = keys.filter(_ % 3 != 0).map(k => (k, s"n$k", k * 2))
    val log = (0 until 300).map { i =>
      val k = keys(rnd.nextInt(keys.size))
      val op = if (rnd.nextInt(5) == 0) "D" else "U"
      (k, i.toLong, op, s"u$i", i.toLong)
    }
    // Sequential replay oracle (driver-side reference implementation).
    var state = baseRows.map(r => r._1 -> (r._2, r._3)).toMap
    var touched = Map.empty[Long, Long].withDefaultValue(0L)
    log.sortBy(_._2).foreach { case (k, _, op, n, v) =>
      touched += k -> (touched(k) + 1)
      state = if (op == "D") state - k else state + (k -> (n, v))
    }
    val expect = state.toSeq
      .map { case (k, (n, v)) => (k, n, v, touched(k)) }.sortBy(_._1)

    val got = Cdc.applyChangelog(
      baseRows.toDF("k", "name", "v"), log.toDF("k", "seq", "op", "name", "v"),
      "k", "seq", "op", Seq("name", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == expect)
  }

  // --------------------------------------------------- bloom runtime filter

  test("bloom semi-join returns exactly the plain semi-join result") {
    val fact = (0L until 2000L).map(i => (i, i % 97)).toDF("id", "fk")
    val dim = Seq(3L, 5L, 11L, 96L).toDF("dk")
    val got = RuntimeFilter.bloomSemiJoin(fact, dim, "fk", "dk", expectedItems = 16)
      .select("id", "fk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expect = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == expect.toSeq && got.nonEmpty)
  }

  test("bloom semi-join with empty dim returns nothing") {
    val fact = (0L until 50L).map(i => (i, i)).toDF("id", "fk")
    val dim = Seq.empty[Long].toDF("dk")
    assert(RuntimeFilter.bloomSemiJoin(fact, dim, "fk", "dk", expectedItems = 4).count() == 0L)
  }
}

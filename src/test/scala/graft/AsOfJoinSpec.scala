package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.lit

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (key, t, px); trades: (key, t, qty)
  private lazy val quotes =
    Seq(("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0), ("b", 15L, 9.0))
      .toDF("sym", "q_t", "px")
  private lazy val trades =
    Seq(("a", 5L, 100L), ("a", 20L, 200L), ("a", 25L, 300L), ("b", 14L, 400L), ("c", 50L, 500L))
      .toDF("sym", "t", "qty")

  test("backward: latest quote at-or-before each trade, inner") {
    val out = AsOfJoin.backward(trades, quotes, "sym", "t", "q_t", Seq("q_t", "px"))
      .orderBy("sym", "t").collect()
    // a@5: no quote <= 5 → dropped; a@20: equal ts included → px=2; a@25 → px=2; b@14: none → dropped
    assert(out.toSeq === Seq(Row("a", 20L, 200L, 20L, 2.0), Row("a", 25L, 300L, 20L, 2.0)))
  }

  test("backward outer keeps unmatched probes with null payload") {
    val out = AsOfJoin.backward(trades, quotes, "sym", "t", "q_t", Seq("px"), inner = false)
      .orderBy("sym", "t").collect()
    assert(out.length === 5)
    assert(out.map(r => (r.getString(0), r.getLong(1), Option(r.get(3)))).toSeq === Seq(
      ("a", 5L, None), ("a", 20L, Some(2.0)), ("a", 25L, Some(2.0)),
      ("b", 14L, None), ("c", 50L, None)))
  }

  test("forward: earliest quote at-or-after each trade") {
    val out = AsOfJoin.forward(trades, quotes, "sym", "t", "q_t", Seq("px"))
      .orderBy("sym", "t").collect()
    // a@5→px1, a@20→px2 (equal), a@25→px3, b@14→px9; c unmatched
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq === Seq(
      ("a", 5L, 1.0), ("a", 20L, 2.0), ("a", 25L, 3.0), ("b", 14L, 9.0)))
  }

  test("equal-order build ties resolve by tieBreak (last wins backward)") {
    val q2 = Seq(("a", 10L, 1L, 1.0), ("a", 10L, 2L, 7.0)).toDF("sym", "q_t", "seq", "px")
    val tr = Seq(("a", 12L, 99L)).toDF("sym", "t", "qty")
    val back = AsOfJoin.backward(tr, q2, "sym", "t", "q_t", Seq("px"), tieBreak = Seq("seq")).collect()
    assert(back.head.getDouble(3) === 7.0)
    // forward scans descending, so "last" in scan order = smallest seq
    val fwd = AsOfJoin.forward(tr.select($"sym", lit(5L).as("t"), $"qty"), q2,
      "sym", "t", "q_t", Seq("px"), tieBreak = Seq("seq")).collect()
    assert(fwd.head.getDouble(3) === 1.0)
  }

  test("plan has a single shuffle") {
    val out = AsOfJoin.backward(trades, quotes, "sym", "t", "q_t", Seq("px"))
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, "as-of join must shuffle exactly once")
  }
}

package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows share one hot key — the shape salting exists for.
  private lazy val fact = (1 to 1000)
    .map(i => (if (i <= 900) 1L else i.toLong, i))
    .toDF("k", "payload")
  private lazy val dim = Seq((1L, "hot"), (950L, "cold"), (999L, "cold"))
    .toDF("dk", "name")

  test("salted join returns exactly the plain inner-join result") {
    val plain = fact.join(dim, $"k" === $"dk").select("k", "payload", "name")
    val salted = SkewJoin.salted(fact, dim, "k", "dk").select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot key spreads across multiple salt sub-keys") {
    val nSalts = 8
    val spread = fact.where($"k" === 1L)
      .withColumn("__salt", pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
      .select("__salt").distinct().count()
    assert(spread > 1, s"expected the hot key to hash to >1 salt bucket, got $spread")
  }

  test("Correlate.skewSafe: 1000:1 hot traceId keeps exact results with a salted plan") {
    // The reference's flagship J4 correlate under its classic failure
    // mode: one pathological client emits 1000 events on ONE traceId
    // (identical rows — the worst case for any row-hash salt that
    // excludes a unique column), one event each on 10 other traces.
    val events = ((1 to 1000).map(_ => ("c_hot", "t_hot")) ++
      (1 to 10).map(i => (s"c$i", s"t$i"))).toDF("clientId", "traceId")
    val traces = (Seq("t_hot") ++ (1 to 10).map(i => s"t$i"))
      .map(t => (t, Seq(s"${t}_s1", s"${t}_s2")))
      .toDF("traceId", "spanIds")
      .select($"traceId", transform($"spanIds", x => struct(x.as("spanId"))).as("spans"))
    val logs = (Seq("t_hot") ++ (1 to 10).map(i => s"t$i"))
      .flatMap(t => Seq((s"${t}_s1", "log_a"), (s"${t}_s2", "log_b")))
      .toDF("spanId", "eventType")

    // Schema contract first: same columns in the same ORDER (positional
    // consumers like union/typed-as must be swappable between the paths).
    assert(graft.ops.Correlate.skewSafe(events, traces, logs).columns.toSeq ==
      graft.ops.Correlate(events, traces, logs).columns.toSeq)
    val cols = Seq("clientId", "traceId", "spanId", "logEventType")
    val plain = graft.ops.Correlate(events, traces, logs).select(cols.map(col): _*)
    val salted = graft.ops.Correlate.skewSafe(events, traces, logs).select(cols.map(col): _*)
    // Result contract: exactly the plain inner-join multiset.
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // Plan contract: the trace join runs on (key, salt) as a shuffled-hash
    // join — the salted fallback shape, not a single-reducer sort-merge.
    val plan = graft.ops.Correlate.skewSafe(events, traces, logs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffled-hash trace join:\n$plan")
    assert(plan.contains("__salt"), s"expected the salt in the join keys:\n$plan")

    // Skew contract: the hot trace's 1000 identical rows actually spread
    // over >1 salt bucket (per-row salt, not row-hash).
    val spread = events.where($"traceId" === "t_hot")
      .withColumn("__row", monotonically_increasing_id())
      .withColumn("__salt", pmod(xxhash64($"__row"), lit(8)))
      .select("__salt").distinct().count()
    assert(spread > 1, s"hot key stayed on $spread salt bucket(s)")
  }

  test("approx_count_distinct stays within its 5% relative-error spec") {
    val df = (1 to 20000).map(i => i % 5000).toDF("v")
      .agg(approx_count_distinct($"v").as("approx"), count_distinct($"v").as("exact"))
      .head()
    val (approx, exact) = (df.getLong(0), df.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.ops.{Components, GraphMetrics, Ngrams, PageRank}

/** The `reliable` staging switch ([[graft.ops.Staging]]) must be
  * behavior-neutral: every iterative op threaded through it has to
  * produce BIT-IDENTICAL results on both postures (localCheckpoint vs
  * lineage-keeping persist), because the switch changes only fault
  * tolerance, never semantics. One parity test per threaded op; KMeans
  * and neighborhoodSize have theirs in their own suites.
  */
class ReliableStagingSpec extends SparkSpec {
  import spark.implicits._

  private val edges =
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("a_id", "b_id")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("PageRank.ranksFixedPoint: reliable=true matches the localCheckpoint path") {
    def run(reliable: Boolean) = sortedRows(
      PageRank.ranksFixedPoint(edges, "a_id", "b_id", iterations = 6, reliable = reliable))
    assert(run(reliable = true) == run(reliable = false))
  }

  test("PageRank.personalizedFixedPoint: reliable=true matches the localCheckpoint path") {
    val seeds = Seq(1L).toDF("id")
    def run(reliable: Boolean) = sortedRows(
      PageRank.personalizedFixedPoint(edges, "a_id", "b_id", seeds, "id",
        iterations = 6, reliable = reliable))
    assert(run(reliable = true) == run(reliable = false))
  }

  test("Components.connectedComponents: reliable=true matches the localCheckpoint path") {
    def run(reliable: Boolean) = sortedRows(
      Components.connectedComponents(edges, reliable = reliable))
    val got = run(reliable = true)
    assert(got == run(reliable = false))
    // sanity: two components, rooted at their minima
    assert(got.size == 8)
  }

  test("Ngrams.bpeMerges: reliable=true matches the localCheckpoint path") {
    val docs = Seq("low low low lower lowest", "new newer newest low").toDF("text")
    def run(reliable: Boolean) = sortedRows(
      Ngrams.bpeMerges(docs, rounds = 9, reliable = reliable))
    assert(run(reliable = true) == run(reliable = false))
  }

  test("GraphMetrics.labelPropagation: reliable=true matches the localCheckpoint path") {
    def run(reliable: Boolean) = sortedRows(
      GraphMetrics.labelPropagation(edges, rounds = 5, reliable = reliable))
    assert(run(reliable = true) == run(reliable = false))
  }

  test("GraphMetrics.kCore: reliable=true matches the localCheckpoint path") {
    def run(reliable: Boolean) = sortedRows(
      GraphMetrics.kCore(edges, k = 2, reliable = reliable))
    val got = run(reliable = true)
    assert(got == run(reliable = false))
    assert(got.nonEmpty) // the two triangles survive k=2
  }

  // Registration order matters for the two pin tests: the shared
  // SparkContext keeps its checkpoint dir once set, so the no-dir guard
  // must run BEFORE the test that sets one.
  test("reliablePin without a checkpoint dir fails fast with instructions") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "another suite already set a checkpoint dir on the shared context")
    spark.conf.set("spark.graft.reliablePin", "true")
    val df = Seq(1L, 2L).toDF("v")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.ops.Normalize.denseIds(df, "v", "v", "rk").collect()
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset("spark.graft.reliablePin")
  }

  test("denseIds: spark.graft.reliablePin=true (real checkpoint) matches the default path") {
    val df = (0 until 500).map(i => ((i * 37) % 500).toLong).toDF("v")
    def run(): Seq[String] = sortedRows(graft.ops.Normalize.denseIds(df, "v", "v", "rk"))
    val base = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.reliablePin", "true")
    try assert(run() == base)
    finally spark.conf.unset("spark.graft.reliablePin")
  }

  test("reliable + reliablePin escalates loops to real checkpoints (truncated plan, same results)") {
    // Self-sufficient: set a checkpoint dir if no earlier test has (the
    // shared context keeps it either way) — this test must never cancel
    // itself away, it is the only coverage of the escalated stage() path.
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt-esc").toString)
    spark.conf.set("spark.graft.reliablePin", "true")
    try {
      val pr = sortedRows(
        PageRank.ranksFixedPoint(edges, "a_id", "b_id", iterations = 6, reliable = true))
      assert(pr == sortedRows(
        PageRank.ranksFixedPoint(edges, "a_id", "b_id", iterations = 6, reliable = false)))
      val cc = sortedRows(Components.connectedComponents(edges, reliable = true))
      assert(cc == sortedRows(Components.connectedComponents(edges, reliable = false)))
    } finally spark.conf.unset("spark.graft.reliablePin")
  }

  test("staged-leaf statistics stay capped across self-joining rounds (no compounding)") {
    // Regression pin for the round-10 planner blowup: checkpoint APIs
    // preserve origin stats, and a loop whose rounds self-join staged
    // frames multiplies them — sizeInBytes bit-length grew ~65x PER
    // ROUND (43 → 10k → 697k → 45M bits by Borůvka round 3 at sf0.1)
    // until the driver spent seconds per planning pass in
    // BigInteger.divide. The staged leaf caps the estimate at 2^50, so
    // after ANY number of rounds the staged frame's stats must stay
    // within the cap (plus nothing: the leaf reports the capped origin
    // directly), and a 3-deep self-join chain over it stays small.
    def selfJoinRound(df: DataFrame): DataFrame = {
      val j = df.alias("a").join(df.alias("b"), col("a.p") === col("b.comp"))
        .select(col("a.comp").as("comp"), col("b.p").as("p"))
      j.alias("a").join(j.alias("b"), col("a.p") === col("b.comp"))
        .select(col("a.comp").as("comp"), col("b.p").as("p"))
    }
    var cur = graft.ops.Staging.stage(
      Seq((1L, 2L), (2L, 3L), (3L, 3L)).toDF("comp", "p"), reliable = false)
    for (_ <- 1 to 4) cur = graft.ops.Staging.stage(selfJoinRound(cur), reliable = false)
    val bits = cur.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits <= 51, s"staged-leaf stats compounding again: $bits bits after 4 rounds")
    // and the reliable posture's leaf obeys the same cap
    val rel = graft.ops.Staging.stage(selfJoinRound(cur), reliable = true)
    val relBits = rel.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    rel.unpersist()
    assert(relBits <= 51, s"reliable staged-leaf stats uncapped: $relBits bits")
  }
}

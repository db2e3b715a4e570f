package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — turning a token-counted document corpus into the
  * fixed-size training windows an LLM pretraining run actually consumes.
  * Two standard disciplines, both exact and deterministic:
  *
  *  - [[concatChunk]]: the GPT-style concatenate-and-chunk. Documents are
  *    laid end-to-end in doc-id order and the stream is sliced every
  *    `windowSize` tokens; documents SPAN window boundaries (no padding,
  *    every window exactly full except the last).
  *  - [[nextFitWindows]]: boundary-respecting greedy fill. A window
  *    accumulates whole documents in doc-id order and closes when the
  *    next one would not fit — no document is ever split (the discipline
  *    for SFT/eval sets where truncated examples are corrupted labels),
  *    at the price of per-window padding waste.
  *
  * Both are driven by ONE global token prefix-sum
  * ([[Normalize.rankedPrefixSum]] — range-partitioned two-phase, no
  * single-partition window). concatChunk is map-only arithmetic after
  * it. nextFit's window boundaries are the orbit of 0 under the jump
  * function `jump(i) = max j : S_j ≤ S_i + C` (S = prefix sums, C =
  * capacity): sequential greedy filling is a chain recurrence, but the
  * orbit of a monotone jump is computable in O(log #windows) rounds of
  * pointer DOUBLING (square the jump map, extend the orbit — the
  * [[SpanningForest]] contraction pattern), and the jump function itself
  * is a bucketed as-of join: with every document ≤ C tokens (enforced),
  * the answer lies within 2 capacity-width buckets of the probe, so
  * [[AsOfJoin.backward]] runs keyed on `cum div C` — never a global
  * window, never a range join.
  *
  * Both packers order the stream by `idCol`, which must therefore be
  * UNIQUE (the [[Normalize.denseIds]] total-order contract: duplicate
  * ids straddling a sampled range boundary could swap ranks between
  * runs).
  */
object SequencePack {

  /** One row per (window, document) span: `offset_in_window` is where the
    * document's tokens start inside the window, `n_in_window` how many
    * land there, `is_head`/`is_tail` whether the span carries the
    * document's first/last token (a document fully inside one window is
    * both). Window `w` covers token offsets `[w·windowSize,
    * (w+1)·windowSize)` of the concatenated stream; every window is
    * exactly full except the last. Zero-token documents contribute
    * nothing and are absent. Output size is Σ ceil spans — a document of
    * n tokens appears in at most `n div windowSize + 2` windows.
    */
  def concatChunk(
      docs: DataFrame,
      windowSize: Long,
      idCol: String = "doc_id",
      nCol: String = "n_tokens"): DataFrame = {
    require(windowSize >= 1, s"windowSize must be >= 1: $windowSize")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(nCol).cast("long").as("n")).where(col("n") > 0)
    val ranked = Normalize.rankedPrefixSum(
      base, Seq(col("doc_id")), "n", "__rk", "__cum")
    val w = lit(windowSize)
    ranked
      .withColumn("__start", col("__cum") - col("n"))
      .select(col("doc_id"), col("n"), col("__start"),
        explode(sequence(expr(s"__start div ${windowSize}L"),
          expr(s"(__cum - 1L) div ${windowSize}L"))).as("window_id"))
      .select(col("window_id"), col("doc_id"),
        (greatest(col("window_id") * w, col("__start")) - col("window_id") * w)
          .as("offset_in_window"),
        (least((col("window_id") + 1L) * w, col("__start") + col("n"))
          - greatest(col("window_id") * w, col("__start"))).as("n_in_window"),
        (col("__start") >= col("window_id") * w).as("is_head"),
        (col("__start") + col("n") <= (col("window_id") + 1L) * w).as("is_tail"))
  }

  /** Next-fit whole-document packing: `(doc_id, window_id, n_tokens)` with
    * windows numbered 0.. in stream order. Exact sequential-greedy
    * semantics — window w closes before the first document that would
    * push its fill past `capacity` — computed without any sequential
    * scan (see the object doc for the jump-orbit construction).
    *
    * Every document must have 1..capacity tokens: an oversized document
    * can never close (pre-split it with [[concatChunk]] or truncate with
    * [[Chunking.truncateTokens]] — which one is a data decision the
    * caller owns); zero-token documents are absent from the output.
    */
  def nextFitWindows(
      docs: DataFrame,
      capacity: Long,
      idCol: String = "doc_id",
      nCol: String = "n_tokens",
      reliable: Boolean = false): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1: $capacity")
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(nCol).cast("long").as("n")).where(col("n") > 0)
    // bounded driver fetch (≤ 1 row): the n ≤ capacity contract is what
    // makes the 2-bucket as-of exact — violating it silently would
    // mis-assign every later window, so fail loudly with the culprit
    val oversized = base.where(col("n") > capacity).limit(1).collect()
    require(oversized.isEmpty,
      s"doc ${oversized.headOption.map(_.getLong(0)).getOrElse(-1L)} has " +
        s"${oversized.headOption.map(_.getLong(1)).getOrElse(-1L)} tokens > capacity $capacity — " +
        "pre-split with concatChunk or truncate with Chunking.truncateTokens")
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val ranked = Staging.stage(Normalize.rankedPrefixSum(
      base, Seq(col("doc_id")), "n", "__rk", "__cum"), reliable)
    frames += ranked
    // prefix-sum sequence with the S_0 = 0 sentinel (the stream start is
    // itself a window boundary)
    val builds = Staging.stage(ranked.select(col("__rk").as("rk"), col("__cum").as("cum"))
      .unionByName(spark.range(1).select(lit(0L).as("rk"), lit(0L).as("cum"))),
      reliable)
    frames += builds
    // jump(i) = max j with S_j ≤ S_i + C. Because consecutive prefix
    // sums differ by ≤ C (the enforced doc-size bound), the answer's cum
    // lies in [S_i, S_i + C] — within the probe's capacity-bucket or the
    // one below — so TWO bucketed as-of probes cover it exactly.
    val probes = builds
      .select(col("rk").as("i"), (col("cum") + capacity).as("t"))
      .withColumn("__bkt", explode(array(
        expr(s"t div ${capacity}L"), expr(s"t div ${capacity}L - 1L"))))
    val buildSide = builds.select(col("rk").as("jmp"), col("cum"),
      expr(s"cum div ${capacity}L").as("__bkt"))
    // j > i filters the terminal self-loop (jump(N) = N): the orbit walk
    // below must STOP at the stream end, not spin on it
    val jump1 = Staging.stage(
      AsOfJoin.backward(probes, buildSide, key = "__bkt",
        probeOrder = "t", buildOrder = "cum", valueCols = Seq("jmp"), inner = false)
        .groupBy(col("i")).agg(max(col("jmp")).as("j"))
        .where(col("j") > col("i")),
      reliable)
    frames += jump1
    // orbit of 0 under jump, by BATCHED pointer doubling (the
    // [[SpanningForest]] probe pattern): with the orbit covering the
    // first M iterates and the map at J^M, one staged round extends by
    // J^M (→ 2M) and then by J^(2M) over the EXTENDED set (→ 4M,
    // contiguous — applying J^(2M) to the unextended orbit would skip
    // iterates [2M−1] and leave boundary holes), while the map squares
    // twice lazily. Coverage quadruples per materialized round, so a
    // trillion windows need ~20 rounds of three fused jobs each.
    var orbit = Staging.stage(spark.range(1).select(lit(0L).as("b")), reliable)
    frames += orbit
    var jmap = jump1
    var nOrbit = orbit.count()
    var grew = true
    var rounds = 0
    while (grew) {
      rounds += 1
      require(rounds <= 32,
        "next-fit orbit did not settle in 32 quadrupling rounds — 4^32 windows " +
          "exceeds any real corpus; the jump map is inconsistent (data changed mid-job?)")
      val j2 = jmap.alias("a").join(jmap.alias("b"), col("a.j") === col("b.i"))
        .select(col("a.i").as("i"), col("b.j").as("j"))
      val e1 = orbit.join(jmap, col("b") === col("i")).select(col("j").as("b"))
      val o1 = orbit.unionByName(e1)
      val e2 = o1.join(j2, col("b") === col("i")).select(col("j").as("b"))
      val grown = Staging.stage(o1.unionByName(e2).distinct(), reliable)
      frames += grown
      val cnt = grown.count()
      grew = cnt > nOrbit
      nOrbit = cnt
      orbit = grown
      if (grew) {
        val j4 = Staging.stage(j2.alias("a").join(j2.alias("b"), col("a.j") === col("b.i"))
          .select(col("a.i").as("i"), col("b.j").as("j")), reliable)
        frames += j4
        jmap = j4
      }
    }
    // every orbit point except the terminal one (the only index with no
    // jump1 row) OPENS a window; number them 0.. in stream order
    val starts = orbit.join(jump1.select(col("i")), col("b") === col("i"), "left_semi")
      .join(builds, col("b") === col("rk")).select(col("b"), col("cum"))
    val windows = Staging.stage(
      Normalize.denseIds(starts, "cum", "b", "__wid"), reliable)
    frames += windows
    // assignment, again a 2-bucket as-of but in TOKEN space: a doc
    // belongs to the window of the last boundary strictly before its
    // cum, and window fill ≤ C bounds that gap at one capacity width
    val docProbes = ranked
      .select(col("doc_id"), col("n"), (col("__cum") - 1L).as("t"))
      .withColumn("__bkt", explode(array(
        expr(s"t div ${capacity}L"), expr(s"t div ${capacity}L - 1L"))))
    val bndSide = windows.select(col("__wid"), col("cum"),
      expr(s"cum div ${capacity}L").as("__bkt"))
    val out = Staging.stage(
      AsOfJoin.backward(docProbes, bndSide, key = "__bkt",
        probeOrder = "t", buildOrder = "cum", valueCols = Seq("__wid"), inner = false)
        .groupBy(col("doc_id"), col("n"))
        .agg(max(col("__wid")).as("window_id"))
        .select(col("doc_id"), col("window_id"), col("n").as("n_tokens")),
      reliable)
    if (reliable) {
      out.count()
      frames.foreach(_.unpersist())
    }
    out
  }
}

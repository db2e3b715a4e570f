package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ops.{Dedup, Sampling}

/** End-to-end training-corpus preparation: the composite pipeline a
  * 100 TB pretraining-data run actually executes, as one declarative
  * plan — exact dedup (keep-first), quality gate, token counting, and a
  * deterministic train/val/test split.
  *
  * Scale shape: the dedup aggregate shuffles only (16-byte digest, id)
  * pairs, never document bodies; the survivor set comes back as a
  * semi-join on `doc_id` (ids are unique, so no row multiplication);
  * everything downstream is per-row column math in one codegen stage.
  * Every step is hash-deterministic — rerunning on the same corpus
  * yields byte-identical splits, which is what makes ablations and
  * decontamination audits reproducible.
  */
object CorpusPrep {

  /** Deterministic split from the first byte of md5(id): 256 buckets →
    * ~80/10/10. Content-independent (id-based), so near-dup survivors of
    * the same document can't straddle train/test by textual accident.
    */
  def hashSplit(id: Column): Column = {
    val bucket = Sampling.idBucket(id)
    when(bucket < 204, lit("train")).when(bucket < 230, lit("val")).otherwise(lit("test"))
  }

  /** Pack documents into ~`budgetTokens`-token training shards: within
    * each (split, shard) group, docs are taken in deterministic doc_id
    * order and assigned `pack_id = ⌊exclusive-cumulative-tokens / budget⌋`
    * — contiguous greedy fill, the standard pretraining sequence-packing
    * shape. Returns per-doc assignments
    * (doc_id, tok, split, shard, pack_id).
    *
    * Scale shape: the only sort is *within* a (split, shard) window
    * partition — there is no global order. `nShards` bounds parallelism
    * and per-group size; raise it with the corpus (it only changes which
    * packs docs land in, never the determinism).
    */
  def packShards(docs: DataFrame, budgetTokens: Int = 2048, nShards: Int = 16): DataFrame =
    packedWithCum(docs, budgetTokens, nShards).drop("__cum")

  /** [[packShards]] plus the WITHIN-PACK token offset each document starts
    * at — `offset_tok = exclusive-cumulative-tokens − pack_id·budget` —
    * i.e. the position-id base the training loader needs to concatenate
    * pack members without re-tokenizing. Same windowing as packShards
    * (one within-(split, shard) sort, no global order).
    */
  def packOffsets(docs: DataFrame, budgetTokens: Int = 2048, nShards: Int = 16): DataFrame =
    packedWithCum(docs, budgetTokens, nShards)
      .withColumn("offset_tok",
        col("__cum") - col("tok") - col("pack_id") * budgetTokens)
      .drop("__cum")

  private def packedWithCum(docs: DataFrame, budgetTokens: Int, nShards: Int): DataFrame = {
    require(budgetTokens > 0 && nShards > 0, "budgetTokens and nShards must be positive")
    val w = Window.partitionBy(col("split"), col("shard")).orderBy(col("doc_id"))
    graft.io.Spread.toDefaultParallelism(docs)
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("tok"),
        hashSplit(col("doc_id")).as("split"),
        pmod(Sampling.idBucket(col("doc_id")), lit(nShards)).as("shard"))
      .withColumn("__cum", sum(col("tok")).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col("tok")).cast("double") / budgetTokens).cast("long"))
  }

  /** docs(doc_id, text, ...) → (doc_id, token_count, quality, split) for
    * the deduped, quality-gated corpus.
    */
  def prepare(docs: DataFrame, minQuality: Double = 0.75): DataFrame = {
    val spreadDocs = graft.io.Spread.toDefaultParallelism(docs)
    val keep = Dedup.exact(spreadDocs).select(col("keep_id").as("doc_id"))
    // Catalyst inlines the quality alias into a Filter it pushes all the
    // way to the scan — the gate then cuts rows before the dedup join and
    // the spread exchange, at the cost of re-evaluating quality in the
    // output projection for survivors (codegen CSE dedups within each
    // operator). Early row reduction wins at scale, so the pushdown is
    // left alone.
    spreadDocs.join(keep, Seq("doc_id"), "left_semi")
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .where(col("quality") >= minQuality)
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("token_count"),
        col("quality"),
        hashSplit(col("doc_id")).as("split"))
  }

  /** Deterministic multi-epoch shuffle schedule: every (epoch, doc) pair
    * gets its position in the global training order, where within each
    * epoch the docs are permuted by `md5(epoch ∥ ':' ∥ id)` — a fresh,
    * reproducible, data-independent order per epoch (the md5 re-keying is
    * the distributed stand-in for a seeded Fisher–Yates: uniform, stable
    * across runs and engines, and free of RNG state). Consumers stream
    * `schedule_pos` ascending: epochs come out in order, docs within an
    * epoch in their permuted order.
    *
    * Scale shape: the epoch fan-out is a map-only `explode` (E×N rows of
    * (id, epoch, hash) — never bodies), and positions come from
    * [[graft.ops.Normalize.denseIds]]'s range-partition + offset-table
    * ranking — no global single-partition window at any point.
    */
  def epochSchedule(docs: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1: $epochs")
    val fanned = docs
      .select(col(idCol), explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("__h",
        md5(concat(col("epoch").cast("string"), lit(":"), col(idCol).cast("string"))))
      // epoch-major order: lpad keeps lexicographic == numeric for the
      // epoch prefix; the hash permutes within the epoch block.
      .withColumn("__ord", concat(lpad(col("epoch").cast("string"), 6, "0"), col("__h")))
      .withColumn("__tie",
        concat(col("epoch").cast("string"), lit(":"), col(idCol).cast("string")))
    graft.ops.Normalize.denseIds(fanned, "__ord", "__tie", "schedule_pos")
      .select(col("epoch").cast("long").as("epoch"), col(idCol), col("schedule_pos"))
  }
}

package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
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

  /** docs(doc_id, text, ...) → (doc_id, token_count, quality, split) for
    * the deduped, quality-gated corpus.
    */
  def prepare(docs: DataFrame, minQuality: Double = 0.75): DataFrame = {
    val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .where(col("quality") >= minQuality)
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("token_count"),
        col("quality"),
        hashSplit(col("doc_id")).as("split"))
  }
}

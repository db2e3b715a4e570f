package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution primitive: find
  * record pairs whose names are within an edit-distance budget WITHOUT
  * the all-pairs comparison that is quadratic in the table size.
  *
  * Standard blocking architecture: a cheap deterministic key (here: any
  * caller-supplied expression — a prefix, a phonetic code, a token)
  * partitions records into candidate blocks; the expensive verifier
  * (Levenshtein) runs only WITHIN blocks. Cost falls from O(n²) to
  * Σ_b |b|² — the same candidate-pruning shape as [[Dedup]]'s LSH bands
  * and [[IntervalJoin]]'s buckets, applied to string identity. Recall is
  * bounded by the blocking key (pairs split across blocks are never
  * compared) — the classic precision/recall lever; run multiple blocking
  * passes and union for higher recall.
  */
object FuzzyJoin {

  /** Within-block near-match pairs of one table against itself:
    * (a_id, b_id, a_name, b_name, dist) with a_id < b_id and
    * `dist = levenshtein(a_name, b_name) ≤ maxDist`.
    *
    * Scale shape: one equi-join on the block key (shuffle carries only
    * id + name + block), verification is codegen'd `levenshtein` inside
    * the join — no UDF, no cross join. Hot blocks (skewed keys) are the
    * known failure mode at scale; cap or salt them upstream if a block
    * key collides too broadly.
    */
  def selfPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val side = df.select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("block"))
    side.alias("a")
      .join(side.alias("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.name").as("a_name"), col("b.name").as("b_name"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}

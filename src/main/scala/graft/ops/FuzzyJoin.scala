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

  /** Sorted-neighborhood candidate pairs: within each block, sort by
    * `nameCol` and pair every record with its `w` successors in sort
    * order — the OTHER classic blocking scheme, catching near-matches
    * that SORT adjacently even when no single blocking key collides
    * (typo'd prefixes, transposed tokens). Candidate count is ≤ w·n,
    * LINEAR in the table — vs Σ|b|² for key blocking — at the cost of
    * missing pairs that sort far apart; production ER runs both and
    * unions (multi-pass SNM).
    *
    * Emits `(block, a_id, b_id, a_name, b_name, rank_gap, dist)` — all
    * candidates with their Levenshtein distance, unfiltered: thresholding
    * is the verifier's policy decision, not the blocker's.
    *
    * Scale shape: the rank comes from a window PER BLOCK (parallel across
    * blocks — never a global row_number, which would serialize the table
    * through one reducer), then one self-equi-join on the block key with
    * a rank-band predicate; the shuffle carries (id, name, rank) only.
    */
  def sortedNeighborhood(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1: $w")
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("block")).orderBy(col("name"), col("id"))
    val ranked = df
      .select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("block"))
      .withColumn("rk", row_number().over(win).cast("long"))
    ranked.alias("a")
      .join(ranked.alias("b"),
        col("a.block") === col("b.block") &&
          col("b.rk") > col("a.rk") && col("b.rk") <= col("a.rk") + w)
      .select(col("a.block").as("block"),
        col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.name").as("a_name"), col("b.name").as("b_name"),
        (col("b.rk") - col("a.rk")).as("rank_gap"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"))
  }
}

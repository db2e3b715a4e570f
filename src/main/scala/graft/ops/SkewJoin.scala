package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain `fact ⋈ dim` hash-partitions both sides by the join key, so one
  * hot key (the reference's workloads are full of them: one pathological
  * client, one viral document) lands every matching fact row on a single
  * reducer. AQE's skew-join split helps sort-merge joins after the fact;
  * salting fixes the layout up front and also covers shuffled-hash joins
  * and downstream stages that reuse the exchange.
  *
  * Mechanics: the fact side gains a deterministic salt in `[0, nSalts)`
  * hashed from the whole row, widening each key into `nSalts` sub-keys;
  * the dim side is replicated once per salt via `explode`. The join runs
  * on `(key, salt)` — same result set as the unsalted join (inner,
  * duplicate-preserving), but the hot key now spreads over `nSalts`
  * reducers. Dim replication costs `nSalts ×` the small side, which is
  * the side you'd broadcast anyway when it fits; salting is for when it
  * doesn't.
  */
object SkewJoin {

  /** `saltCols`: columns the fact-side salt is hashed from. They must vary
    * within a key group (a unique id or line number is ideal); defaults to
    * the whole row, which is always correct but drags every column into
    * the scan — pass a narrow set to keep column pruning intact.
    */
  def salted(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      nSalts: Int = 8,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val saltInput = (if (saltCols.nonEmpty) saltCols else fact.columns.toSeq).map(col)
    val saltedFact = fact.withColumn(
      "__salt", pmod(xxhash64(saltInput: _*), lit(nSalts)).cast("int"))
    val saltedDim = dim.withColumn(
      "__salt", explode(array((0 until nSalts).map(lit): _*)))
    // Shuffled-hash over sort-merge: salting exists to bound every
    // (key, salt) partition, which is exactly the precondition that makes
    // hash-joining safe — and it skips both sides' sorts.
    saltedFact
      .join(saltedDim.hint("shuffle_hash"),
        saltedFact(factKey) === saltedDim(dimKey) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-replayable cardinality sketching.
  * Spark's own `approx_count_distinct` is a HyperLogLog++ whose hash and
  * bias tables are engine-internal — fine for ad-hoc use, impossible to
  * oracle. This HLL fixes every ingredient (md5 hash, top-b bucket
  * split, CASE-chain rank, integer estimator) so the sketch is a pure
  * function of the value set: any SQL engine reproduces registers AND
  * estimate bit-for-bit, and two sketches merge by per-register max —
  * the property that makes it a 100 TB primitive (per-partition
  * registers combine map-side; the shuffle carries m rows per task).
  */
object Sketch {

  /** Registers of a Flajolet–Martin/HLL sketch over `valueCol`:
    * bucket = top `b` bits of the 32-bit md5 uniform, register = max
    * over the bucket of (leading zeros of the remaining 32−b bits) + 1
    * (an empty bucket registers 0). One row per bucket, zero-filled to
    * all 2^b rows. Duplicates are free by construction (max ignores
    * them) — no distinct pass anywhere.
    */
  def hllRegisters(df: DataFrame, valueCol: String, b: Int = 6): DataFrame = {
    require(b >= 2 && b <= 12, s"b must be in [2,12]: $b")
    val m = 1 << b
    val wBits = 32 - b
    val u = graft.functions.TextFunctions.md5Prefix(col(valueCol).cast("string"), 8)
    val maxRank = wBits + 1
    val w = col("__u") % (1L << wBits)
    // exact integer rank via a comparison chain (a float log2 would
    // misround at exact powers of two); the fold runs r = wBits..1 so
    // the LARGEST threshold (rank 1) ends up outermost
    val rank = (wBits to 1 by -1).foldLeft(lit(maxRank.toLong)) { case (acc, r) =>
      when(w >= (1L << (wBits - r)), lit(r.toLong)).otherwise(acc)
    }
    val regs = df.select(u.as("__u"))
      .select((col("__u") / (1L << wBits)).cast("long").as("bucket"), rank.as("__r"))
      .groupBy("bucket").agg(max(col("__r")).as("register"))
    df.sparkSession.range(m).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("register"), lit(0L)).as("register"))
  }

  /** One-row HLL cardinality profile: the raw HLL estimate in exact
    * fixed point next to the true distinct count (the accuracy audit a
    * pipeline actually wants).
    *
    * Estimator, all-integer: with `S = Σ_j 2^(−M_j)` the raw HLL
    * estimate is `α_m · m² / S`. Here
    * `s_num = Σ_j 2^(maxRank − M_j)` (so `S = s_num / 2^maxRank`) and
    * `est_e6 = ⌊α_e6 · m² · 2^maxRank / s_num⌋` = 1e6 × the raw
    * estimate — integer division both engines compute identically.
    * α_e6 is the standard `0.7213/(1 + 1.079/m)` constant in
    * parts-per-million, a fixed member of the contract per `b`. The
    * raw estimator is reported WITHOUT the small/large-range
    * corrections; `n_zero_registers` is emitted so callers can apply
    * linear counting when they want it (that correction needs a log —
    * float — which is exactly what this surface keeps out).
    *
    * Scale shape: the register build is one map-side-combined max-agg
    * (m rows per task crosses the wire); the exact distinct count — the
    * audit column — is the only corpus-sized shuffle, and callers who
    * only want the sketch use [[hllRegisters]].
    */
  def hllProfile(df: DataFrame, valueCol: String, b: Int = 6): DataFrame = {
    require(b >= 2 && b <= 12, s"b must be in [2,12]: $b")
    val m = (1 << b).toLong
    val maxRank = (32 - b) + 1
    val alphaE6 = math.floor(0.7213 / (1.0 + 1.079 / m) * 1e6).toLong
    val sketch = hllRegisters(df, valueCol, b)
      .agg(
        count(lit(1)).as("m"),
        count_if(col("register") === 0L).as("n_zero_registers"),
        sum(expr(s"cast(shiftleft(1L, cast($maxRank - register as int)) as bigint)"))
          .as("s_num"))
      .select(col("m"), col("n_zero_registers"), col("s_num"),
        expr(s"(${alphaE6}L * ${m * m}L * cast(shiftleft(1L, $maxRank) as bigint)) div s_num")
          .as("est_e6"))
    val exact = df.agg(countDistinct(col(valueCol)).as("n_exact"))
    sketch.crossJoin(broadcast(exact))
  }
}

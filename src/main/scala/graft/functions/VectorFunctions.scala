package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as native higher-order
  * functions (`zip_with` / `aggregate`) — codegen'd, no UDFs, so similarity
  * scans stay inside whole-stage codegen at 100 TB.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ. Accumulates in double, left-to-right over the array — the same
    * order every engine's straightforward loop uses.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; null-safe zero for zero-norm vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Unit-normalize against a pre-computed norm column (stage the norm in a
    * prior projection so it evaluates once, not once per element). With unit
    * vectors, cosine degenerates to [[dot]] — one aggregate per candidate
    * pair instead of three, the dominant cost of any LSH/IVF scoring join.
    * Zero-norm vectors map to the zero vector (cosine 0 against everything,
    * matching [[cosine]]'s null-safe zero).
    */
  def unitizeWith(vec: Column, normCol: Column): Column =
    when(normCol > 0, transform(vec, x => x.cast("double") / normCol))
      .otherwise(transform(vec, _ => lit(0.0)))

  /** Signed random-hyperplane LSH bucket: the sign bits of `nBits` fixed
    * pseudo-random hyperplane projections, packed into a long. Two vectors
    * with high cosine similarity collide with high probability — the
    * bucket-join path that replaces the O(n²) all-pairs scan at scale.
    *
    * Hyperplanes derive deterministically from (bit, dim) via a hash, so
    * the same bucket function is computable on any executor with no
    * broadcast state.
    */
  def simhashBucket(vec: Column, nBits: Int = 16, seed: Int = 42): Column = {
    val projections: Seq[Column] = (0 until nBits).map { bit =>
      // projection = Σ vec[i] * h(bit, i), h deterministic in [-0.5, 0.5)
      val proj = aggregate(
        zip_with(
          vec,
          sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            ((pmod(hash(lit(bit), i, lit(seed)).cast("long"), lit(1000000L)).cast("double") / 1000000.0) - 0.5)),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    projections.reduce(_ + _)
  }
}

package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.functions._
import graft.functions.expressions.{CentroidCodebook, CosineSimilarity, DotProduct, HyperplaneBucket => HyperplaneBucketExpr, IntDotProduct, LatticeCodebook, MinHashSignature, NearestCentroidId, NearestLatticeCentroid, PositionalShingleHashes, QuantizeInt8MaxAbs, ShingleHashes, SimHash64, SortedIntersectCount, TopCentroidIds}

/** Vector math over `array<float>` embedding columns. The hot pairwise
  * functions ([[dot]], [[cosine]], [[simhashBucket]]) are native Catalyst
  * expressions with `doGenCode` (see
  * [[graft.functions.expressions.VectorExpressions]]) — tight primitive
  * loops inside whole-stage codegen. The higher-order-function forms are
  * kept as `*Hof` reference implementations (semantically identical,
  * interpreted) for cross-checking in tests.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — native codegen'd loop, accumulating in double left-to-right. */
  def dot(a: Column, b: Column): Column =
    GraftColumn(DotProduct(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** Σ aᵢ·bᵢ over `array<long>` in exact 64-bit integer arithmetic —
    * native codegen'd loop; the kernel for quantized-embedding thresholds
    * that must compare identically across engines.
    */
  def intDot(a: Column, b: Column): Column =
    GraftColumn(IntDotProduct(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** Reference HOF form of [[dot]] (interpreted; tests cross-check). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; null-safe zero for zero-norm vectors. Single fused
    * pass, bit-identical to the staged `dot/(norm·norm)` formulation.
    */
  def cosine(a: Column, b: Column): Column =
    GraftColumn(CosineSimilarity(GraftColumn.expr(a), GraftColumn.expr(b)))

  /** Reference HOF form of [[cosine]] (interpreted; tests cross-check). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** MinHash signature (array<long>, length `numHashes`) over a hashed
    * shingle set — one native pass updating all mins.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftColumn(MinHashSignature(GraftColumn.expr(shingles), numHashes))

  /** 64-bit SimHash over a token array — each token hashed once natively. */
  def simhash64(tokens: Column): Column =
    GraftColumn(SimHash64(GraftColumn.expr(tokens)))

  /** Distinct hashed word k-shingles (array<long>) in one native pass. */
  def shingleHashes(words: Column, k: Int): Column =
    GraftColumn(ShingleHashes(GraftColumn.expr(words), k))

  /** Positional (order-preserving, non-distinct) k-shingle hashes — one
    * per window start, empty below k words; one native pass.
    */
  def positionalShingleHashes(words: Column, k: Int): Column =
    GraftColumn(PositionalShingleHashes(GraftColumn.expr(words), k))

  /** |A ∩ B| over sorted, distinct, null-free string/long arrays — one
    * native two-pointer merge (≡ `size(array_intersect(a, b))` on such
    * inputs, without the per-row hash set). The per-candidate-pair
    * verification kernel.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumn(SortedIntersectCount(GraftColumn.expr(a), GraftColumn.expr(b)))

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

  /** Per-vector max|xᵢ| (in double) — the scale denominator for symmetric
    * int8 quantization.
    */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization against a pre-staged [[maxAbs]] column:
    * `qᵢ = round(xᵢ · 127 / maxAbs)` ∈ [-127, 127]. The standard
    * 4×-memory-reduction step for billion-vector ANN at rest — quantize
    * once at ingest, score candidates on int8, re-rank survivors on the
    * full floats. Zero vectors quantize to zeros. Exact integer outputs →
    * any SQL engine reproduces them bit-for-bit (ties round away from
    * zero in both Spark and ANSI round()).
    */
  def quantizeInt8(vec: Column, maxAbsCol: Column): Column =
    when(maxAbsCol > 0,
      transform(vec, x => round(x.cast("double") * 127.0 / maxAbsCol).cast("long")))
      .otherwise(transform(vec, _ => lit(0L)))

  /** Fused `quantizeInt8(vec, maxAbs(vec))` as ONE native codegen'd pass —
    * bit-identical to the HOF pair (cross-checked in
    * `NativeExpressionsSpec`). Use this when the scale is the vector's own
    * max|xᵢ|: the inline HOF composition re-evaluates the interpreted
    * maxAbs once per ELEMENT of the transform lambda (~65 array scans per
    * 64-dim row). The two-argument form above stays for callers carrying a
    * pre-staged maxAbs column.
    */
  def quantizeInt8MaxAbs(vec: Column): Column =
    GraftColumn(QuantizeInt8MaxAbs(GraftColumn.expr(vec)))

  /** Signed random-hyperplane LSH bucket: the sign bits of `nBits` fixed
    * pseudo-random hyperplane projections, packed into a long. Two vectors
    * with high cosine similarity collide with high probability — the
    * bucket-join path that replaces the O(n²) all-pairs scan at scale.
    *
    * Hyperplanes derive deterministically from (bit, dim, seed) via a
    * splitmix64 finalizer, so the same bucket function is computable on any
    * executor with no broadcast state. Native: one pass over the vector
    * updating all `nBits` projections.
    */
  def simhashBucket(vec: Column, nBits: Int = 16, seed: Int = 42): Column =
    GraftColumn(HyperplaneBucketExpr(GraftColumn.expr(vec), nBits, seed))

  /** Nearest-centroid id by dot product against a broadcast codebook — the
    * map-only, codegen'd IVF assignment step (plan size stays flat in the
    * centroid count; see [[graft.functions.expressions.NearestCentroidId]]).
    */
  def nearestCentroidId(vec: Column, codebook: Broadcast[CentroidCodebook]): Column =
    GraftColumn(NearestCentroidId(GraftColumn.expr(vec), codebook))

  /** `[cid, squared_distance]` of the nearest centroid on the integer
    * lattice (exact long math, ties to smallest cid) — the codegen'd Lloyd
    * assignment step of [[graft.ops.KMeans]].
    */
  def nearestLatticeCentroid(vec: Column, codebook: Broadcast[LatticeCodebook]): Column =
    GraftColumn(NearestLatticeCentroid(GraftColumn.expr(vec), codebook))

  /** Top-`nProbe` centroid ids (dot desc, id asc) against a broadcast
    * codebook — the IVF query-probe step.
    */
  def topCentroidIds(vec: Column, codebook: Broadcast[CentroidCodebook], nProbe: Int): Column =
    GraftColumn(TopCentroidIds(GraftColumn.expr(vec), codebook, nProbe))
}

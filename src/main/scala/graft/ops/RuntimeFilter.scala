package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Manual bloom-filter runtime filter: prune a huge fact table against a
  * dimension's key set BEFORE the exact join, using Spark's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions (the
  * machinery behind AQE's injected runtime filters, which only fire on
  * selective broadcast-joined dims — this operator covers the cases AQE
  * won't, e.g. a pre-collapsed dim or a multi-stage pipeline where the
  * prune must happen stages earlier than the join).
  *
  * Why it matters at 100 TB: a `left_semi` join shuffles every fact row
  * that MIGHT match. With a bloom pre-filter, the scan→filter stage drops
  * non-matching rows map-side at ~zero cost (xxhash64 + a bit probe, both
  * codegen'd), so the semi-join shuffle carries only survivors — for a
  * 1%-selective dim that is a 99% shuffle-volume cut. The filter is
  * correct-but-approximate (no false negatives, bounded false positives),
  * so the exact semi-join after it returns exactly the unfiltered result.
  */
object RuntimeFilter {

  /** `fact` rows whose `factKey` appears in `dim.dimKey` — same result as
    * a plain left-semi join, with a bloom pre-filter to cut the fact-side
    * shuffle.
    *
    * The bloom sketch is aggregated distributively (partial sketches
    * merge), collected to the driver as ONE compact binary value
    * (`numBits/8` bytes — the same bounded, broadcast-equivalent driver
    * hop as [[Similarity]]'s IVF codebook), and folded into the filter
    * expression as a literal so every task probes it in-place.
    *
    * @param expectedItems sizing hint: distinct dim keys (over-estimate
    *                      is safe; under-estimate raises false-positive
    *                      rate, never correctness)
    * @param numBits       sketch size in bits (default 8 bits/item ≈ 2%
    *                      false positives)
    */
  def bloomSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      numBits: Long = 0L): DataFrame = {
    // The probe hashes both sides with xxhash64 on their NATIVE types; a
    // dtype mismatch (int fact key vs long dim key) would hash equal
    // values differently and produce bloom FALSE NEGATIVES — rows the
    // exact join can never rescue. Fail loudly instead of dropping rows.
    require(
      fact.schema(factKey).dataType == dim.schema(dimKey).dataType,
      s"bloomSemiJoin requires identical key types, got " +
        s"${fact.schema(factKey).dataType} vs ${dim.schema(dimKey).dataType} — " +
        "cast one side before calling")
    val bf = bloomBytes(dim, dimKey, expectedItems, numBits)
    val pruned = fact.where(mightContain(bf, col(factKey)))
    // Exact semi-join on the survivors removes the bloom's false
    // positives; the dim side collapses to distinct keys first so the
    // build side is minimal.
    pruned.join(
      dim.select(col(dimKey).as(factKey)).distinct(),
      Seq(factKey), "left_semi")
  }

  /** Aggregate `dim.keyCol` into one bloom sketch and collect its bytes
    * (`numBits/8` — bounded, broadcast-equivalent driver hop). Partial
    * sketches merge distributively, so this is one narrow agg over the
    * dim, never a collect of keys.
    */
  def bloomBytes(dim: DataFrame, keyCol: String, expectedItems: Long, numBits: Long = 0L): Array[Byte] = {
    val bits = if (numBits > 0) numBits else expectedItems * 8
    val sketch = GraftColumn(
      new BloomFilterAggregate(
        GraftColumn.expr(xxhash64(col(keyCol))),
        Literal(expectedItems), Literal(bits)).toAggregateExpression())
    dim.agg(sketch.as("bf")).head().getAs[Array[Byte]]("bf")
  }

  /** The codegen'd map-side probe: true when `key` MIGHT be in the sketch
    * (no false negatives). Hash dtype caveat as in [[bloomSemiJoin]]: the
    * probe key must have the same type the sketch was built over.
    */
  def mightContain(bf: Array[Byte], key: Column): Column =
    GraftColumn(BloomFilterMightContain(
      Literal(bf, BinaryType),
      GraftColumn.expr(xxhash64(key))))
}

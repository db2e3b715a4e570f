package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch: fixed-memory frequency estimation over unbounded key
  * domains — the third classic sketch beside HLL (distinct counts) and GK
  * (quantiles), both of which Spark ships natively. At 100 TB the exact
  * per-term count table IS computable (one shuffle on the term), but a
  * sketch answers "how often does this term occur" in O(depth·width)
  * memory with NO shuffle of the term domain at all — partials merge by
  * elementwise addition, so results are identical under any partitioning
  * or merge order (fully deterministic, unlike sampled counters).
  *
  * Guarantees (classic): estimate ≥ true count always; estimate ≤ true
  * count + (e/width)·N with probability 1−(1/e)^depth per query.
  */
object Sketches {

  /** Deterministic 64-bit string hash (FNV-1a folded through a splitmix64
    * finalizer), seeded per sketch row — stable across JVMs/executors.
    */
  private[functions] def hash64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** The sketch state: depth rows of width counters, flattened. */
  final case class CMSketch(depth: Int, width: Int, counts: Array[Long]) {
    private def idx(d: Int, term: String): Int = {
      val m = (hash64(term, d.toLong * 0x9e3779b97f4a7c15L) % width).toInt
      d * width + (if (m < 0) m + width else m)
    }
    def add(term: String): CMSketch = {
      var d = 0
      while (d < depth) { counts(idx(d, term)) += 1; d += 1 }
      this
    }
    def mergeWith(o: CMSketch): CMSketch = {
      var i = 0
      while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
      this
    }
    def estimate(term: String): Long = {
      var best = Long.MaxValue
      var d = 0
      while (d < depth) { best = math.min(best, counts(idx(d, term))); d += 1 }
      best
    }
  }

  /** Estimates for a fixed term list, in input order. */
  final case class TermEstimates(estimates: Seq[Long])

  /** Typed aggregate: feed term occurrences, get Count-Min estimates for
    * `queryTerms`. Mutable-buffer updates (Spark's object hash aggregate
    * keeps the JVM object between rows; serialization happens only at
    * exchange boundaries).
    */
  final class CountMinAgg(depth: Int, width: Int, queryTerms: Seq[String])
      extends Aggregator[String, CMSketch, TermEstimates] {
    require(depth > 0 && width > 0, "depth and width must be positive")
    override def zero: CMSketch = CMSketch(depth, width, new Array[Long](depth * width))
    override def reduce(b: CMSketch, term: String): CMSketch = b.add(term)
    override def merge(x: CMSketch, y: CMSketch): CMSketch = x.mergeWith(y)
    override def finish(b: CMSketch): TermEstimates = TermEstimates(queryTerms.map(b.estimate))
    override def bufferEncoder: org.apache.spark.sql.Encoder[CMSketch] =
      org.apache.spark.sql.Encoders.product[CMSketch]
    override def outputEncoder: org.apache.spark.sql.Encoder[TermEstimates] =
      org.apache.spark.sql.Encoders.product[TermEstimates]
  }
}

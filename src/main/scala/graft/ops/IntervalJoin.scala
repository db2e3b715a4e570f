package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join at scale: match timestamped points to the
  * intervals containing them WITHOUT an equality key.
  *
  * The naive plan for `start <= ts AND ts < end` with no equi-key is a
  * broadcast-nested-loop (fine against a 4-row dim — q34 — fatal against
  * millions of intervals). The scale form maps both sides onto a coarse
  * time-bucket grid and equi-joins on the bucket:
  *
  *  - a point lands in exactly ONE bucket → it can never be matched twice;
  *  - an interval is exploded to EVERY bucket it overlaps (a `sequence`
  *    fan-out of ⌈span/width⌉ + 1 rows — bounded and cheap when the bucket
  *    width is chosen near the typical interval span);
  *  - the bucket equi-join shuffles/hashes like any join, then the exact
  *    range predicate filters the within-bucket false candidates.
  *
  * Every (interval, point) match appears exactly once (the point's unique
  * bucket is necessarily among the interval's buckets), so downstream
  * aggregation needs no dedup. This is the standard interval-join
  * strategy in stream processors and range-join optimizers (binned
  * partitioning); Spark's join selection does not synthesize it, so we
  * declare it.
  */
object IntervalJoin {

  /** Exact floor division in pure Long arithmetic. `floor(x / w)` via
    * double division loses integer precision for |x| > 2^53 (epoch
    * micros pass that around 2255 CE) and rounds the quotient BEFORE
    * flooring; `x div w` alone truncates toward zero, which disagrees
    * with floor for pre-1970 (negative-micros) timestamps. Subtracting
    * the positive modulus first makes `div` exact floor for any sign.
    */
  private def floorDiv(x: Column, w: Column): Column =
    call_function("div", x - pmod(x, w), w)

  /** Inner-join `points` to the intervals containing them.
    *
    * @param intervals   one row per interval
    * @param startCol    interval start, TimestampType (inclusive)
    * @param endCol      interval end, TimestampType (EXCLUSIVE)
    * @param points      one row per point
    * @param tsCol       point timestamp column
    * @param bucketWidthSec  grid width in seconds; choose ≈ the typical
    *                    interval span (wider ⇒ more within-bucket filter
    *                    work, narrower ⇒ more fan-out rows per interval)
    * @return points columns + the interval columns, one row per match
    */
  def pointsInIntervals(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      points: DataFrame,
      tsCol: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, s"bucketWidthSec must be positive: $bucketWidthSec")
    val width = lit(bucketWidthSec * 1000000L) // grid in epoch-micros
    // cast("timestamp") accepts both TIMESTAMP and TIMESTAMP_NTZ inputs
    // (identity under a UTC session) — unix_micros alone rejects NTZ.
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    // Last covered bucket uses end-1µs: an interval ending exactly on a
    // grid line must not claim the next bucket (end is exclusive).
    // Empty/inverted intervals (end <= start) can match no point, but
    // sequence(hi, lo) would COUNT DOWN and fan a corrupt interval out
    // across its whole reversed span — drop them before the explode.
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(floorDiv(micros(col(startCol)), width),
          floorDiv(micros(col(endCol)) - 1, width))))
    val pt = points.withColumn("__bucket", floorDiv(micros(col(tsCol)), width))
    pt.join(iv, Seq("__bucket"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval–interval OVERLAP join: pairs (a, b) from two interval sets
    * whose half-open spans intersect, with the exact overlap length —
    * the session-vs-incident / downtime-vs-deploy correlation join. The
    * classic O(n·m) inequality join becomes a bucket-grid equi-join:
    * both sides fan out to the grid cells they span, and each
    * overlapping pair matches EXACTLY ONCE — only in the first cell the
    * overlap itself occupies (`bucket = ⌊max(starts)/w⌋`) — so no
    * distinct pass over the matches is needed.
    *
    * Scale shape: fan-out is span/width cells per interval (pick
    * `bucketWidthSec` ≈ the typical span), the join is a plain hash
    * equi-join on the cell id, and the overlap predicate + first-cell
    * filter run inside codegen. Degenerate (end ≤ start) intervals are
    * dropped before the explode, as in [[pointsInIntervals]].
    */
  def overlapPairs(
      a: DataFrame,
      aStart: String,
      aEnd: String,
      b: DataFrame,
      bStart: String,
      bEnd: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, s"bucketWidthSec must be positive: $bucketWidthSec")
    val width = lit(bucketWidthSec * 1000000L)
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    def spread(df: DataFrame, s: String, e: String) = df
      .where(col(e) > col(s))
      .withColumn("__bucket",
        explode(sequence(floorDiv(micros(col(s)), width), floorDiv(micros(col(e)) - 1, width))))
    spread(a, aStart, aEnd).join(spread(b, bStart, bEnd), Seq("__bucket"))
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("__bucket") === floorDiv(greatest(micros(col(aStart)), micros(col(bStart))), width))
      .withColumn("overlap_micros",
        least(micros(col(aEnd)), micros(col(bEnd)))
          - greatest(micros(col(aStart)), micros(col(bStart))))
      .drop("__bucket")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{Cohort, Indexing, Survivorship, TimeSeries}

/** Round-3 additions: RFM segmentation, survivorship merge,
  * period-over-period growth, run-length encoding, category bitmaps.
  */
class SegmentationSpec extends SparkSpec {
  import spark.implicits._

  test("rfm scores quintiles deterministically with exact metrics") {
    val rows = for (c <- 1 to 50; o <- 1 to (c % 5 + 1))
      yield (c.toLong, java.sql.Timestamp.valueOf(s"2024-01-${(c % 27) + 1} 00:00:00"),
        (c * 100 + o).toLong)
    val df = rows.toDF("cust", "d", "cents")
    val got = Cohort.rfm(df, "cust", col("d"), col("cents"), k = 5).collect()
    assert(got.length == 50)
    got.foreach { r =>
      val c = r.getAs[Long]("cust")
      val expect = rows.filter(_._1 == c)
      assert(r.getAs[Long]("frequency") == expect.size)
      assert(r.getAs[Long]("monetary_cents") == expect.map(_._3).sum)
      assert(r.getAs[Long]("recency_days") >= 0)
      Seq("r_bucket", "f_bucket", "m_bucket").foreach { b =>
        assert(r.getAs[Long](b) >= 1 && r.getAs[Long](b) <= 5)
      }
    }
    // most recent customer(s) get recency 0; buckets are balanced 10/10/10/10/10
    val rb = got.groupBy(_.getAs[Long]("r_bucket")).view.mapValues(_.size)
    assert(rb.values.toSet == Set(10))
  }

  test("survivorship keeps the latest non-null per field") {
    val log = Seq(
      (1L, 1L, Some("a"), Some(10L)),
      (1L, 2L, None, Some(20L)),      // null status must NOT erase "a"
      (1L, 3L, Some("b"), None),      // null cents must NOT erase 20
      (2L, 5L, None, None)            // all null → null fields survive
    ).toDF("k", "seq", "status", "cents")
    val got = Survivorship.merge(log, Seq("k"), col("seq"), Seq("status", "cents"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.getString(3)), Option(r.get(4)))).toMap
    assert(got(1L) == ((3L, 3L, Some("b"), Some(20L))))
    assert(got(2L) == ((1L, 5L, None, None)))
  }

  test("periodGrowth computes exact deltas and null-safe ratios") {
    val df = Seq(("a", "2024-01", 100L), ("a", "2024-02", 150L), ("a", "2024-04", 75L),
      ("b", "2024-01", 10L)).toDF("k", "month", "v")
    val got = TimeSeries.periodGrowth(df, Seq("k"), "month", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(("a", "2024-01")) == ((None, None, None)))
    assert(got(("a", "2024-02")) == ((Some(100L), Some(50L), Some(0.5))))
    // gap month: previous PRESENT period (2024-02) is the baseline
    assert(got(("a", "2024-04")) == ((Some(150L), Some(-75L), Some(-0.5))))
    assert(got(("b", "2024-01")) == ((None, None, None)))
  }

  test("runs encodes maximal islands with exact positions") {
    val df = Seq(
      ("u", 1L, "x"), ("u", 2L, "x"), ("u", 3L, "y"), ("u", 4L, "x"), ("u", 5L, "x"),
      ("v", 1L, "z")).toDF("k", "t", "s")
    val got = TimeSeries.runs(df, Seq("k"), Seq(col("t")), "s")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      ("u", "x", 1L, 2L, 2L), ("u", "y", 3L, 3L, 1L), ("u", "x", 4L, 5L, 2L),
      ("v", "z", 1L, 1L, 1L)))
  }

  test("categoryBitmap ORs one bit per listed category") {
    val df = Seq(("u", "a"), ("u", "c"), ("u", "a"), ("v", "b"), ("w", "zzz"))
      .toDF("k", "cat")
    val got = Indexing.categoryBitmap(df, Seq("k"), "cat", Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("u") == ((1L | 4L, 2L)))
    assert(got("v") == ((2L, 1L)))
    assert(got("w") == ((0L, 0L))) // unlisted category → no bit
  }
}

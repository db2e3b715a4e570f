package graft

import org.apache.spark.sql.types._

/** Guard against environment testdata regeneration drifting under the repo.
  *
  * Round 6 lost 51 driver queries because `events.ts` changed parquet
  * physical type (TIMESTAMP(NANOS) → timestamp[us]) while the in-memory
  * fixture suites stayed green. This suite opens every sf0.001 table
  * through the SAME loader the driver contract uses ([[SparkEntry.t]])
  * and asserts the post-load schema each query depends on, plus runs one
  * events-backed query end-to-end — so `sbt test` fails in-round the next
  * time the testdata shifts shape.
  *
  * Skips (does not fail) when /root/testdata is absent, so the suite is
  * inert on machines without the driver-generated data.
  */
class TestdataDriftSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(s"$dir/events.parquet").exists()

  private def loaded(name: String) = SparkEntry.t(spark, dir, name)

  private def assertCols(name: String, expect: Map[String, DataType]): Unit = {
    val got = loaded(name).schema.map(f => f.name -> f.dataType).toMap
    expect.foreach { case (c, dt) =>
      assert(got.contains(c), s"$name: expected column '$c' absent; has ${got.keys.toSeq.sorted}")
      assert(got(c) == dt, s"$name.$c: expected $dt, got ${got(c)}")
    }
  }

  test("events loads with normalized TimestampType ts (either parquet generation)") {
    assume(available, s"$dir not present — driver testdata not generated here")
    assertCols("events", Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("core table columns keep the types the 205 oracled queries assume") {
    assume(available, s"$dir not present — driver testdata not generated here")
    assertCols("lineitem", Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType))
    assertCols("orders", Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_totalprice" -> DoubleType))
    assertCols("customer", Map("c_custkey" -> LongType, "c_mktsegment" -> StringType))
    assertCols("documents", Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertCols("embeddings", Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true)))
    // date-bearing columns: queries use to_date/datediff over these
    val shipdate = loaded("lineitem").schema("l_shipdate").dataType
    assert(shipdate == TimestampType || shipdate == TimestampNTZType,
      s"l_shipdate unexpected type $shipdate")
    val odate = loaded("orders").schema("o_orderdate").dataType
    assert(odate == TimestampType || odate == TimestampNTZType,
      s"o_orderdate unexpected type $odate")
  }

  test("an events-backed driver query runs end-to-end on real testdata") {
    assume(available, s"$dir not present — driver testdata not generated here")
    val q8 = SparkEntry.queries("q8_sessionize")(spark, dir)
    assert(q8.limit(1).count() == 1L, "q8_sessionize returned no rows on sf0.001")
    val q2 = SparkEntry.queries("q2_conditional_counts")(spark, dir)
    assert(q2.limit(1).count() == 1L, "q2_conditional_counts returned no rows on sf0.001")
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based pinning of the sessionization semantics (SURVEY §5.2-3):
  * for arbitrary event sequences the window-function implementation must
  * equal a direct replay of the reference scan (`src/batch_tlb.py:46-62`).
  * (ScalaCheck generators driven explicitly — deterministic seeds, no
  * scalatestplus bridge needed.)
  */
class SessionizePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference scan, verbatim semantics, in-memory. */
  private def referenceScan(events: Seq[(Long, String)]): Double = {
    var pending: Option[Long] = None
    var total = 0.0
    events.sortBy(_._1).foreach {
      case (ts, "S") => pending = Some(ts)
      case (ts, "E") => pending.foreach { s => total += (ts - s) / 1000.0; pending = None }
      case _         =>
    }
    total
  }

  private val eventGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(0, 24)
    // distinct second-granularity timestamps: equal-timestamp ties are
    // reference-file-order-dependent and pinned separately by unit tests
    ts <- Gen.pick(n, (1 to 200).map(_ * 1000L))
    types <- Gen.listOfN(n, Gen.oneOf("S", "E", "X"))
  } yield ts.toSeq.sorted.zip(types)

  test("window sessionization equals the reference scan on 40 random sequences") {
    val failures = (1 to 40).flatMap { i =>
      val events = eventGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val df = events.zipWithIndex
        .map { case ((ts, et), idx) => ("c", new java.sql.Timestamp(ts), et, f"e$idx%03d") }
        .toDF("clientId", "timestamp", "eventType", "eventId")
      val got = graft.ops.Sessionize
        .pairedDurations(df, "clientId", col("timestamp").cast("double"),
          Seq(col("timestamp"), col("eventId")), "eventType", "S", "E")
        .agg(coalesce(sum("duration"), lit(0.0))).as[Double].head()
      val want = referenceScan(events)
      if (got != want) Some((i, events, got, want)) else None
    }
    assert(failures.isEmpty, s"mismatches: $failures")
  }
}

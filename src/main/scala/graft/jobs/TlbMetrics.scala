package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.io.Io
import graft.ops.{Correlate, Metrics, Sessionize}

/** Flagship query: the reference's batch TLB metrics job
  * (`src/batch_tlb.py:20-85`), re-expressed Spark-first (SURVEY §3 EP3).
  *
  * Logical shape:
  * {{{
  * sessions = events → window-paired start/end durations → sum per client   (A2)
  * counts   = events ⋈ trace-spans ⋈ logs → conditional counts per client   (J4+A3)
  * result   = client universe ⟕ sessions ⟕ counts, zero-filled             (A4)
  * }}}
  * Expected on the reference fixtures: client1 {120.0,0,0,0},
  * client2 {0,0,1,1}, client3 {125.0,1,0,0}
  * (`output/tlb_metrics/2024111612.json`).
  */
object TlbMetrics {

  /** Compute per-client metrics from already-loaded DataFrames. */
  def compute(events: DataFrame, traces: DataFrame, logs: DataFrame): DataFrame = {
    val parsed = events.withColumn("__ts", to_timestamp(col("timestamp")))
    val sessions = Sessionize.pageViewTime(
      parsed.select(col("clientId"), col("__ts").as("timestamp"), col("eventType"), col("eventId")))
    val counts = Metrics.conditionalCounts(Correlate(events, traces, logs))
    Metrics.zeroFill(events, sessions, counts)
      .select(
        col("clientId"),
        col("page_view_time"),
        col("retry_count"),
        col("timeout_count"),
        col("error_count"))
  }

  /** Run against the reference's JSON fixtures for one `{hour}`. */
  def fromJson(spark: SparkSession, dataDir: String, hour: String): DataFrame = {
    val events = Io.readJsonArray(spark, s"$dataDir/user_exp_$hour.json", Schemas.userExp)
    val traces = Io.readJsonArray(spark, s"$dataDir/trace_$hour.json", Schemas.trace)
    val logs = Io.readJsonArray(spark, s"$dataDir/log_$hour.json", Schemas.log)
    compute(events, traces, logs)
  }
}

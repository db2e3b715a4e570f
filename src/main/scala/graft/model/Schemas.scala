package graft.model

import org.apache.spark.sql.types._

/** Static schemas for the reference's schemaless JSON datasets.
  *
  * The reference (ODP-dynamic-data-pipeline) declares no schemas; fields are
  * optional per record (e.g. `errorCode` only on error events — see
  * reference `data/user_exp_2024111612.json`). Here every field is nullable,
  * which reproduces the "missing field tolerated" behavior
  * (reference `src/data_processor.py:104-107`) statically.
  */
object Schemas {

  /** User-experience event stream (reference `data/user_exp_{hour}.json`). */
  val userExp: StructType = StructType(Seq(
    StructField("eventId", StringType),
    StructField("clientId", StringType),
    StructField("traceId", StringType),
    StructField("timestamp", StringType), // ISO-8601 'Z' string; parsed on demand
    StructField("page", StringType),
    StructField("eventType", StringType),
    StructField("errorCode", StringType),
    StructField("errorMessage", StringType)
  ))

  /** Span struct nested in traces (reference `data/trace_{hour}.json`). */
  val span: StructType = StructType(Seq(
    StructField("spanId", StringType),
    StructField("server", StringType),
    StructField("log", StringType)
  ))

  /** Distributed traces: the one nested array-of-struct in the system. */
  val trace: StructType = StructType(Seq(
    StructField("traceId", StringType),
    StructField("spans", ArrayType(span))
  ))

  /** Service logs (reference `data/log_{hour}.json`). */
  val log: StructType = StructType(Seq(
    StructField("logId", StringType),
    StructField("spanId", StringType),
    StructField("timestamp", StringType),
    StructField("message", StringType),
    StructField("level", StringType),
    StructField("processingTimeMs", LongType),
    StructField("eventType", StringType)
  ))
}

/** Typed rows for the metrics core (Dataset[T] where type safety helps). */
final case class UserExpEvent(
    eventId: String,
    clientId: String,
    traceId: String,
    timestamp: String,
    page: String,
    eventType: String,
    errorCode: Option[String],
    errorMessage: Option[String])

final case class SessionEvent(clientId: String, timestamp: java.sql.Timestamp, eventType: String)

/** Per-client health metrics, the TLB output row
  * (reference `output/tlb_metrics/2024111612.json`).
  */
final case class ClientMetrics(
    clientId: String,
    page_view_time: Double,
    retry_count: Long,
    timeout_count: Long,
    error_count: Long)

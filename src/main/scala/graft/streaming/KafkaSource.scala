package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka ingestion (SURVEY §2.1 S4). The reference scaffolds Kafka topics
  * (`src/setup.py:4-17`) but never consumes them; this is the live Spark
  * form. Requires the spark-sql-kafka connector on the classpath at
  * runtime (not bundled in this environment — kept as the one deliberate
  * scaffold, mirroring the reference, with the plan shape fully declared).
  */
object KafkaSource {

  /** Parse a Kafka-shaped `value` column (binary or string JSON payload)
    * into typed top-level columns. This is the connector-independent half
    * of [[jsonStream]]: everything after the socket — cast, `from_json`
    * with an explicit schema (malformed payloads become null-struct rows,
    * Spark's PERMISSIVE default, matching the reference's tolerant JSON
    * reads), struct flatten — so the suite can exercise it over a
    * `MemoryStream` without the Kafka connector jar.
    */
  def parseJsonValues(raw: DataFrame, schema: StructType): DataFrame =
    raw
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))

  /** Subscribe to a topic and parse the JSON value column with an explicit
    * schema. Partition parallelism follows the topic's Kafka partitions
    * (the reference provisioned 3 — `src/setup.py:11`).
    */
  def jsonStream(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      schema: StructType,
      startingOffsets: String = "latest"): DataFrame =
    parseJsonValues(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load(),
      schema)
}

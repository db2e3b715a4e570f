package graft.io

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Row}

/** External key-value sink (SURVEY §2.2 K2): the reference SETs every
  * mapping entry into Redis (`src/data_processor.py:94-98`). Engine-internal
  * mapping flow no longer needs this (mappings are DataFrames), but a real
  * deployment may still want the index in an external store for other
  * consumers — this is the `foreachPartition` shape for that.
  *
  * The client is created once per partition (per-executor connection, not
  * per-row) and writes are batched — the pattern that holds at 100 TB where
  * a per-row connect would melt the store.
  */
object KvSink {

  /** Minimal KV client contract (a Redis pipeline, an HBase table, ...). */
  trait KvClient extends AutoCloseable {
    def putAll(batch: Seq[(String, String)]): Unit
  }

  /** Write (key, value-as-json) rows of a mapping DataFrame through a
    * client factory. `batchSize` bounds each putAll (Redis MSET/pipeline
    * sweet spot).
    */
  def write(
      mapping: DataFrame,
      prefix: String,
      clientFactory: () => KvClient,
      batchSize: Int = 500): Unit = {
    import org.apache.spark.sql.functions._
    val rows = mapping.select(col("key").cast("string"), to_json(col("value")))
    rows.foreachPartition { (it: Iterator[Row]) =>
      val client = clientFactory()
      try it.grouped(batchSize).foreach { batch =>
        client.putAll(batch.map(r => (s"$prefix:${r.getString(0)}", r.getString(1))))
      } finally client.close()
    }
  }

  /** In-memory JVM-local client for tests/local mode (one shared store per
    * JVM — in `local[*]` executors share the driver JVM, so tests can read
    * back what partitions wrote).
    */
  object InMemory {
    val store = new ConcurrentHashMap[String, String]()
    def factory: () => KvClient = () => new KvClient {
      def putAll(batch: Seq[(String, String)]): Unit =
        batch.foreach { case (k, v) => store.put(k, v) }
      def close(): Unit = ()
    }
  }
}

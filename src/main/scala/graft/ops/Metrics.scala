package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conditional-count aggregation + zero-filled metric struct per client
  * (SURVEY §2.5 A3 + A4).
  */
object Metrics {

  /** Count RETRY / TIMEOUT / ERROR log events per client over the
    * correlated (clientId, logEventType) rows (reference
    * `src/batch_tlb.py:72-77`). `sum(when(..))` compiles to a partial +
    * final hash aggregate — map-side combine for free.
    */
  def conditionalCounts(correlated: DataFrame, key: String = "clientId"): DataFrame =
    correlated
      .groupBy(col(key))
      .agg(
        count_if(col("logEventType") === "RETRY").as("retry_count"),
        count_if(col("logEventType") === "TIMEOUT").as("timeout_count"),
        count_if(col("logEventType") === "ERROR").as("error_count"))

  /** Zero-fill: every client in the event universe gets a row; untriggered
    * metrics stay 0 (reference defaultdict, `src/batch_tlb.py:38`; golden
    * client2 `page_view_time: 0`). Inner joins would silently drop quiet
    * clients, so the universe left-joins each metric source.
    *
    * (Deliberate simplification vs the reference artifact: the reference's
    * defaultdict only materializes clients *touched* by some metric; we
    * zero-fill every client present in the event stream, which coincides on
    * the golden fixtures and is the useful semantic.)
    */
  def zeroFill(clients: DataFrame, sessions: DataFrame, counts: DataFrame, key: String = "clientId"): DataFrame =
    clients
      .select(col(key)).distinct()
      .join(sessions, Seq(key), "left")
      .join(counts, Seq(key), "left")
      .na.fill(0.0, Seq("page_view_time"))
      .na.fill(0L, Seq("retry_count", "timeout_count", "error_count"))
}

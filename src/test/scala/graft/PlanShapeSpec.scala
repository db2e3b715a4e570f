package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ops.{Chunking, Dedup, Repetition}

/** Plan-shape assertions pinning the scale CONTRACTS of the corpus
  * operators — not what they compute, but what they shuffle. A regression
  * that starts moving document bodies through an exchange passes every
  * value test and silently becomes a 100 TB problem; these tests fail it.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleOutputs(df: DataFrame): Seq[Set[String]] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p: SparkPlan             => p
    }
    plan.collect { case e: ShuffleExchangeExec => e.output.map(_.name).toSet }
  }

  private val docs =
    (1 to 50).map(i => (i.toLong, s"word$i " * 40)).toDF("doc_id", "text")

  test("chunking shuffles nothing at all") {
    assert(shuffleOutputs(Chunking.byWords(docs, 32, 8)).isEmpty)
  }

  test("repetition signals never shuffle text or token arrays") {
    val shuffles = shuffleOutputs(Repetition.signals(docs))
    assert(shuffles.nonEmpty) // the bigram aggregation must shuffle…
    shuffles.foreach { out => // …but only ids/hashes/counts, never bodies
      assert(!out.contains("text") && !out.contains("__w"), s"body column in shuffle: $out")
    }
  }

  test("exact dedup shuffles only (fingerprint, id) — never document text") {
    val shuffles = shuffleOutputs(Dedup.exact(docs))
    assert(shuffles.nonEmpty)
    shuffles.foreach { out =>
      assert(!out.contains("text"), s"document text in shuffle: $out")
    }
  }

  test("minhash LSH shuffles signatures and bands — never text or shingle sets") {
    val shuffles = shuffleOutputs(Dedup.minhashLsh(docs, minJaccard = 0.2))
    assert(shuffles.nonEmpty)
    shuffles.foreach { out =>
      assert(!out.contains("text") && !out.contains("sh"), s"body column in shuffle: $out")
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** [[graft.plans.EditDistanceGuardRule]]: the injected length guard must
  * appear in optimized plans (filters AND join conditions), appear
  * exactly once (fixed-point idempotence), and never change results.
  * Inputs come through `spark.range` so ConvertToLocalRelation cannot
  * constant-fold the filters away before the plan is inspected.
  */
class OptimizerRuleSpec extends SparkSpec {
  import spark.implicits._

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def guardCount(df: DataFrame): Int =
    "abs\\(\\(length\\(".r.findAllIn(optimized(df).toLowerCase).size

  private val nameList = Seq("martha", "marhta", "marthaX", "ma", "dwayne", "duane")

  // non-foldable name table: id → name via element_at on a literal array
  private def names: DataFrame =
    spark.range(nameList.size)
      .select(col("id"), element_at(
        array(nameList.map(lit): _*), (col("id") + 1).cast("int")).as("s"))

  test("filter on levenshtein <= k gains exactly one length guard") {
    val df = names.filter(levenshtein(col("s"), lit("martha")) <= 2)
    assert(guardCount(df) == 1, optimized(df))
  }

  test("filter on graft damerau <= k gains the guard; results unchanged") {
    val guarded = names.filter(TextFunctions.damerau(col("s"), lit("martha")) <= 2)
    assert(guardCount(guarded) == 1, optimized(guarded))
    // semantics: same ids as evaluating the kernel directly
    val expected = nameList.zipWithIndex.filter { case (s, _) =>
      graft.functions.expressions.StringKernels.damerauLevenshtein(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.unsafe.types.UTF8String.fromString("martha")) <= 2
    }.map(_._2.toLong).toSet
    assert(guarded.select("id").as[Long].collect().toSet == expected)
    assert(expected.contains(1L)) // marhta: transposition costs 1 under DL
  }

  test("join conditions gain the guard too — pruning before the DP") {
    val a = names.select(col("id").as("ida"), col("s").as("sa"))
    val b = names.select(col("id").as("idb"), col("s").as("sb"))
    val j = a.join(b, levenshtein(col("sa"), col("sb")) <= 1 && col("ida") < col("idb"))
    assert(guardCount(j) >= 1, optimized(j))
    // martha↔marthaX (one insert) is the only levenshtein-1 pair here
    assert(j.select("ida", "idb").as[(Long, Long)].collect().toSet == Set((0L, 2L)))
  }

  test("thresholded 3-arg levenshtein is left alone (it already bails out)") {
    val df = names.filter(levenshtein(col("s"), lit("martha"), 2) <= 2)
    assert(guardCount(df) == 0, optimized(df))
  }

  test("reversed spelling k >= dist is guarded as well") {
    val df = names.filter(lit(2) >= levenshtein(col("s"), lit("martha")))
    assert(guardCount(df) == 1, optimized(df))
  }
}

package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows share one hot key — the shape salting exists for.
  private lazy val fact = (1 to 1000)
    .map(i => (if (i <= 900) 1L else i.toLong, i))
    .toDF("k", "payload")
  private lazy val dim = Seq((1L, "hot"), (950L, "cold"), (999L, "cold"))
    .toDF("dk", "name")

  test("salted join returns exactly the plain inner-join result") {
    val plain = fact.join(dim, $"k" === $"dk").select("k", "payload", "name")
    val salted = SkewJoin.salted(fact, dim, "k", "dk").select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot key spreads across multiple salt sub-keys") {
    val nSalts = 8
    val spread = fact.where($"k" === 1L)
      .withColumn("__salt", pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
      .select("__salt").distinct().count()
    assert(spread > 1, s"expected the hot key to hash to >1 salt bucket, got $spread")
  }

  test("approx_count_distinct stays within its 5% relative-error spec") {
    val df = (1 to 20000).map(i => i % 5000).toDF("v")
      .agg(approx_count_distinct($"v").as("approx"), count_distinct($"v").as("exact"))
      .head()
    val (approx, exact) = (df.getLong(0), df.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }
}

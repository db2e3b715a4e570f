package graft

import org.apache.spark.sql.functions._
import graft.ops.Trend

/** Integer least-squares trend (round 3). */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("slope num/den reproduce the least-squares slope on known data") {
    // y = 3x + 7 exactly → slope 3: num/den must equal 3 with den > 0
    val rows = (1L to 10L).map(x => ("g", x, 3 * x + 7))
    val r = Trend.linear(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y")).head()
    assert(r.getAs[Long]("slope_num") == 3 * r.getAs[Long]("slope_den"))
    assert(r.getAs[Long]("slope_den") > 0 && r.getAs[Long]("trend") == 1L)
  }

  test("sign matches a double-precision reference on random series; constant x gives 0/0") {
    val rnd = new scala.util.Random(29)
    val rows = for (g <- 0 until 20; i <- 0 until 15)
      yield (s"g$g", i.toLong, (rnd.nextInt(2000) - 1000).toLong)
    val got = Trend.linear(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("slope_num"),
        r.getAs[Long]("slope_den"), r.getAs[Long]("trend"))).toMap
    rows.groupBy(_._1).foreach { case (g, pts) =>
      val n = pts.size.toDouble
      val sx = pts.map(_._2).sum.toDouble; val sy = pts.map(_._3).sum.toDouble
      val sxy = pts.map(p => p._2 * p._3).sum.toDouble
      val sxx = pts.map(p => p._2 * p._2).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (num, den, trend) = got(g)
      assert(den > 0)
      assert(math.abs(num.toDouble / den.toDouble - slope) < 1e-9, g)
      assert(trend == math.signum(slope).toLong || (slope == 0.0 && trend == 0L), g)
    }
    // degenerate group: all x equal → 0/0, trend 0
    val deg = Trend.linear(Seq(("d", 5L, 1L), ("d", 5L, 9L)).toDF("g", "x", "y"),
      Seq("g"), col("x"), col("y")).head()
    assert(deg.getAs[Long]("slope_num") == 0L && deg.getAs[Long]("slope_den") == 0L
      && deg.getAs[Long]("trend") == 0L)
  }
}

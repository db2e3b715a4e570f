package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.functions.Sketches.CMSketch

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(depth: Int = 4, width: Int = 64) =
    CMSketch(depth, width, new Array[Long](depth * width))

  test("count-min never undercounts and is exact without collisions") {
    val sk = fresh(width = 1024)
    val stream = Seq.fill(50)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    stream.foreach(sk.add)
    assert(sk.estimate("alpha") >= 50 && sk.estimate("beta") >= 7 && sk.estimate("gamma") >= 1)
    // 3 distinct terms in 1024 columns: collisions astronomically unlikely
    assert(sk.estimate("alpha") == 50 && sk.estimate("beta") == 7)
    assert(sk.estimate("never-seen") == 0)
  }

  test("count-min merge order is irrelevant (elementwise addition)") {
    val rnd = new scala.util.Random(3)
    val stream = Seq.fill(500)(s"t${rnd.nextInt(40)}")
    val whole = fresh(); stream.foreach(whole.add)
    val (s1, s2) = stream.splitAt(137)
    val a = fresh(); s1.foreach(a.add)
    val b = fresh(); s2.foreach(b.add)
    val merged = a.mergeWith(b)
    (0 until 40).foreach { i =>
      assert(merged.estimate(s"t$i") == whole.estimate(s"t$i"))
    }
  }

  test("count-min as a Spark UDAF matches the local sketch") {
    val rnd = new scala.util.Random(9)
    val terms = Seq.fill(2000)(s"w${rnd.nextInt(30)}")
    val queryTerms = Seq("w0", "w7", "w29", "missing")
    val local = fresh(4, 256)
    terms.foreach(local.add)
    val cm = udaf(new Sketches.CountMinAgg(4, 256, queryTerms))
    val viaSpark = terms.toDF("term").repartition(8)
      .agg(cm(col("term")).as("e"))
      .select(col("e.estimates")).as[Seq[Long]].head()
    assert(viaSpark == queryTerms.map(local.estimate))
  }
}

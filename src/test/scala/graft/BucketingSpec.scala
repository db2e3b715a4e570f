package graft

import graft.io.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables sort-merge join with zero exchanges") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("rk", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", 4, sortCols = Seq("k"))
    Bucketing.writeBucketed(right, "bkt_right", "rk", 4, sortCols = Seq("rk"))
    try {
      // Force SMJ so the test can't silently pass via a broadcast join.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", "k", "rk")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.linesIterator.exists(_.contains("Exchange")),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("bucketed aggregation on the bucket key also skips the shuffle") {
    val df = (1 to 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bkt_agg", "k", 4)
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("total"))
      assert(agg.count() === 50)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.linesIterator.exists(_.contains("Exchange")),
        s"bucket-key aggregation must not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_agg")
    }
  }

  test("hour-partitioned layout prunes an hour-filtered read at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hourpart").toString
    val df = (0 until 240).map(i => (i.toLong, s"2024111${6 + i % 3}%02d".format(i % 24).take(10), s"e$i"))
      .toDF("id", "hour", "payload")
    graft.io.Io.writeHourPartitioned(df, dir)
    val hour = df.select("hour").as[String].head()
    val read = graft.io.Io.readHour(spark, dir, hour)
    assert(read.count() === df.where(col("hour") === hour).count())
    val scan = read.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.nonEmpty, "hour filter must become a PartitionFilter")
    // pruned listing: only the selected hour's directory is read
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .forall(_.files.forall(_.getPath.toString.contains(s"hour=$hour"))))
  }
}

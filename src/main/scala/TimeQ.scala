import org.apache.spark.sql.SparkSession

/** Scratch timing harness for ad-hoc per-query profiling during
  * development (edit the query list, `sbt 'runMain TimeQ'`) — the bench
  * proper is [[graft.Bench]].
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq("q305_spanning_forest")
    for (name <- names) {
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.min}%.2f s")
    }
    spark.stop()
  }
}

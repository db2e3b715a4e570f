package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.io.Io

class IoSpec extends SparkSpec {

  test("lenient JSON read quarantines malformed rows instead of failing") {
    val dir = Files.createTempDirectory("graft_lenient")
    Files.write(Paths.get(dir.toString, "data.json"), Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2, "name": "also ok"}""",
      """{"id": 3, "name": TRUNCATED""", // malformed
      """not json at all""").mkString("\n").getBytes)
    val schema = new StructType().add("id", LongType).add("name", StringType)
    val df = Io.readJsonLenient(spark, dir.toString, schema)
    val good = Io.goodRecords(df).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good == Set((1L, "ok"), (2L, "also ok")))
    val bad = Io.corruptRecords(df).select("_corrupt_record")
      .collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"id": 3, "name": TRUNCATED""", "not json at all"))
  }

  test("compaction collapses a many-file dataset, preserving every row") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString + "/c"
    // 40 tiny files
    (1 to 2000).map(i => (i.toLong, s"row $i")).toDF("id", "v")
      .repartition(40).write.mode("overwrite").parquet(in)
    val before = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(before == 40)
    Io.compact(spark, in, out, targetBytes = 1L << 20)
    val after = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(after < before, s"expected fewer files, got $after")
    val got = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1)
    assert(got.length == 2000 && got.head == ((1L, "row 1")) && got.last == ((2000L, "row 2000")))
  }
}

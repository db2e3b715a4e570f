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
}

package graft

import graft.jobs.TlbMetrics

/** Golden E2E: reproduce the reference's only committed expected result,
  * `output/tlb_metrics/2024111612.json` (SURVEY §5.2-1). Pins sessionization
  * reset semantics, 3-way correlation, conditional counts, and zero-fill.
  */
class TlbMetricsSpec extends SparkSpec {

  test("TLB metrics match the reference golden output for hour 2024111612") {
    val dir = new java.io.File(TestSpark.resource("user_exp_2024111612.json")).getParent
    val got = TlbMetrics.fromJson(spark, dir, "2024111612")
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val expected = Map(
      "client1" -> ((120.0, 0L, 0L, 0L)),
      "client2" -> ((0.0, 0L, 1L, 1L)),
      "client3" -> ((125.0, 1L, 0L, 0L)))
    assert(got == expected)
  }

  test("K3 writer reproduces the reference output file byte-for-byte") {
    val goldenPath = TestSpark.resource("tlb_metrics_2024111612.json")
    val dir = new java.io.File(TestSpark.resource("user_exp_2024111612.json")).getParent
    val metrics = TlbMetrics.fromJson(spark, dir, "2024111612")
    val rendered = TlbMetrics.toGoldenObjectJson(metrics)
    val golden = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(goldenPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(rendered == golden)
    // and the filesystem writer round-trips the same bytes
    val out = java.nio.file.Files.createTempDirectory("tlb").resolve("m.json")
    TlbMetrics.writeGoldenJson(metrics, out.toString)
    assert(new String(java.nio.file.Files.readAllBytes(out),
      java.nio.charset.StandardCharsets.UTF_8) == golden)
  }
}

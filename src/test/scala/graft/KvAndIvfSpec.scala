package graft

import org.apache.spark.sql.functions._
import graft.io.KvSink
import graft.ops.Similarity

class KvAndIvfSpec extends SparkSpec {
  import spark.implicits._

  test("KV sink writes prefixed batched entries via foreachPartition") {
    KvSink.InMemory.store.clear()
    val mapping = Seq(("t1", "c1"), ("t2", "c2"), ("t3", null))
      .toDF("key", "clientId")
      .select(col("key"), struct(col("clientId")).as("value"))
    KvSink.write(mapping, "trace_to_client", KvSink.InMemory.factory, batchSize = 2)
    import scala.jdk.CollectionConverters._
    val got = KvSink.InMemory.store.asScala.toMap
    assert(got("trace_to_client:t1") == """{"clientId":"c1"}""")
    assert(got("trace_to_client:t2") == """{"clientId":"c2"}""")
    assert(got("trace_to_client:t3") == "{}") // null dropped by to_json, like reference json.dumps of {} — key still present
    assert(got.size == 3)
  }

  test("IVF top-k finds the planted neighbor when probing its centroid") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.98f, 0.2f, 0.0f)),
      (3L, Seq(0.9f, 0.4f, 0.1f)),
      (4L, Seq(0.0f, 1.0f, 0.0f)),
      (5L, Seq(0.1f, 0.95f, 0.0f)),
      (6L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val centroids = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),
      (200L, Seq(0.0f, 1.0f, 0.0f)),
      (300L, Seq(0.0f, 0.0f, 1.0f))).toDF("centroid_id", "embedding")
    val queries = vecs.where(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = Similarity.ivfTopK(vecs, queries, centroids, k = 2, nProbe = 1)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    // probing only centroid 100's partition: neighbors 2 and 3
    assert(got == Seq(2L, 3L))
  }

  test("IVF with a 1k-centroid broadcast codebook: plan stays flat, assignment exact") {
    // Centroid c lives at angle θ_c on the unit circle (padded to 4 dims);
    // a corpus/query vector near θ_c must assign to centroid c exactly.
    val n = 1000
    def at(theta: Double): Seq[Float] =
      Seq(math.cos(theta).toFloat, math.sin(theta).toFloat, 0.0f, 0.0f)
    val centroids = (0 until n).map(c => (c.toLong, at(c * 2 * math.Pi / n)))
      .toDF("centroid_id", "embedding")
    val corpus = (0 until n).map(c => (c.toLong, at((c + 0.05) * 2 * math.Pi / n)))
      .toDF("vec_id", "embedding")
    val queries = Seq((9999L, at(0.1 * 2 * math.Pi / n))).toDF("query_id", "embedding")
    val out = Similarity.ivfTopK(corpus, queries, centroids, k = 3, nProbe = 2)
    // the plan must reference a broadcast codebook, not 1000 inline vectors
    val planText = out.queryExecution.analyzed.toString
    assert(planText.length < 20000, s"plan inflated: ${planText.length} chars")
    // query sits in centroid 0's cell and probes cell 1 second; each cell
    // holds exactly its own corpus vector → candidates are vecs 0 and 1,
    // nearest first
    val got = out.orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L), s"expected ring neighbors 0,1 — got $got")
  }

  test("int8 quantization: bounded range, zero-vector safe, cosine preserved") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(40)(Seq.fill(64)(rnd.nextFloat() * 2 - 1)) :+ Seq.fill(64)(0.0f)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      .withColumn("max_abs", graft.functions.VectorFunctions.maxAbs(col("embedding")))
      .withColumn("q", graft.functions.VectorFunctions.quantizeInt8(col("embedding"), col("max_abs")))
    val rows = df.select(
      array_min(col("q")), array_max(col("q")),
      graft.functions.VectorFunctions.cosine(
        col("embedding").cast("array<double>"),
        col("q").cast("array<double>")).as("cos")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= -127L && r.getLong(1) <= 127L)
      // dequantization is a positive per-vector rescale, so cosine against
      // the quantized ints directly measures quantization error
      val c = r.getDouble(2)
      assert(c == 0.0 || c > 0.999, s"cosine degraded: $c")
    }
  }
}

package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** Streaming sessionization must agree with the batch golden: feeding the
  * reference fixture through a file stream yields the same per-client
  * page-view totals (client1 120 s, client3 125 s), and a second
  * micro-batch proves pending-start state carries across batches.
  */
class StreamingSpec extends SparkSpec {

  test("file-stream sessionization matches the batch golden totals") {
    val in = Files.createTempDirectory("graft_stream_in")
    // JSON-lines version of the fixture (file streams are line-oriented)
    val fixture = spark.read.option("multiLine", value = true)
      .schema(graft.model.Schemas.userExp)
      .json(TestSpark.resource("user_exp_2024111612.json"))
    fixture.coalesce(1).write.mode("overwrite").json(in.toString + "/batch")
    val q = StreamingOps.sessionPairs(StreamingOps.userExpStream(spark, in.toString + "/batch"))
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val totals = spark.table("sessions")
      .groupBy("clientId").agg(sum("durationSec").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(totals == Map("client1" -> 120.0, "client3" -> 125.0))
  }

  test("pending start carries across micro-batches via state store") {
    val in = Files.createTempDirectory("graft_stream_state")
    def write(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(in.toString, name), lines.mkString("\n").getBytes)
    // batch 1: a lone start
    write("b1.json", Seq(
      """{"clientId":"c9","timestamp":"2024-11-16T10:00:00Z","eventType":"page_view_start","eventId":"s1"}"""))
    val q = StreamingOps.sessionPairs(StreamingOps.userExpStream(spark, in.toString))
      .writeStream.outputMode("append").format("memory").queryName("sessions2")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    assert(spark.table("sessions2").count() == 0)
    // batch 2: the matching end arrives later
    write("b2.json", Seq(
      """{"clientId":"c9","timestamp":"2024-11-16T10:00:42Z","eventType":"page_view_end","eventId":"e1"}"""))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sessions2").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("c9", 42.0)))
  }

  test("streaming OHLC candles: open/close by event time across out-of-order batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Long, Long)]
    // (key, epochSec, tie, value): second batch arrives EARLIER in event
    // time — min_by/max_by state must still pick the true open/close
    val df = mem.toDF().toDF("k", "sec", "tie", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = StreamingOps.ohlcStream(df, "k", "ts", "tie", "v",
        windowLen = "1 hour", lateness = "10 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("ohlc_s").start()
    mem.addData(("a", 1000L, 1L, 50L), ("a", 1400L, 2L, 10L))
    q.processAllAvailable()
    mem.addData(("a", 500L, 3L, 30L), ("a", 1400L, 1L, 99L)) // same-ts tie: tie=1 beats tie=2
    q.processAllAvailable(); q.stop()
    val r = spark.table("ohlc_s").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("volume") == 4L)
    assert(row.getAs[Long]("open") == 30L)   // sec 500 arrived last but opens
    assert(row.getAs[Long]("high") == 99L && row.getAs[Long]("low") == 10L)
    // both closers share sec 1400 → the (ts, tie) struct order decides:
    // (1400, 2) > (1400, 1), so close is the tie=2 row's value
    assert(row.getAs[Long]("close") == 10L)
  }

  test("hourly watermarked counts bucket events into tumbling windows") {
    val in = Files.createTempDirectory("graft_stream_win")
    val fixture = spark.read.option("multiLine", value = true)
      .schema(graft.model.Schemas.userExp)
      .json(TestSpark.resource("user_exp_2024111612.json"))
      .withColumn("timestamp", to_timestamp(col("timestamp")))
    fixture.coalesce(1).write.mode("overwrite").parquet(in.toString)
    val stream = spark.readStream.schema(fixture.schema).parquet(in.toString)
    val q = StreamingOps.hourlyCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("hourly")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hourly")
      .collect().map(r => (r.getTimestamp(0).toInstant.toString, r.getString(1), r.getLong(2))).toSet
    // all 15 fixture events fall in the 12:00 hour: 10 starts, 4 ends, 1 error
    assert(got.map(_._1).forall(_ == "2024-11-16T12:00:00Z"))
    assert(got.map(x => x._2 -> x._3).toMap == Map(
      "page_view_start" -> 10L, "page_view_end" -> 4L, "error" -> 1L))
  }

  test("batch Enrich op works unchanged as a stream-static broadcast join") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_stream_enrich")
    Seq(("t1", "a"), ("t2", "b"), ("t3", "c")).toDF("traceId", "payload")
      .coalesce(1).write.mode("overwrite").parquet(in.toString)
    val mapping = Seq(("t1", "client1"), ("t3", "client3"))
      .toDF("key", "clientId")
      .select(col("key"), struct(col("clientId")).as("value"))
    val stream = spark.readStream
      .schema("traceId STRING, payload STRING").parquet(in.toString)
    val q = graft.ops.Enrich(stream, mapping, "traceId")
      .writeStream.outputMode("append").format("memory").queryName("enriched")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enriched").collect()
      .map(r => (r.getString(0), Option(r.getString(2)))).toSet
    assert(got == Set(("t1", Some("client1")), ("t2", None), ("t3", Some("client3"))))
  }

  test("watermarked streaming dedup drops repeats within the horizon") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_stream_dedup")
    def write(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(in.toString, name), lines.mkString("\n").getBytes)
    write("b1.json", Seq(
      """{"eventId":"e1","ts":"2024-11-16T10:00:00Z"}""",
      """{"eventId":"e1","ts":"2024-11-16T10:00:01Z"}""",
      """{"eventId":"e2","ts":"2024-11-16T10:00:02Z"}"""))
    val stream = spark.readStream
      .schema("eventId STRING, ts STRING").json(in.toString)
      .withColumn("ts", to_timestamp(col("ts")))
    val q = StreamingOps.dedupStream(stream, Seq("eventId"), "ts")
      .writeStream.outputMode("append").format("memory").queryName("deduped")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    assert(spark.table("deduped").select("eventId").as[String].collect().sorted.toSeq
      === Seq("e1", "e2"))
    // a later duplicate of e1 still inside the watermark horizon is dropped
    write("b2.json", Seq("""{"eventId":"e1","ts":"2024-11-16T10:05:00Z"}"""))
    q.processAllAvailable(); q.stop()
    assert(spark.table("deduped").count() === 2)
  }

  test("stream-stream correlation joins events to traces within the time bound") {
    val in = Files.createTempDirectory("graft_stream_ss")
    def write(sub: String, name: String, lines: Seq[String]): Unit = {
      Files.createDirectories(Paths.get(in.toString, sub))
      Files.write(Paths.get(in.toString, sub, name), lines.mkString("\n").getBytes)
    }
    write("ev", "b1.json", Seq(
      """{"eventId":"e1","traceId":"t1","timestamp":"2024-11-16T10:00:00Z"}""",
      """{"eventId":"e2","traceId":"t2","timestamp":"2024-11-16T10:00:00Z"}"""))
    write("tr", "b1.json", Seq(
      """{"traceId":"t1","traceTs":"2024-11-16T10:20:00Z","server":"s1"}""",
      // t2's trace arrives 3 h after the event — outside the 1 h bound
      """{"traceId":"t2","traceTs":"2024-11-16T13:00:00Z","server":"s2"}"""))
    val ev = spark.readStream.schema("eventId STRING, traceId STRING, timestamp STRING")
      .json(in.toString + "/ev").withColumn("timestamp", to_timestamp(col("timestamp")))
    val tr = spark.readStream.schema("traceId STRING, traceTs STRING, server STRING")
      .json(in.toString + "/tr").withColumn("traceTs", to_timestamp(col("traceTs")))
    val q = StreamingOps.correlateStreams(ev, tr)
      .writeStream.outputMode("append").format("memory").queryName("correlated")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("correlated").select("eventId", "server").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("e1", "s1")))
  }

  test("streaming corpus intake composes: parse → gate → dedup → rate-cap") {
    val in = Files.createTempDirectory("graft_stream_corpus")
    def doc(source: String, sec: Int, text: String) =
      s"""{"source":"$source","ts":"2024-11-16T10:00:${"%02d".format(sec)}Z","text":"$text"}"""
    Files.write(Paths.get(in.toString, "b1.json"), (Seq(
      doc("hot", 1, "a perfectly fine training document one"),
      doc("hot", 2, "a perfectly fine training document two"),
      doc("hot", 3, "A  Perfectly Fine Training Document Two"), // near-dup of #2 (fingerprint)
      doc("hot", 4, "a perfectly fine training document three"),
      doc("hot", 5, "a perfectly fine training document four"), // 4th distinct hot doc — over cap 3
      doc("cold", 6, "another acceptable document"),
      doc("cold", 7, "short")) // gated: under min length
      ).mkString("\n").getBytes)
    import spark.implicits._
    val parsed = spark.readStream
      .schema("source STRING, ts STRING, text STRING")
      .json(in.toString)
      .select(col("source"), to_timestamp(col("ts")).as("ts"), col("text"))
      .where(length(col("text")) >= 10) // stateless quality gate
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
    val deduped = StreamingOps.dedupStream(parsed, Seq("fp"), "ts")
      .select("source", "ts", "text").as[(String, java.sql.Timestamp, String)]
    val capped = StreamingOps.rateLimitTyped[(String, java.sql.Timestamp, String)](
      deduped, _._1, _._2, "ts", windowMillis = 60000L, maxPerWindow = 3,
      lateness = null) // watermark set once by dedupStream upstream
    val q = capped.toDF("source", "ts", "text")
      .writeStream.outputMode("append").format("memory").queryName("intake")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("intake").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hot: 4 distinct after near-dup removal, capped at 3; cold: 1 (short gated)
    assert(got == Map("hot" -> 3L, "cold" -> 1L))
  }

  test("rateLimit admits at most n events per key per window, state carries across batches") {
    val in = Files.createTempDirectory("graft_stream_cap")
    def write(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(in.toString, name), lines.mkString("\n").getBytes)
    def line(key: String, sec: Int) =
      s"""{"key":"$key","ts":"2024-11-16T10:00:${"%02d".format(sec)}Z"}"""
    // batch 1: 3 events for hot in minute-window 0; 1 for cold
    write("b1.json", (0 to 2).map(line("hot", _)) :+ line("cold", 5))
    import spark.implicits._
    val stream = spark.readStream
      .schema("key STRING, ts STRING")
      .json(in.toString)
      .select(col("key"), to_timestamp(col("ts")).as("ts"))
      .as[StreamingOps.KeyedEvent]
    val q = StreamingOps.rateLimit(stream, windowMillis = 60000L, maxPerWindow = 4)
      .writeStream.outputMode("append").format("memory").queryName("capped")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    // batch 2: 5 more hot events in the SAME window — only 1 more fits the cap
    write("b2.json", (10 to 14).map(line("hot", _)))
    q.processAllAvailable(); q.stop()
    val counts = spark.table("capped").groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("hot" -> 4L, "cold" -> 1L))
  }

  test("columnProfileStream maintains running per-column stats across micro-batches") {
    val in = Files.createTempDirectory("graft_stream_prof")
    def write(name: String, rows: Seq[(Long, java.lang.Long)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (a, b) => s"""{"a":$a,"b":${Option(b).map(_.toString).getOrElse("null")}}""" }
          .mkString("\n").getBytes)
    write("b1.json", Seq((1L, 10L), (2L, null)))
    val stream = spark.readStream.schema("a LONG, b LONG").json(in.toString)
    val q = StreamingOps.columnProfileStream(stream, Seq("a", "b"))
      .writeStream.outputMode("complete").format("memory").queryName("prof")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    def profile(): Map[String, (Long, Long, Long, Long, Long)] =
      spark.table("prof").collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(profile() == Map(
      "a" -> ((2L, 0L, 1L, 2L, 3L)),
      "b" -> ((2L, 1L, 10L, 10L, 10L))))
    // batch 2 merges into the state store — stats are cumulative, not per-batch
    write("b2.json", Seq((5L, 4L)))
    q.processAllAvailable(); q.stop()
    assert(profile() == Map(
      "a" -> ((3L, 0L, 1L, 5L, 8L)),
      "b" -> ((3L, 1L, 4L, 10L, 14L))))
    // and the SAME code path profiles a batch frame (no streaming machinery)
    import spark.implicits._
    val batch = Seq((1L, Option(10L)), (2L, None), (5L, Option(4L))).toDF("a", "b")
    val got = StreamingOps.columnProfileStream(batch, Seq("a", "b")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == profile())
  }

  test("srmMonitorStream: chi-square updates per micro-batch, gate flips when the split breaks") {
    val in = Files.createTempDirectory("graft_stream_srm")
    def write(name: String, rows: Seq[(Long, Boolean)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (u, t) => s"""{"u":$u,"t":$t}""" }.mkString("\n").getBytes)
    // balanced first batch: 50/50
    write("b1.json", (0L until 100L).map(u => (u, u < 50)))
    val stream = spark.readStream.schema("u LONG, t BOOLEAN").json(in.toString)
    val q = StreamingOps.srmMonitorStream(stream, org.apache.spark.sql.functions.col("t"))
      .writeStream.outputMode("complete").format("memory").queryName("srm")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    def state(): (Long, Long, Long, Boolean) = {
      val r = spark.table("srm").head()
      (r.getAs[Long]("n_t"), r.getAs[Long]("n_c"), r.getAs[Long]("chisq_milli"),
        r.getAs[Boolean]("srm_suspect"))
    }
    assert(state() == ((50L, 50L, 0L, false)))
    // treatment leg silently stops logging → counts skew, gate flips
    write("b2.json", (100L until 160L).map(u => (u, false)))
    q.processAllAvailable(); q.stop()
    val (nt, nc, chisq, suspect) = state()
    assert(nt == 50L && nc == 110L)
    assert(chisq == (1000L * 60 * 60) / 160 && suspect)
    // same code path on a batch frame
    import spark.implicits._
    val batch = StreamingOps.srmMonitorStream(
      ((0L until 50L).map((_, true)) ++ (50L until 160L).map((_, false))).toDF("u", "t"),
      org.apache.spark.sql.functions.col("t")).head()
    assert(batch.getAs[Long]("chisq_milli") == chisq)
  }

  test("heavyHittersStream: bounded state, exact counts while under capacity, bounds after eviction") {
    val in = Files.createTempDirectory("graft_stream_hh")
    def write(name: String, items: Seq[String]): Unit =
      Files.write(Paths.get(in.toString, name),
        items.map(i => s"""{"item":"$i"}""").mkString("\n").getBytes)
    // one shard so eviction is observable; capacity 2
    write("b1.json", Seq("a", "a", "b"))
    import spark.implicits._
    val stream = spark.readStream.schema("item STRING").json(in.toString)
      .select(col("item")).as[String]
    val q = StreamingOps.heavyHittersStream(stream, capacity = 2, shards = 1)
      .writeStream.outputMode("update").format("memory").queryName("hh")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    val afterB1 = spark.table("hh").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    // under capacity: exact, zero error
    assert(afterB1 == Map("a" -> (2L, 0L), "b" -> (1L, 0L)))
    // batch 2: c arrives at full capacity → evicts min (b, count 1):
    // c.count = 2 (overestimate), c.err = 1; a += 1 exact
    write("b2.json", Seq("c", "a"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("hh").collect().map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3)))
    val latest = rows.groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
    assert(latest("a") == (("a", 3L, 0L)))
    assert(latest("c") == (("c", 2L, 1L)))
    // state never exceeded capacity: the final emission has exactly 2 items
    assert(rows.length == 4, s"expected 2 counters per batch emission: ${rows.toSeq}")
  }

  test("decayedScoreStream carries the lag window across micro-batches") {
    val in = Files.createTempDirectory("graft_stream_decay")
    def write(name: String, rows: Seq[(String, Long)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (k, v) => s"""{"k":"$k","v":$v}""" }.mkString("\n").getBytes)
    write("b1.json", Seq(("u1", 1L), ("u1", 2L)))
    import spark.implicits._
    val stream = spark.readStream.schema("k STRING, v LONG").json(in.toString)
      .select(col("k"), col("v")).as[(String, Long)]
    val q = StreamingOps.decayedScoreStream(stream, lags = 2)
      .writeStream.outputMode("update").format("memory").queryName("decay")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    val afterB1 = spark.table("decay").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recent = [2, 1]: 2·4 + 1·2 = 10, 2 obs this batch
    assert(afterB1("u1") == ((10L, 2L)))
    // batch 2 continues the SAME window: recent = [3, 2, 1] → 12+4+1 = 17
    write("b2.json", Seq(("u1", 3L)))
    q.processAllAvailable(); q.stop()
    val latest = spark.table("decay").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(latest.contains(("u1", 17L, 1L)), s"got: ${latest.toSeq}")
  }

  test("debounceStream admits only events >= gap after the last ADMITTED one, across batches") {
    val in = Files.createTempDirectory("graft_stream_debounce")
    def write(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(in.toString, name), lines.mkString("\n").getBytes)
    def line(key: String, sec: Int) =
      s"""{"key":"$key","ts":"2024-11-16T10:00:${"%02d".format(sec)}Z"}"""
    // burst at 0s,5s,9s with 10s gap: only 0s survives batch 1
    write("b1.json", Seq(line("k", 0), line("k", 5), line("k", 9)))
    import spark.implicits._
    val stream = spark.readStream
      .schema("key STRING, ts STRING")
      .json(in.toString)
      .select(col("key"), to_timestamp(col("ts")).as("ts"))
      .as[StreamingOps.KeyedEvent]
    val q = StreamingOps.debounceStream(stream, minGapMs = 10000L)
      .writeStream.outputMode("append").format("memory").queryName("debounced")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    // batch 2: 8s after last KEPT (0s) → dropped even though it is 8s
    // after the last SEEN (9s, dropped); 12s → kept
    write("b2.json", Seq(line("k", 8), line("k", 12)))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("debounced").collect()
      .map(_.getAs[java.sql.Timestamp]("ts").toInstant.toString).sorted
    assert(kept.toSeq == Seq("2024-11-16T10:00:00Z", "2024-11-16T10:00:12Z"))
  }

  test("Kafka value parsing works over a MemoryStream — everything but the socket") {
    // Binary `value` payloads, exactly the shape the Kafka connector emits;
    // one malformed record must become a null-struct row, not kill the query.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
    mem.addData(
      """{"clientId":"c1","eventType":"page_view_start","eventId":"e1"}""".getBytes("UTF-8"),
      """{"clientId":"c2","eventType":"error","eventId":"e2"}""".getBytes("UTF-8"),
      "not json at all".getBytes("UTF-8"))
    val parsed = graft.streaming.KafkaSource.parseJsonValues(
      mem.toDF().select(col("value")),
      org.apache.spark.sql.types.StructType.fromDDL(
        "clientId STRING, eventType STRING, eventId STRING"))
    val q = parsed.writeStream.outputMode("append").format("memory")
      .queryName("kafka_parsed").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("kafka_parsed").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(rows == Set(
      (Some("c1"), Some("page_view_start")),
      (Some("c2"), Some("error")),
      (None, None)))
  }

  test("Kafka connector leg lights up by itself when the jar appears (runtime-gated)") {
    // The spark-sql-kafka jar is absent from this environment (offline
    // build, not in /opt/spark/jars). Detect it via reflection: when a
    // future environment ships it, this test automatically starts
    // exercising the real `format("kafka")` source resolution + plan;
    // until then it cancels with a named reason instead of silently
    // passing. Posture documented in README "Kafka connector".
    val connectorPresent =
      try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "clientId STRING, eventType STRING, eventId STRING")
    if (connectorPresent) {
      // No broker needed for plan-level verification: source resolution,
      // streaming-ness and the parsed schema all happen before connect.
      val df = graft.streaming.KafkaSource.jsonStream(
        spark, "localhost:9092", "events", schema, startingOffsets = "earliest")
      assert(df.isStreaming)
      assert(df.schema.fieldNames.toSeq == Seq("clientId", "eventType", "eventId"))
    } else {
      // Without the jar, Spark must fail at SOURCE RESOLUTION with its
      // standard "Failed to find data source" guidance — the error a real
      // user hits first, so pin that it surfaces cleanly (not a deep NPE).
      val e = intercept[Exception] {
        graft.streaming.KafkaSource.jsonStream(spark, "localhost:9092", "events", schema)
      }
      assert(e.getMessage.toLowerCase.contains("kafka"))
      cancel("spark-sql-kafka connector not on classpath — live leg environmentally blocked; " +
        "parse path covered by the MemoryStream test above")
    }
  }

  test("hllRegisterStream: registers after two micro-batches equal the batch sketch") {
    val in = Files.createTempDirectory("graft_stream_hll")
    def write(name: String, rows: Seq[(String, String)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (g, v) => s"""{"g":"$g","v":"$v"}""" }.mkString("\n").getBytes)
    val batch1 = (1 to 40).map(i => ("en", s"tok$i")) ++ (1 to 15).map(i => ("de", s"wort$i"))
    val batch2 = (30 to 70).map(i => ("en", s"tok$i")) // overlaps batch1: max-fold must be idempotent
    write("b1.json", batch1)
    import spark.implicits._
    val stream = spark.readStream.schema("g STRING, v STRING").json(in.toString)
      .select(col("g"), col("v")).as[(String, String)]
    val q = StreamingOps.hllRegisterStream(stream, b = 4)
      .writeStream.outputMode("update").format("memory").queryName("hllregs")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    write("b2.json", batch2)
    q.processAllAvailable(); q.stop()
    // latest emission per (group, bucket) — mapGroupsWithState re-emits
    // the full register set of touched groups each batch; take the max
    // (registers are monotone) to read the final state
    val got = spark.table("hllregs").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val all = batch1 ++ batch2
    for (g <- Seq("en", "de")) {
      val want = graft.ops.Sketch.hllRegisters(
        all.filter(_._1 == g).map(_._2).toDF("v"), "v", b = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val gotG = got.collect { case ((`g`, bk), reg) => (bk, reg) }.toMap
      assert(gotG == want, s"group $g stream registers diverge from batch")
    }
    // and the sketch-only estimate over the stream's registers replays
    val streamEn = got.collect { case (("en", bk), reg) => (bk, reg) }.toSeq
      .toDF("bucket", "register")
    val estStream = graft.ops.Sketch.hllEstimate(streamEn, b = 4).head()
    val estBatch = graft.ops.Sketch.hllEstimate(
      graft.ops.Sketch.hllRegisters(
        all.filter(_._1 == "en").map(_._2).toDF("v"), "v", b = 4), b = 4).head()
    assert(estStream == estBatch)
  }

  test("countMinCellStream: cell table after two micro-batches equals the batch counters") {
    val in = Files.createTempDirectory("graft_stream_cm")
    def write(name: String, items: Seq[String]): Unit =
      Files.write(Paths.get(in.toString, name),
        items.map(i => s"""{"item":"$i"}""").mkString("\n").getBytes)
    val b1 = Seq("a", "a", "b", "c", "a")
    val b2 = Seq("b", "d", "a", "d")
    write("b1.json", b1)
    import spark.implicits._
    val stream = spark.readStream.schema("item STRING").json(in.toString)
      .select(col("item")).as[String]
    val q = StreamingOps.countMinCellStream(stream, rows = 3, width = 16)
      .writeStream.outputMode("update").format("memory").queryName("cmcells")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    write("b2.json", b2)
    q.processAllAvailable(); q.stop()
    // latest emission per cell = max count (counts are monotone)
    val got = spark.table("cmcells").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    // batch counter table over the union, via the op's own hash contract
    val want = (b1 ++ b2)
      .flatMap(v => (0L until 3L).map(r => (r, md5p32(s"$v:$r") % 16)))
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(got == want)
    // the count-min estimate for the heaviest item upper-bounds exactly
    // as in batch: min over its probed cells >= true count
    val aCells = (0L until 3L).map(r => (r, md5p32(s"a:$r") % 16))
    val est = aCells.map(got).min
    assert(est >= 4L)
  }

  test("hammingPairsStream: distinct stream pairs equal the batch op over each prefix") {
    val in = Files.createTempDirectory("graft_stream_ham")
    def write(name: String, rows: Seq[(Long, Long)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (id, h) => s"""{"id":$id,"h":$h}""" }.mkString("\n").getBytes)
    val far = 0x7F00FF00FF00FF0FL
    val b1 = Seq((1L, 0L), (2L, 1L), (3L, far), (4L, 3L))
    // batch 2: a cross-batch exact duplicate of id 3 (state must pair it),
    // a new near neighbor, a re-arrival of id 2 (must be inert), and a
    // single-bit value near the batch-1 cluster
    val b2 = Seq((5L, Long.MinValue), (6L, 2L), (7L, far), (2L, 1L))
    write("b1.json", b1)
    import spark.implicits._
    val stream = spark.readStream.schema("id LONG, h LONG").json(in.toString)
      .select(col("id"), col("h")).as[(Long, Long)]
    val q = StreamingOps.hammingPairsStream(stream, maxHamming = 3, bands = 8, maxBucket = 64)
      .writeStream.outputMode("update").format("memory").queryName("hampairs")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    def emitted() = spark.table("hampairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def batchPairs(rows: Seq[(Long, Long)]) =
      graft.ops.Dedup.hammingPairs(rows.distinct.toDF("id", "hash"),
        maxHamming = 3, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(emitted() == batchPairs(b1), "prefix 1 diverges from batch")
    write("b2.json", b2)
    q.processAllAvailable(); q.stop()
    val all = emitted()
    assert(all == batchPairs(b1 ++ b2), "full stream diverges from batch")
    assert(all.contains((3L, 7L, 0L)), "cross-batch exact duplicate must pair via state")
  }

  test("crawl admission Columns are streaming-safe: robots + canonicalize on a stream equal batch") {
    val in = Files.createTempDirectory("graft_stream_crawl")
    val rows = Seq(
      ("""{"url":"HTTP://A.Example.co.uk:80/x/?utm_source=f&b=2","path":"/dir/ok"}"""),
      ("""{"url":"https://b.github.io/p","path":"/private/x"}"""),
      ("""{"url":"https://c.ne.jp/q#frag","path":"/open"}"""))
    Files.write(Paths.get(in.toString, "b1.json"), rows.mkString("\n").getBytes)
    import spark.implicits._
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Urls.canonicalize(
        graft.ops.Robots.filterAllowed(
          df.withColumn("robots", lit("User-agent: *\nDisallow: /private"))))
        .select(col("url"), col("canonical_url"), col("registered_domain"), col("allowed"))
    val stream = spark.readStream.schema("url STRING, path STRING").json(in.toString)
    val q = pipeline(stream)
      .writeStream.outputMode("append").format("memory").queryName("crawladm")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("crawladm").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3))).toSet
    val want = pipeline(
      spark.read.schema("url STRING, path STRING").json(in.toString)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3))).toSet
    assert(got == want, "stream and batch disagree on the admission pipeline")
    assert(want.exists(_._4 == false) && want.exists(_._4 == true))
    assert(want.exists(_._2 == "http://a.example.co.uk/x?b=2"))
  }

  private def md5p32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)

  test("prioritySampleStream: sample after two micro-batches equals the batch op") {
    val in = Files.createTempDirectory("graft_stream_pri")
    def write(name: String, rows: Seq[(String, Long, Long)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (g, id, w) => s"""{"g":"$g","id":$id,"w":$w}""" }.mkString("\n").getBytes)
    val b1 = (1L to 25L).map(i => ("en", i, 10L + i % 7))
    val b2 = (26L to 60L).map(i => ("en", i, 5L + i % 11)) ++
      (1L to 4L).map(i => ("de", 1000L + i, 3L * i))
    write("b1.json", b1)
    import spark.implicits._
    val stream = spark.readStream.schema("g STRING, id LONG, w LONG").json(in.toString)
      .select(col("g"), col("id"), col("w")).as[(String, Long, Long)]
    val q = StreamingOps.prioritySampleStream(stream, k = 8)
      .writeStream.outputMode("update").format("memory").queryName("prisample")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    write("b2.json", b2)
    q.processAllAvailable(); q.stop()
    // latest emission per group: batch 2 re-emits every touched group,
    // and "de" only exists in batch 2 — compare each group's final
    // sample to the BATCH op over that group's full row set
    val rowsAll = spark.table("prisample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for (g <- Seq("en", "de")) {
      val all = (b1 ++ b2).filter(_._1 == g)
      val want = graft.ops.Sampling.prioritySample(
        all.map { case (_, id, w) => (id, w) }.toDF("doc_id", "weight"),
        k = 8, weightCol = "weight")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      // the stream emits per batch; the FINAL state is the last emission —
      // reconstruct it as the batch-op-sized subset with max est_weight
      // per id (est_weight only grows as tau grows)
      val got = rowsAll.filter(_._1 == g)
        .groupBy(_._2).map { case (_, vs) => vs.maxBy(_._4) }
        .toSeq.sortBy(-_._4).map(t => (t._2, t._3, t._4)).toSet
      // final emission ids = want ids; est_weight of the final emission
      // must match — filter got to the batch sample's ids
      assert(got.filter(t => want.exists(_._1 == t._1)) == want,
        s"group $g stream sample diverges: got=$got want=$want")
    }
  }

  test("politenessStream: one-batch schedule equals the batch op; slots continue across batches") {
    val in = Files.createTempDirectory("graft_stream_polite")
    def write(name: String, rows: Seq[(String, Long)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (u, p) => s"""{"url":"$u","pri":$p}""" }.mkString("\n").getBytes)
    // canonical-form URLs (lowercase hosts, no tracking params): the
    // batch op's canonicalization is an identity on them, so the two
    // legs schedule the same frontier
    val b1 = Seq(("http://a.com/p1", 10L), ("http://a.com/p2", 30L),
      ("http://a.com/p3", 30L), ("http://b.com/x", 5L))
    val b2 = Seq(("http://a.com/p4", 99L), ("http://b.com/y", 1L))
    write("b1.json", b1)
    import spark.implicits._
    val stream = spark.readStream.schema("url STRING, pri LONG").json(in.toString)
      .select(regexp_extract(col("url"), "^http://([^/]*)", 1), col("url"), col("pri"))
      .as[(String, String, Long)]
    val q = StreamingOps.politenessStream(stream, delayMs = 250L, maxPerHost = 3)
      .writeStream.outputMode("update").format("memory").queryName("polite")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    def emitted() = spark.table("polite").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // prefix 1 arrives as ONE micro-batch → the per-batch priority sort
    // must reproduce the batch op's schedule exactly
    val want1 = graft.ops.Crawl.politenessSchedule(
      b1.toDF("url", "priority"), delayMs = 250L, maxPerHost = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(emitted() == want1, "single-batch stream schedule diverges from the batch op")
    write("b2.json", b2)
    q.processAllAvailable(); q.stop()
    val later = emitted() -- want1
    // batch 2: a.com already granted 3 of 3 lifetime slots → p4 drops
    // despite its priority; b.com continues from slot 1
    assert(later == Set(("b.com", "http://b.com/y", 1L, 250L)),
      s"cross-batch continuation wrong: $later")
  }

  test("streaming frontier composite: canonicalize + robots + politeness equal the batch chain") {
    val in = Files.createTempDirectory("graft_stream_frontier")
    val rows = Seq(
      """{"url":"HTTP://A.Com:80/p1?utm_source=f&z=1","path":"/p1","pri":10}""",
      """{"url":"http://a.com/p2","path":"/p2","pri":30}""",
      """{"url":"http://a.com/private/x","path":"/private/x","pri":99}""",
      """{"url":"https://b.com/y","path":"/y","pri":5}""")
    Files.write(Paths.get(in.toString, "b1.json"), rows.mkString("\n").getBytes)
    import spark.implicits._
    def admit(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Urls.canonicalize(
        graft.ops.Robots.filterAllowed(
          df.withColumn("robots", lit("User-agent: *\nDisallow: /private"))))
        .where(col("allowed") && col("canonical_url").isNotNull)
    val stream = admit(
      spark.readStream.schema("url STRING, path STRING, pri LONG").json(in.toString))
      .select(col("host"), col("canonical_url"), col("pri"))
      .as[(String, String, Long)]
    val q = StreamingOps.politenessStream(stream, delayMs = 100L)
      .writeStream.outputMode("update").format("memory").queryName("frontier")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("frontier").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = spark.read.schema("url STRING, path STRING, pri LONG").json(in.toString)
    val want = graft.ops.Crawl.politenessSchedule(
      admit(batch).select(col("url"), col("pri").as("priority")), delayMs = 100L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"stream frontier diverges from batch: $got vs $want")
    assert(got.exists(_._2 == "http://a.com/p1?z=1"), "tracking param must strip en route")
    assert(!got.exists(_._2.contains("private")), "robots admission must hold on the stream")
  }

  test("crawl control loop: change state -> recrawl priority -> politeness equals the batch composite") {
    val in = Files.createTempDirectory("graft_stream_loop")
    def write(name: String, rows: Seq[(String, Long, String)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (u, t, h) => s"""{"url":"$u","ts":$t,"h":"$h"}""" }
          .mkString("\n").getBytes)
    def u(h: Int, p: Int) = s"http://h$h.test/p$p"
    // two hosts, four URLs, mixed change histories (static, flapping,
    // single-fetch) — canonical-form URLs so politeness' canonicalization
    // is an identity on them
    val b1 = Seq(
      (u(0, 1), 10L, "a"), (u(0, 1), 20L, "b"), (u(0, 1), 30L, "b"),
      (u(0, 2), 15L, "x"), (u(0, 2), 25L, "y"),
      (u(1, 1), 5L, "s"),
      (u(1, 2), 8L, "t"), (u(1, 2), 18L, "t"))
    val b2 = Seq((u(0, 1), 40L, "c"), (u(1, 2), 28L, "u"))
    val asOf = 1000L
    import spark.implicits._
    // robots Crawl-delay hints: h0's URLs hint 300 ms, h1 has no opinion
    val hints = Seq((u(0, 1), 300L), (u(0, 2), 300L)).toDF("url", "delay_ms")
    val schedules = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(String, String, Long, Long, Long)])]
    write("b1.json", b1)
    val stream = spark.readStream.schema("url STRING, ts LONG, h STRING").json(in.toString)
      .select(col("url"), col("ts"), col("h")).as[(String, Long, String)]
    val q = StreamingOps.crawlSchedulerStream(stream, asOfMs = Some(asOf),
      delayHints = hints, defaultDelayMs = 100L, maxPerHost = 10) { (sched, bid) =>
      val rows = sched.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      if (rows.nonEmpty) schedules += ((bid, rows))
    }.trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    // the batch composite over a history prefix, restricted to `urls`
    def want(history: Seq[(String, Long, String)], urls: Set[String]) = {
      val pri = graft.ops.Crawl.recrawlPriority(
        history.toDF("url", "ts_ms", "content_hash"), asOfMs = asOf)
        .where(col("url").isin(urls.toSeq: _*))
      graft.ops.Crawl.politenessScheduleWithDelays(
        pri.join(hints, Seq("url"), "left")
          .select(col("url"), col("priority"), col("delay_ms")),
        defaultDelayMs = 100L, maxPerHost = 10)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    }
    // prefix 1 in ONE micro-batch → the loop's schedule IS the batch
    // composite politenessScheduleWithDelays ∘ recrawlPriority
    assert(schedules.size == 1,
      s"expected one non-empty round after batch 1, got ${schedules.size}")
    assert(schedules.head._2 == want(b1, b1.map(_._1).toSet),
      s"round-1 schedule diverges from the batch composite:\n${schedules.head._2}\nvs\n${want(b1, b1.map(_._1).toSet)}")
    // delay hints must actually space h0's slots at 300 ms
    assert(schedules.head._2.filter(_._1 == "h0.test").map(_._4).max == 300L)
    write("b2.json", b2)
    q.processAllAvailable(); q.stop()
    // round 2 re-schedules the URLs batch 2 touched, with counters
    // CONTINUED from the state store: priorities equal the full-history
    // batch op restricted to those URLs
    assert(schedules.size == 2, s"expected two rounds, got ${schedules.size}")
    assert(schedules(1)._2 == want(b1 ++ b2, b2.map(_._1).toSet),
      s"round-2 schedule diverges from the full-history composite:\n${schedules(1)._2}\nvs\n${want(b1 ++ b2, b2.map(_._1).toSet)}")
  }

  test("crawl control loop steady state: per-batch as-of keeps ages non-negative and ranks changers first") {
    val in = Files.createTempDirectory("graft_stream_loop_ss")
    def u(p: Int) = s"http://ss.test/p$p"
    // one flapping URL, one static URL, same host — with a frozen
    // launch-time as-of this history (timestamps arbitrarily large)
    // would rank the STATIC page first; the derived as-of must not
    val rows = Seq(
      (u(1), 1000000L, "a"), (u(1), 1000100L, "b"), (u(1), 1000200L, "c"),
      (u(2), 1000000L, "s"), (u(2), 1000100L, "s"), (u(2), 1000300L, "s"))
    Files.write(Paths.get(in.toString, "b1.json"),
      rows.map { case (url, t, h) => s"""{"url":"$url","ts":$t,"h":"$h"}""" }
        .mkString("\n").getBytes)
    import spark.implicits._
    val hints = Seq.empty[(String, Long)].toDF("url", "delay_ms")
    var sched = Set.empty[(String, Long, Long)]
    val stream = spark.readStream.schema("url STRING, ts LONG, h STRING").json(in.toString)
      .select(col("url"), col("ts"), col("h")).as[(String, Long, String)]
    val q = StreamingOps.crawlSchedulerStream(stream, asOfMs = None,
      delayHints = hints, defaultDelayMs = 100L, maxPerHost = 10) { (s, _) =>
      sched = s.collect().map(r => (r.getString(1), r.getLong(2), r.getLong(4))).toSet
    }.trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable(); q.stop()
    assert(sched.nonEmpty)
    // priorities never negative, and the flapping page outranks the
    // static one (which is fresher AND unchanged → priority 0)
    val byUrl = sched.map(t => t._1 -> t._2).toMap
    assert(byUrl.values.forall(_ >= 0L), s"negative priority in $sched")
    assert(byUrl(u(1)) > byUrl(u(2)),
      s"changing page must outrank the static one: $byUrl")
    // flapper first slot, static second
    assert(sched.find(_._1 == u(1)).get._3 == 0L)
    assert(sched.find(_._1 == u(2)).get._3 == 100L)
  }

  test("warcFileStream: landed .warc.gz files explode to records incrementally; corrupt files drop") {
    import graft.functions.BinaryCodecs
    val in = Files.createTempDirectory("graft_stream_warc")
    def mkFile(name: String, texts: Seq[(Long, String)]): Unit = {
      val recs = texts.map { case (id, t) =>
        (Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"https://w/$id") , t.getBytes("UTF-8"))
      }
      Files.write(Paths.get(in.toString, name), BinaryCodecs.warcFile(recs))
    }
    mkFile("c-00000.warc.gz", Seq((0L, "first page"), (1L, "second page")))
    val q = StreamingOps.warcFileStream(spark, in.toString)
      .writeStream.outputMode("append").format("memory").queryName("warcin")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    def rows() = spark.table("warcin").collect()
      .map(r => (r.getString(3), new String(r.getAs[Array[Byte]](6), "UTF-8")))
      .toSet
    assert(rows() == Set(("https://w/0", "first page"), ("https://w/1", "second page")))
    // a later batch adds a good file and a corrupt one — the good file's
    // records land, the corrupt file quarantines silently
    mkFile("c-00001.warc.gz", Seq((2L, "third page")))
    Files.write(Paths.get(in.toString, "c-00002.warc.gz"), "not a warc".getBytes)
    q.processAllAvailable(); q.stop()
    assert(rows() == Set(("https://w/0", "first page"), ("https://w/1", "second page"),
      ("https://w/2", "third page")))
  }

  test("corpus ingest stream: warc -> http -> charset -> main content -> simhash dedup equals batch") {
    import graft.functions.BinaryCodecs
    import graft.ops.{Dedup, Html, Warc}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_stream_ingest")
    // HTTP-wrapped pages, the q394 charset legs: odd ids latin-1 via the
    // transport declaration, even ids BOM'd UTF-16LE. Ids sharing id/3
    // carry identical prose, so clusters pair at hamming 0.
    def page(id: Long): (Seq[(String, String)], Array[Byte]) = {
      import java.nio.charset.StandardCharsets._
      val prose = s"shared cluster ${id / 3} prose line with caf\u00e9 and enough characters to survive extraction"
      val html = s"<html><head><title>t$id</title></head><body>\n<p>$prose</p>\n</body></html>"
      val (ct, body) =
        if (id % 2 == 1) ("text/html; charset=iso-8859-1", html.getBytes(ISO_8859_1))
        else ("text/html", Array(0xFF.toByte, 0xFE.toByte) ++ html.getBytes(UTF_16LE))
      val msg = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n").getBytes(US_ASCII) ++ body
      (Seq("WARC-Type" -> "response", "WARC-Target-URI" -> s"https://w/$id"), msg)
    }
    def mkFile(name: String, ids: Seq[Long]): Unit =
      Files.write(Paths.get(in.toString, name), BinaryCodecs.warcFile(ids.map(page)))
    mkFile("c-0.warc.gz", Seq(0L, 1L, 2L, 3L))
    // the LIVE chain — every stage is the batch operator, streaming
    def chainToHashes(pages: org.apache.spark.sql.DataFrame) =
      Dedup.simhashText(
        Html.mainContent(pages)
          .select(regexp_extract(col("target_uri"), "([0-9]+)$", 1).cast("long").as("doc_id"),
            col("main_text").as("text")))
        .select(col("id"), col("simhash")).as[(Long, Long)]
    val hashes = chainToHashes(Warc.decodePages(
      StreamingOps.warcFileStream(spark, in.toString)).toDF())
    val q = StreamingOps.hammingPairsStream(hashes, maxHamming = 3, bands = 8, maxBucket = 64)
      .writeStream.outputMode("update").format("memory").queryName("ingestdedup")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    def emitted() = spark.table("ingestdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the batch composite over the same directory (q394's chain + q353's op)
    def batchPairs(): Set[(Long, Long, Long)] = {
      val media = spark.read.format("binaryFile").load(in.toString)
        .select(xxhash64(col("path")).as("media_id"), lit("warc").as("kind"),
          col("content").as("payload"), lit("application/warc").as("mime_type"),
          col("length").as("size_bytes"))
        .as[graft.ops.Multimodal.MediaRow]
      Dedup.hammingPairs(
        chainToHashes(Warc.decodePages(Warc.parseWarc(media)).toDF())
          .toDF("id", "hash"),
        maxHamming = 3, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val prefix1 = emitted()
    assert(prefix1 == batchPairs(), "prefix 1 diverges from the batch composite")
    assert(prefix1.contains((0L, 1L, 0L)) || prefix1.contains((1L, 2L, 0L)),
      "cluster 0 must pair — the two charset legs decoded to different text")
    // second arrival: ids 4-5 extend cluster 1 (id 3's), plus a file that
    // QUARANTINES mid-stream — it must be inert on both sides
    mkFile("c-1.warc.gz", Seq(4L, 5L))
    Files.write(Paths.get(in.toString, "c-2.warc.gz"),
      BinaryCodecs.warcFile(Seq(page(99L))).dropRight(3))
    q.processAllAvailable(); q.stop()
    val all = emitted()
    assert(all == batchPairs(), "full stream diverges from batch (the corrupt file must be inert)")
    assert(all.contains((3L, 4L, 0L)), "cross-batch near-dup must pair via state")
    assert(!all.exists(p => p._1 == 99L || p._2 == 99L), "the quarantined file leaked records")
  }

  test("cdxj sidecar stream: lines equal a batch re-index at every arrival; WAT envelopes match the writer") {
    import graft.functions.BinaryCodecs
    import graft.ops.{Html, Warc}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_stream_cdxj")
    def page(id: Long): (Seq[(String, String)], Array[Byte]) = {
      val html = s"<html><head><title>T$id</title></head><body><p>body $id</p></body></html>"
      (Seq("WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:rec:$id>",
        "WARC-Date" -> "2024-01-01T00:00:00Z",
        "WARC-Target-URI" -> s"https://host${id % 3}.example.com/p/$id"),
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html).getBytes("UTF-8"))
    }
    def mkFile(name: String, ids: Seq[Long]): Unit =
      Files.write(Paths.get(in.toString, name), BinaryCodecs.warcFile(ids.map(page)))
    mkFile("c-0.warc.gz", Seq(0L, 1L, 2L))
    val q = StreamingOps.cdxjStream(spark, in.toString)
      .writeStream.outputMode("append").format("memory").queryName("cdxj")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    def streamed() = spark.table("cdxj").select("cdxj_line")
      .collect().map(_.getString(0)).toSet
    def batchLines() = Warc.toCdxjFiles(
      spark.read.format("binaryFile").load(in.toString)
        .select(regexp_extract(col("path"), "[^/]+$", 0).as("filename"),
          col("content").as("payload")))
      .select("cdxj_line").collect().map(_.getString(0)).toSet
    val p1 = streamed()
    assert(p1 == batchLines() && p1.size == 3, "prefix 1 diverges from the batch re-index")
    assert(p1.forall(l => l.contains("\"filename\":\"c-0.warc.gz\"") &&
      l.startsWith("com,example,host")))
    // second arrival plus a file that QUARANTINES — inert on both sides
    mkFile("c-1.warc.gz", Seq(3L, 4L))
    Files.write(Paths.get(in.toString, "c-2.warc.gz"), "not a warc".getBytes)
    q.processAllAvailable(); q.stop()
    assert(streamed() == batchLines(), "full stream diverges from batch re-index")
    assert(streamed().size == 5, "the quarantined file leaked index lines")
    // the lines are REAL random-access pointers: every streamed
    // (filename, offset, length) slices its landed file to a standalone
    // one-record parse of the named URI
    spark.table("cdxj").select("filename", "offset", "length", "url").collect()
      .foreach { r =>
        val bytes = Files.readAllBytes(Paths.get(in.toString, r.getString(0)))
        val slice = bytes.slice(r.getLong(1).toInt, (r.getLong(1) + r.getLong(2)).toInt)
        val rec = BinaryCodecs.warcRecords(slice).get
        assert(rec.length == 1 && rec.head.targetUri == r.getString(3))
      }
    // WAT sidecar leg: envelopes emitted INCREMENTALLY off the ingest
    // stream (the shared watEnvelope column) equal the batch container
    // writer's payload bytes for the same pages
    def pageMeta(df: org.apache.spark.sql.DataFrame) = df
      .select(regexp_extract(col("target_uri"), "([0-9]+)$", 1).cast("long").as("doc_id"),
        col("target_uri").as("uri"), col("status"),
        lit("text/html").as("content_type"),
        Html.title(col("html")).as("title"),
        Html.metaContent(col("html"), "description").as("meta_desc"),
        Html.baseHref(col("html")).as("base"),
        Html.extractLinks(col("html")).as("links"))
    val watQ = pageMeta(Warc.decodePages(
      StreamingOps.warcFileStream(spark, in.toString)).toDF())
      .select(col("doc_id"), Warc.watEnvelope.as("env"))
      .writeStream.outputMode("append").format("memory").queryName("watenv")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    watQ.processAllAvailable(); watQ.stop()
    val streamedEnv = spark.table("watenv").as[(Long, String)].collect().toMap
    val media = spark.read.format("binaryFile").load(in.toString)
      .select(xxhash64(col("path")).as("media_id"), lit("warc").as("kind"),
        col("content").as("payload"), lit("application/warc").as("mime_type"),
        col("length").as("size_bytes"))
      .as[graft.ops.Multimodal.MediaRow]
    val viaContainer = Warc.parseWarc(
      Warc.toWat(pageMeta(Warc.decodePages(Warc.parseWarc(media)).toDF())))
      .toDF()
      .where(col("warc_type") === "metadata")
      .select(regexp_extract(col("target_uri"), "([0-9]+)$", 1).cast("long"),
        col("payload").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(streamedEnv == viaContainer,
      "live WAT envelopes diverge from the container writer's bytes")
    assert(streamedEnv.size == 5 && streamedEnv(3L).contains("\"title\":\"T3\""))
  }

  test("changeDetectStream: flags equal the batch lag replay; counters survive batches") {
    val in = Files.createTempDirectory("graft_stream_chg")
    def write(name: String, rows: Seq[(String, Long, String)]): Unit =
      Files.write(Paths.get(in.toString, name),
        rows.map { case (u, t, h) =>
          val hv = if (h == null) "null" else s""""$h""""
          s"""{"url":"$u","ts":$t,"h":$hv}"""
        }.mkString("\n").getBytes)
    val b1 = Seq(("u1", 10L, "a"), ("u1", 20L, "a"), ("u1", 30L, "b"), ("u2", 5L, "x"))
    // u2's null hash: a null on either side is NO change (batch parity)
    val b2 = Seq(("u1", 40L, "b"), ("u1", 50L, "c"), ("u2", 15L, null),
      ("u2", 25L, "x"), ("u3", 1L, "z"))
    write("b1.json", b1)
    import spark.implicits._
    val stream = spark.readStream.schema("url STRING, ts LONG, h STRING").json(in.toString)
      .select(col("url"), col("ts"), col("h")).as[(String, Long, String)]
    val q = StreamingOps.changeDetectStream(stream)
      .writeStream.outputMode("update").format("memory").queryName("chg")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    write("b2.json", b2)
    q.processAllAvailable(); q.stop()
    val got = spark.table("chg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    // the batch replay: changed = hash differs from the previous fetch,
    // null on either side never counts (the =!= null-propagation rule)
    def chg(a: String, b: String) = a != null && b != null && a != b
    val want = (b1 ++ b2).groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      rows.sortBy(_._2).zipWithIndex.map { case ((_, ts, h), i) =>
        val prev = rows.sortBy(_._2).take(i).lastOption.map(_._3)
        val changes = rows.sortBy(_._2).take(i + 1).sliding(2)
          .count(w => w.size == 2 && chg(w(0)._3, w(1)._3))
        (u, ts, prev.exists(chg(_, h)), (i + 1).toLong, changes.toLong)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want,
      s"stream change log diverges from the batch lag replay:\n$got\nvs\n$want")
  }

  test("archive media triage at stream grain: landed archives triage ≡ batch, mislabels flagged live") {
    import spark.implicits._
    import graft.functions.{BinaryCodecs => C}
    val in = Files.createTempDirectory("graft_stream_triage")
    def msg(ct: String, body: Array[Byte], gz: Boolean): Array[Byte] = {
      val ce = if (gz) "Content-Encoding: gzip\r\n" else ""
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n$ce\r\n").getBytes("US-ASCII") ++
        (if (gz) C.gzip(body) else body)
    }
    def mkFile(name: String, recs: Seq[(Long, Array[Byte])]): Unit =
      Files.write(Paths.get(in.toString, name), C.warcFile(recs.map { case (id, p) =>
        (Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"https://m/$id"), p)
      }))
    val bmp = C.bmp(6, 4, "px".getBytes)
    val wav = C.wav(8000, Array.tabulate(40)(_.toShort))
    mkFile("t-0.warc.gz", Seq(
      (0L, msg("image/bmp", bmp, gz = false)),
      (1L, msg("audio/wav", wav, gz = true))))
    // the whole chain is map-side, so the batch composite runs VERBATIM
    // on the stream — one code path (the warcFileStream design rule)
    val q = graft.ops.Multimodal.archiveMediaTriage(
      graft.ops.Warc.httpResponses(StreamingOps.warcFileStream(spark, in.toString)))
      .writeStream.outputMode("append").format("memory").queryName("triage")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    def streamed() = spark.table("triage").collect()
      .map(r => (r.getAs[String]("target_uri"), r.getAs[String]("format"),
        if (r.isNullAt(r.fieldIndex("type_matches"))) null
        else r.getAs[Boolean]("type_matches"))).toSet
    assert(streamed() == Set(
      ("https://m/0", "bmp", true), ("https://m/1", "wav", true)))
    // arrival 2: a mislabel and a no-verdict row surface LIVE
    mkFile("t-1.warc.gz", Seq(
      (2L, msg("image/png", bmp, gz = false)),
      (3L, msg("text/html", "<p>x</p>".getBytes, gz = false))))
    q.processAllAvailable(); q.stop()
    assert(streamed() == Set(
      ("https://m/0", "bmp", true), ("https://m/1", "wav", true),
      ("https://m/2", "bmp", false), ("https://m/3", "unknown", null)))
    // equality with the batch path over the same landed files
    val media = spark.read.format("binaryFile").load(in.toString)
      .select(xxhash64(col("path")).as("media_id"), lit("warc").as("kind"),
        col("content").as("payload"), lit("application/warc").as("mime_type"),
        col("length").as("size_bytes"))
      .as[graft.ops.Multimodal.MediaRow]
    val batch = graft.ops.Multimodal.archiveMediaTriage(
      graft.ops.Warc.httpResponses(graft.ops.Warc.parseWarc(media)))
      .collect()
      .map(r => (r.getAs[String]("target_uri"), r.getAs[String]("format"),
        if (r.isNullAt(r.fieldIndex("type_matches"))) null
        else r.getAs[Boolean]("type_matches"))).toSet
    assert(streamed() == batch, "stream triage diverges from the batch re-run")
  }

  test("discoveryFrontierStream: per-arrival schedules equal the batch composite; quarantined candidates inert") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_stream_frontier")
    // page rows from an id formula (single-quoted HTML attrs keep the
    // JSON lines quote-free): one good anchor, one /private anchor, one
    // relative anchor, a feed declaration, and a robots sitemap pointer
    def pageJson(id: Long): String = {
      val html = s"<a href='https://h${id % 3}.example.org/page${id % 5}'>x</a>" +
        s"<a href='https://h${id % 3}.example.org/private/p${id % 2}'>y</a>" +
        s"<a href='/local/l${id % 4}'>z</a>" +
        s"<link rel='alternate' type='application/rss+xml' href='/feed${id % 2}.xml'>" +
        (if (id == 99) "<a href='http://'>bad</a>" else "")
      s"""{"doc_id":$id,"page_url":"https://site${id % 2}.test/dir/idx.html",""" +
        s""""html":"$html",""" +
        s""""robots":"User-agent: *\\nSitemap: https://s${id % 3}.test/sm.xml"}"""
    }
    def write(name: String, ids: Seq[Long]): Unit =
      Files.write(Paths.get(in.toString, name),
        ids.map(pageJson).mkString("\n").getBytes)
    // static file sets: s0 plain, s1 gzip'd, s2 CORRUPT (quarantines,
    // contributes nothing); feed0 fetched, feed1 never fetched
    val smXml = (v: Int) => s"<urlset><url><loc>https://h$v.example.org/sm/$v</loc></url></urlset>"
    val smFiles = Seq(
      ("https://s0.test/sm.xml", smXml(0).getBytes("UTF-8")),
      ("https://s1.test/sm.xml", graft.functions.BinaryCodecs.gzip(smXml(1).getBytes("UTF-8"))),
      ("https://s2.test/sm.xml", Array[Byte](0x1f, 0x8b.toByte, 9, 9, 9))
    ).toDF("url", "payload")
    val feedFiles = Seq(
      ("https://site0.test/feed0.xml",
        "<rss><channel><item><link>https://h7.example.org/feed/1</link></item></channel></rss>"
          .getBytes("UTF-8"))).toDF("url", "payload")
    val policy = "User-agent: *\nDisallow: /private"
    // the batch composite over the pages seen so far — the SAME ops the
    // stream runs (discoveryAdmitted + politenessSchedule), so equality
    // here proves the two paths cannot diverge
    def want(ids: Seq[Long]) = {
      val pages = spark.read.schema(
        "doc_id LONG, page_url STRING, html STRING, robots STRING")
        .json(ids.map(pageJson).toDS())
      graft.ops.Crawl.politenessSchedule(
        graft.ops.Crawl.discoveryAdmitted(pages, smFiles, feedFiles, lit(policy))
          .groupBy(col("url")).agg(count(lit(1)).as("priority")),
        delayMs = 100L, maxPerHost = 3)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    val schedules = scala.collection.mutable.Map.empty[Long, Set[(String, String, Long, Long)]]
    val b1 = (0L until 8L).toSeq
    val b2 = Seq(8L, 9L, 10L, 11L, 99L) // 99 carries the unparseable URL
    write("b1.json", b1)
    val pagesStream = spark.readStream
      .schema("doc_id LONG, page_url STRING, html STRING, robots STRING")
      .json(in.toString)
    val q = StreamingOps.discoveryFrontierStream(
      pagesStream, smFiles, feedFiles, lit(policy),
      delayMs = 100L, maxPerHost = 3) { (sched, bid) =>
      val rows = sched.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      if (rows.nonEmpty) schedules(bid) = rows
    }.trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    q.processAllAvailable()
    val round1 = schedules(schedules.keys.max)
    assert(round1 == want(b1),
      s"round-1 schedule diverges from the batch composite:\n$round1\nvs\n${want(b1)}")
    // sanity on the fixture itself: /private admitted nowhere, the
    // quarantined s2 sitemap and unfetched feed1 contribute nothing
    assert(round1.nonEmpty && !round1.exists(_._2.contains("/private/")))
    assert(!round1.exists(_._2.contains("s2")) && !round1.exists(_._2.contains("feed/2")))
    // discoveries ACCUMULATE: arrival 2 (including the quarantined-URL
    // page) re-emits the frontier over BOTH arrivals
    write("b2.json", b2)
    q.processAllAvailable(); q.stop()
    val round2 = schedules(schedules.keys.max)
    assert(round2 == want(b1 ++ b2),
      s"round-2 schedule diverges from the accumulated batch composite:\n$round2\nvs\n${want(b1 ++ b2)}")
    assert(round2 != round1, "arrival 2 must change the frontier")
  }
}

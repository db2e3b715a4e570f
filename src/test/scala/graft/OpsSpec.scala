package graft

import org.apache.spark.sql.functions._
import graft.model.SessionEvent
import graft.ops.{Dedup, DotPath, Enrich, Mappings, Sessionize, Similarity}
import graft.functions.{TextFunctions, VectorFunctions}

/** Per-operator unit tests pinning the reference's edge-case semantics
  * (SURVEY §5.2-2): session pairing resets, enrichment miss-passthrough,
  * extraction null-skipping, array fan-out, last-write-wins.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def sessionTotal(events: Seq[(String, String, String)]): Map[String, Double] = {
    // (clientId, ts, eventType)
    val df = events.zipWithIndex
      .map { case ((c, ts, et), i) => (c, java.sql.Timestamp.from(java.time.Instant.parse(ts)), et, s"e$i") }
      .toDF("clientId", "timestamp", "eventType", "eventId")
    Sessionize.pageViewTime(df).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("sessionize: consecutive starts — later start wins (src/batch_tlb.py:56-57)") {
    val got = sessionTotal(Seq(
      ("c", "2024-01-01T00:00:00Z", "page_view_start"),
      ("c", "2024-01-01T00:00:30Z", "page_view_start"),
      ("c", "2024-01-01T00:01:00Z", "page_view_end")))
    assert(got == Map("c" -> 30.0))
  }

  test("sessionize: end without pending start ignored") {
    val got = sessionTotal(Seq(
      ("c", "2024-01-01T00:00:00Z", "page_view_end"),
      ("c", "2024-01-01T00:01:00Z", "page_view_start"),
      ("c", "2024-01-01T00:01:10Z", "page_view_end")))
    assert(got == Map("c" -> 10.0))
  }

  test("sessionize: trailing unmatched start contributes nothing") {
    val got = sessionTotal(Seq(
      ("c", "2024-01-01T00:00:00Z", "page_view_start"),
      ("c", "2024-01-01T00:00:05Z", "page_view_end"),
      ("c", "2024-01-01T00:01:00Z", "page_view_start")))
    assert(got == Map("c" -> 5.0))
  }

  test("sessionize: end matches only once — second end after matched end ignored") {
    val got = sessionTotal(Seq(
      ("c", "2024-01-01T00:00:00Z", "page_view_start"),
      ("c", "2024-01-01T00:00:10Z", "page_view_end"),
      ("c", "2024-01-01T00:00:20Z", "page_view_end")))
    assert(got == Map("c" -> 10.0))
  }

  test("sessionize: window path equals typed flatMapGroups replay") {
    val events = for {
      c <- Seq("a", "b", "c"); i <- 0 until 20
    } yield (c, f"2024-01-01T00:${i}%02d:00Z",
      Seq("page_view_start", "page_view_end", "error")((c + i).hashCode.abs % 3))
    val windowed = sessionTotal(events)
    val typed = Sessionize.pageViewTimeTyped(
      events.map { case (c, ts, et) =>
        SessionEvent(c, java.sql.Timestamp.from(java.time.Instant.parse(ts)), et)
      }.toDS())(spark)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // typed path emits every client (0.0 for pair-less); windowed only matched
    assert(windowed == typed.filter(_._2 > 0))
  }

  test("SQL UDAF sessionization equals the window path (SURVEY §2.8 optional item)") {
    val events = for {
      c <- Seq("a", "b", "c"); i <- 0 until 20
    } yield (c, i * 7000L + (c.hashCode.abs % 1000),
      Seq("page_view_start", "page_view_end", "other")((c + i).hashCode.abs % 3))
    val df = events.toDF("clientId", "t_ms", "eventType")
    spark.udf.register("graft_session_seconds", udaf(Sessionize.SessionSecondsAgg))
    df.createOrReplaceTempView("sess_events")
    val viaSql = spark.sql(
      "SELECT clientId, graft_session_seconds(t_ms, eventType) AS s FROM sess_events GROUP BY clientId")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaWindow = Sessionize.pairedDurations(
      df, "clientId", col("t_ms"), Seq(col("t_ms")), "eventType", "page_view_start", "page_view_end")
      .groupBy("clientId").agg(sum(col("duration") / 1000.0).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // UDAF emits every group (0.0 when pair-less); window path only matched
    assert(viaSql.filter(_._2 > 0) == viaWindow.filter(_._2 > 0))
    assert(viaSql.keySet == Set("a", "b", "c"))
  }

  test("enrich: hit merges+overwrites, miss passes through (src/data_processor.py:100-112)") {
    val df = Seq(("r1", "k1", "old1"), ("r2", "k2", "old2"), ("r3", null, "old3")).toDF("id", "fk", "v")
    val mapping = Seq(("k1", "new1", "extra1")).toDF("key", "v", "w")
      .select(col("key"), struct(col("v"), col("w")).as("value"))
    val got = Enrich(df, mapping, "fk").orderBy("id")
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3))).toSeq
    assert(got == Seq(("r1", "new1", "extra1"), ("r2", "old2", null), ("r3", "old3", null)))
  }

  test("mappings: array fan-out + null/empty-key skip + last-write-wins (src/data_processor.py:128-153)") {
    val df = Seq(
      (Seq("s1", "s2"), "t1", "c1"),
      (Seq("s2", null), "t2", "c2"), // s2 re-mapped: later wins; null key skipped
      (Seq.empty[String], "t3", "c3"),
      (Seq("s4"), "t4", null) // multi-value keeps null values
    ).toDF("spanIds", "traceId", "clientId")
    val got = Mappings.extract(df, "spanIds", Seq("traceId", "clientId"), singleValue = false)
      .collect().map(r => r.getString(0) -> ((r.getStruct(1).getString(0), r.getStruct(1).getString(1)))).toMap
    assert(got == Map(
      "s1" -> (("t1", "c1")),
      "s2" -> (("t2", "c2")),
      "s4" -> (("t4", null))))
  }

  test("mappings: single-value null skipped entirely (src/data_processor.py:147-150)") {
    val df = Seq(("k1", "v1"), ("k2", null)).toDF("k", "v")
    val got = Mappings.extract(df, "k", Seq("v"), singleValue = true)
      .collect().map(r => r.getString(0) -> r.getStruct(1).getString(0)).toMap
    assert(got == Map("k1" -> "v1"))
  }

  test("dot-path: nested array fan-out matches reference _get_nested_field") {
    val df = Seq(("t1", Seq(("s1", "srv1"), ("s2", "srv2")))).toDF("traceId", "spans")
      .select(col("traceId"), col("spans").cast("array<struct<spanId:string,server:string>>"))
    val got = df.select(DotPath.resolve(df, "spans.spanId").as("ids")).as[Seq[String]].head()
    assert(got == Seq("s1", "s2"))
    val missing = df.select(DotPath.resolve(df, "nope.x").as("m")).head()
    assert(missing.isNullAt(0))
  }

  test("text: word/token counts and fingerprint stability") {
    val df = Seq(("  Hello,  world  x  ", "a"), ("hello, world x", "b")).toDF("text", "id")
    val rows = df.select(
      TextFunctions.wordCount(col("text")).as("w"),
      TextFunctions.tokenCount(col("text")).as("t"),
      TextFunctions.fingerprint(col("text")).as("f")).collect()
    assert(rows(0).getInt(0) == 3 && rows(0).getLong(1) == 4) // Hello , world x
    // normalization makes the two spellings (case/whitespace) identical
    assert(rows(0).getString(2) == rows(1).getString(2))
  }

  test("text: rolling hash is the left-to-right polynomial fold") {
    val df = Seq(("abc", 1), ("", 2)).toDF("text", "id")
    val rows = df.orderBy("id").select(TextFunctions.rollingHash(col("text"))).collect()
    // ((0*257+97)*257+98)*257+99 = 6432038; split("","") = [""], ascii("")=0
    assert(rows(0).getLong(0) == 6432038L)
    assert(rows(1).getLong(0) == 0L)
  }

  test("vector: cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b", "c")
    val r = df.select(
      VectorFunctions.cosine(col("a"), col("b")),
      VectorFunctions.cosine(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && math.abs(r.getDouble(1)) < 1e-12)
  }

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val distinct = (100 to 160).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, distinct)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, minJaccard = 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("time series: gap months zero-filled, forward fill carries last value") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      ("A", ts("2024-01-05"), 100L), ("A", ts("2024-01-20"), 50L),
      ("A", ts("2024-04-02"), 30L),
      ("B", ts("2024-02-10"), 7L)).toDF("k", "d", "cents")
    val filled = graft.ops.TimeSeries.gapFillMonthlyCounts(orders, "k", "d", col("cents"))
      .withColumn("__v", when(col("n_obs") > 0, col("cents")))
    val got = graft.ops.TimeSeries.forwardFill(filled, "k", "month", "__v")
      .select(col("k"), date_format(col("month"), "yyyy-MM"), col("n_obs"), col("cents"), col("__v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("A", "2024-01") -> ((2L, 150L, 150L)),
      ("A", "2024-02") -> ((0L, 0L, 150L)), // gap month: zero obs, carried value
      ("A", "2024-03") -> ((0L, 0L, 150L)),
      ("A", "2024-04") -> ((1L, 30L, 30L)),
      ("B", "2024-02") -> ((1L, 7L, 7L))))
  }

  test("boilerplate: shared shingles flagged, unique docs score zero") {
    val template = "copyright acme corp all rights reserved"
    val docs = Seq(
      (1L, s"alpha beta gamma $template"),
      (2L, s"delta epsilon zeta $template"),
      (3L, s"eta theta iota $template"),
      (4L, "totally unique words nothing shared here at all")).toDF("doc_id", "text")
    val got = graft.ops.Repetition.boilerplate(docs, minDocs = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // each templated doc: 9 words → 7 shingles; the template contributes
    // 4 shingles fully inside it ("copyright acme corp" … "all rights
    // reserved"), shared by all 3 → boilerplate
    assert(got(1L) == ((7L, 4L, 4.0 / 7)))
    assert(got(2L)._2 == 4L && got(3L)._2 == 4L)
    assert(got(4L) == ((6L, 0L, 0.0)))
  }

  test("bm25: exact stats and rare-term ranking") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "d d d")).toDF("doc_id", "text")
    val stats = graft.ops.Bm25.stats(docs, Seq("a", "d")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (doc, term) -> (tf, df, doc_len)
    assert(stats == Map(
      (1L, "a") -> ((2L, 2L, 3L)),
      (2L, "a") -> ((1L, 2L, 2L)),
      (3L, "d") -> ((3L, 1L, 3L))))
    val scores = graft.ops.Bm25.score(docs, Seq("a", "d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 2L, 3L))
    assert(scores.values.forall(_ > 0))
    // the rare high-tf term dominates the common one
    assert(scores(3L) > scores(1L) && scores(1L) > 0)
    // replay the formula for doc 3 / term d: N=3, df=1, tf=3, len=3, avg=8/3
    val idf = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5))
    val tfNorm = 3 * 2.2 / (3 + 1.2 * (1 - 0.75 + 0.75 * 3 / (8.0 / 3)))
    assert(math.abs(scores(3L) - idf * tfNorm) < 1e-12)
  }

  test("redact: email, ip, long id, phone — in rule order") {
    val df = Seq(
      "mail bob.smith+x@ex-ample.org end",
      "ip 192.168.0.1 end",
      "acct 123456789 end",
      "call +1 (555) 123-4567 end",
      "short 12345 end").toDF("text")
    val got = df.select(TextFunctions.redact(col("text"))).as[String].collect().toSeq
    assert(got == Seq(
      "mail <EMAIL> end",
      "ip <IP> end",
      "acct <ID> end",
      "call <PHONE> end",
      "short 12345 end"))
  }

  test("chunking: window starts, overlap, ragged tail, empty doc") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7"),
      (2L, "a b"),
      (3L, "   ")).toDF("doc_id", "text")
    val got = graft.ops.Chunking.byWords(docs, chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    assert(got == Set(
      (1L, 0L, "w1 w2 w3 w4", 4), // starts every 3 words
      (1L, 1L, "w4 w5 w6 w7", 4), // a start-6 window ("w7") would be a
      (2L, 0L, "a b", 2)))        // strict subset of this one — suppressed;
                                  // doc 3 (whitespace only) emits nothing
  }

  test("repetition signals: hand-computed fractions") {
    val docs = Seq(
      (1L, "a a b"),          // words 3/2 distinct; bigrams {a a, a b}
      (2L, "x y x y x"),      // words 5/2; bigrams x·y ×2, y·x ×2
      (3L, "solo"),           // no bigrams
      (4L, "p q r s")).toDF("doc_id", "text")
    val got = graft.ops.Repetition.signals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1.0 / 3, 0.0, 0.5)))
    assert(got(2L) == ((3.0 / 5, 0.5, 0.5)))
    assert(got(3L) == ((0.0, 0.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0, 1.0 / 3)))
  }

  test("lshVerifiedPairs: one shingle stage feeds both LSH estimate and exact jaccard") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val distinct = (100 to 160).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, distinct)).toDF("doc_id", "text")
    val got = Dedup.lshVerifiedPairs(docs, minJaccard = 0.5).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val r = got.head
    // exact 3-shingle Jaccard: 56 common shingles, 60 in the union
    assert(math.abs(r.getDouble(3) - 56.0 / 60.0) < 1e-12)
    assert(r.getDouble(2) >= 0.5)
  }

  test("brute-force top-k: self excluded, k respected, planted neighbor first") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") === 1).select(col("vec_id").as("query_id"), col("embedding"))
    val got = Similarity.bruteForceTopK(vecs, queries, k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
  }
}

package graft

import graft.ops.{Audit, Lexical, Normalize}

/** Round-4 additions: functional-dependency audit, k-anonymity audit,
  * integer percent-rank normalization, lexical-diversity profile.
  */
class LexicalAndAuditSpec extends SparkSpec {
  import spark.implicits._

  test("functionalDependency reports violating determinants only, minimal correction count") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"),         // a → {x:2, y:1}: 1 violation
      ("b", "x"), ("b", "x"),                     // b is clean → omitted
      ("c", "x"), ("c", null), ("c", null)        // c → {x:1, null:2}: 1 violation
    ).toDF("det", "dep")
    val got = Audit.functionalDependency(df, Seq("det"), "dep")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set("a", "c"))
    assert(got("a") == ((3L, 2L, 2L, 1L)))
    // NULLs form ONE dependent class and it is the majority here
    assert(got("c") == ((3L, 2L, 2L, 1L)))
  }

  test("kAnonymity flags classes below k; NULL quasi value is its own class") {
    val df = Seq(
      ("u1", "view"), ("u1", "view"), ("u1", "view"),
      ("u2", "click"),
      (null, "view"), (null, "view")
    ).toDF("uid", "etype")
    val got = Audit.kAnonymity(df, Seq("uid", "etype"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("u2", "click", 1L), (null, "view", 2L)))
  }

  test("percentRankPpm: exact integer ranks, tie sharing, 1-row group zero") {
    val df = Seq(
      ("g", 10L), ("g", 20L), ("g", 20L), ("g", 30L), ("g", 40L),
      ("solo", 7L)
    ).toDF("grp", "v")
    val got = Normalize.percentRankPpm(df, Seq("grp"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // n=5: ranks 1,2,2,4,5 → ppm = 0, 250000, 250000, 750000, 1000000
    assert(got(("g", 10L)) == 0L)
    assert(got(("g", 20L)) == 250000L)
    assert(got(("g", 30L)) == 750000L)
    assert(got(("g", 40L)) == 1000000L)
    assert(got(("solo", 7L)) == 0L)
  }

  test("lexical diversity: exact counts; empty and null docs kept as zero rows") {
    val df = Seq(
      (1L, "the cat and the dog and the bird"), // 8 tokens, 5 types
      (2L, "   "),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Lexical.diversity(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // tf: the=3, and=2, cat=1, dog=1, bird=1 → simpson = 9+4+1+1+1 = 16
    assert(got(1L) == ((8L, 5L, 625000L, 16L, 3L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("sentenceStats: terminator runs segment; blank segments ignored; zero-sentence docs") {
    val df = Seq(
      (1L, "One two. Three!! Four? "),   // 3 sentences, trailing blank segment
      (2L, "no terminator at all"),      // 1 sentence (whole text)
      (3L, "... !!! "),                  // punctuation only: 0 sentences
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Lexical.sentenceStats(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(1L)._1 == 3L)
    assert(got(1L)._3 == 4L) // whitespace tokens: One / two. / Three!! / Four?
    assert(got(2L) == ((1L, 20L, 4L, 20000000L, 4000000L)))
    assert(got(3L)._1 == 0L && got(3L)._4 == 0L && got(3L)._5 == 0L)
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("charClasses: counts partition the string and sum to n_chars") {
    val df = Seq(
      (1L, "Ab1 c!"),                    // upper 1, lower 2, digit 1, space 1, other 1
      (2L, ""),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Lexical.charClasses(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got(1L) == ((6L, 1L, 1L, 2L, 1L, 1L, 166666L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("piiDensity: independent rule counts; rate per kilochar") {
    val df = Seq(
      (1L, "mail me at a.b@example.com or 10.0.0.1 please, id 1234567"),
      (2L, "clean text"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Lexical.piiDensity(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (nChars, email, ip, longid, phone, rate) = got(1L)
    assert(email == 1L && ip == 1L && longid == 1L)
    assert(phone == 0L) // 7-digit run is below the phone rule's 8-char floor
    assert(rate == (1000L * (email + ip + longid + phone)) / nChars)
    assert(got(2L)._2 == 0L && got(2L)._6 == 0L)
    assert(got(3L)._1 == 0L && got(3L)._6 == 0L)
  }

  test("fkOrphans: counts keyless children, skips NULL keys, passes clean relations") {
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None), (4L, Some(10L)))
      .toDF("id", "fk")
    val parent = Seq(Tuple1(10L), Tuple1(11L)).toDF("pk")
    val got = graft.ops.Audit.fkOrphans(Seq(("c->p", child, "fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(("c->p", 1L, 3L, false))) // 99 orphan; NULL skipped
    val clean = graft.ops.Audit.fkOrphans(
      Seq(("ok", child.where("fk = 10"), "fk", parent, "pk")))
      .collect().head
    assert(clean.getLong(1) == 0L && clean.getBoolean(3))
  }

  test("benfordDigits: exact first-digit census, non-positive rows excluded") {
    val df = (Seq(1L, 19L, 123L, 2L, 25L, 900L, 9L, -5L, 0L)).map(Tuple1(_)).toDF("v")
    val got = graft.ops.Metrics.benfordDigits(df, "v").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // positives: 1,19,123 -> digit 1 x3; 2,25 -> digit 2 x2; 900,9 -> digit 9 x2
    assert(got(1L) == ((3L, 428571L)))
    assert(got(2L) == ((2L, 285714L)))
    assert(got(9L) == ((2L, 285714L)))
    assert(got.keySet == Set(1L, 2L, 9L))
  }

  test("histogramDistance: L1 identity, disjoint pairs still emitted at max ppm") {
    val counts = Seq(
      ("a", 1, 5L), ("a", 2, 5L),
      ("b", 1, 3L), ("b", 3, 7L),
      ("c", 9, 4L) // disjoint from both
    ).toDF("g", "bucket", "n")
    val got = graft.ops.Metrics.histogramDistance(counts, "g", "bucket", "n")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // a vs b: Ta=10 Tb=10, shared bucket 1: min(5,3)=3 -> L1 = 20-6 = 14
    assert(got(("a", "b")) == ((14L, 700000L)))
    // disjoint pairs: full mass, 1e6 ppm
    assert(got(("a", "c")) == ((14L, 1000000L)))
    assert(got(("b", "c")) == ((14L, 1000000L)))
  }

  test("columnDrift: per-column stats from both snapshots, null-aware") {
    val a = Seq((1L, Option(10L)), (2L, Option(10L)), (3L, None)).toDF("id", "v")
    val b = Seq((4L, Option(7L))).toDF("id", "v")
    val got = Audit.columnDrift(a, b, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(got("id") == Seq(3L, 0L, 3L, 1L, 3L, 6L, 1L, 0L, 1L, 4L, 4L, 4L))
    assert(got("v") == Seq(3L, 1L, 1L, 10L, 10L, 20L, 1L, 0L, 1L, 7L, 7L, 7L))
  }

  test("columnDrift: approxDistinct path matches exact on small cardinality, other stats identical") {
    // HLL++ is exact in its sparse regime, so at toy cardinality the
    // approximate path must agree exactly — and every non-distinct stat
    // comes off the same aggregate either way.
    val a = Seq((1L, Option(10L)), (2L, Option(10L)), (3L, None)).toDF("id", "v")
    val b = Seq((4L, Option(7L))).toDF("id", "v")
    def run(approx: Boolean) = Audit.columnDrift(a, b, Seq("id", "v"), approxDistinct = approx)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(run(approx = true) == run(approx = false))
  }

  test("tokenFertility: hand-computed per-language ratios, zero-safe") {
    val docs = Seq(
      ("en", "Hello world!"),  // words 2; tokens Hello|world|! = 3; chars 12
      ("en", "a b"),           // words 2; tokens 2; chars 3
      ("zz", "")               // empty: all zero, ratios 0
    ).toDF("lang", "text")
    val got = Lexical.tokenFertility(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("en") == ((2L, 4L, 5L, 15L, 1250000L, 3000000L)))
    assert(got("zz") == ((1L, 0L, 0L, 0L, 0L, 0L)))
  }
}

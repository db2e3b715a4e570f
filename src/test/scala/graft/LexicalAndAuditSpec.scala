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
}

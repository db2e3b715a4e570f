package graft

import org.apache.spark.sql.functions._
import graft.ops.{Indexing, Normalize, TableDiff}

/** Snapshot diff, min-max normalization, inverted-index summary (round 3). */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- table diff

  test("TableDiff.diff: added / removed / changed with column masks; unchanged omitted") {
    val old = Seq(
      (1L, 10L, "A"),  // unchanged
      (2L, 20L, "B"),  // value changes
      (3L, 30L, "C"),  // status changes
      (4L, 40L, "D"),  // both change
      (5L, 50L, "E")   // removed
    ).toDF("k", "v", "s")
    val neu = Seq(
      (1L, 10L, "A"),
      (2L, 21L, "B"),
      (3L, 30L, "X"),
      (4L, 41L, "Y"),
      (6L, 60L, "F")   // added
    ).toDF("k", "v", "s")
    val got = TableDiff.diff(old, neu, Seq("k"), Seq("v", "s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (2L, "changed", "v"),
      (3L, "changed", "s"),
      (4L, "changed", "v,s"),
      (5L, "removed", ""),
      (6L, "added", "")))
  }

  test("TableDiff.diff: null transitions are changes, null==null is not") {
    val old = Seq((1L, Some(10L)), (2L, None), (3L, None)).toDF("k", "v")
    val neu = Seq((1L, None), (2L, Some(5L)), (3L, None)).map(x => (x._1, x._2)).toDF("k", "v")
    val got = TableDiff.diff(old, neu, Seq("k"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "changed"), (2L, "changed"))) // key 3: null→null, omitted
  }

  // ----------------------------------------------------------- min-max

  test("Normalize.minMaxPpm: range scaling is exact; constant groups map to 0") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 7L), ("b", 5L, 7L)
    ).toDF("g", "id", "v")
    val got = Normalize.minMaxPpm(df, Seq("g"), "v")
      .select("id", "scaled_ppm").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L, 4L -> 0L, 5L -> 0L))
  }

  // ----------------------------------------------------- inverted index

  test("Indexing.postingSummary: df is per-doc presence; postings sorted and capped") {
    val docs = Seq(
      (3L, "spark spark data"),
      (1L, "data table"),
      (2L, "spark table table")
    ).toDF("doc_id", "text")
    val got = Indexing.postingSummary(docs, k = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got("spark") == (2L, "2,3"))      // repeated in doc 3 counts once
    assert(got("data") == (2L, "1,3"))
    assert(got("table") == (2L, "1,2"))
    // cap: a term in 3 docs keeps only the first k=2 ascending ids
    val all = Indexing.postingSummary(
      Seq((9L, "x"), (7L, "x"), (8L, "x")).toDF("doc_id", "text"), k = 2)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(all("x") == "7,8")
  }
}

package graft

import graft.jobs.CorpusPrep

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val goodText = ("lorem ipsum dolor sit amet " * 10).trim // 269 chars, avg word len ~4.4

  test("keeps the smallest doc_id per duplicated text and drops the rest") {
    val docs = Seq(
      (3L, goodText), (1L, goodText), (2L, goodText + " unique tail here")
    ).toDF("doc_id", "text")
    val out = CorpusPrep.prepare(docs).select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("quality gate removes short/degenerate docs") {
    // doc 3 fails length, word-shape, and punctuation-density checks →
    // quality 0.625, below the gate; doc 2 fails only length + stopword
    // ratio → 0.75, kept (soft penalty only)
    val docs = Seq((1L, goodText), (2L, "tiny"), (3L, "a! b? c# d$ e% f^ g& h*")).toDF("doc_id", "text")
    val out = CorpusPrep.prepare(docs)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(out.select("quality").as[Double].collect().forall(_ >= 0.75))
  }

  test("split assignment is deterministic and id-based") {
    val docs = (1L to 50L).map(i => (i, goodText + s" doc $i")).toDF("doc_id", "text")
    val a = CorpusPrep.prepare(docs).select("doc_id", "split").collect().toSet
    val b = CorpusPrep.prepare(docs).select("doc_id", "split").collect().toSet
    assert(a === b)
    assert(a.map(_.getString(1)).subsetOf(Set("train", "val", "test")))
  }
}

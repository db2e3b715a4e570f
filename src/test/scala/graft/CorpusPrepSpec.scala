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

  test("packShards: greedy contiguous fill in doc_id order within a shard") {
    // One shard (nShards=1), all docs same split bucket behavior irrelevant:
    // verify pack boundaries from the exclusive cumulative sum.
    val docs = (1L to 20L).map(i => (i, goodText)).toDF("doc_id", "text")
    val out = CorpusPrep.packShards(docs, budgetTokens = 200, nShards = 1)
      .select("doc_id", "tok", "split", "pack_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // within each split group, pack_id must be non-decreasing in doc_id and
    // each pack's token total (except possibly its last doc) stays < budget
    out.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).toSeq.sorted)
      var cum = 0L
      sorted.foreach { case (_, tok, _, pack) =>
        assert(pack === cum / 200, s"pack mismatch at cum=$cum")
        cum += tok
      }
    }
  }

  test("split assignment is deterministic and id-based") {
    val docs = (1L to 50L).map(i => (i, goodText + s" doc $i")).toDF("doc_id", "text")
    val a = CorpusPrep.prepare(docs).select("doc_id", "split").collect().toSet
    val b = CorpusPrep.prepare(docs).select("doc_id", "split").collect().toSet
    assert(a === b)
    assert(a.map(_.getString(1)).subsetOf(Set("train", "val", "test")))
  }

  test("epochSchedule: bijective positions, epoch-major, per-epoch permutations differ") {
    val docs = (1L to 40L).map(i => Tuple1(i)).toDF("doc_id")
    val got = CorpusPrep.epochSchedule(docs, "doc_id", epochs = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 120)
    // positions are exactly 0..119, epoch-major blocks of 40
    assert(got.map(_._3).sorted.toSeq == (0L until 120L))
    got.foreach { case (e, _, pos) => assert(pos / 40 == e) }
    // each epoch covers all docs once, and the orders differ across epochs
    val byEpoch = got.groupBy(_._1).map { case (e, rows) =>
      e -> rows.sortBy(_._3).map(_._2).toSeq
    }
    assert(byEpoch.values.forall(_.sorted == (1L to 40L)))
    assert(byEpoch(0L) != byEpoch(1L) && byEpoch(1L) != byEpoch(2L))
    // deterministic across runs
    val again = CorpusPrep.epochSchedule(docs.repartition(7), "doc_id", epochs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    assert(again.toSeq == got.sortBy(_._3).toSeq)
  }
}

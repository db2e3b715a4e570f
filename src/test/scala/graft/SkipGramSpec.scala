package graft

import graft.ops.Ngrams

/** Skip-gram co-occurrence and PPMI-monotone lift: in-memory replays of
  * the symmetric-window pair census plus hand-checked lift arithmetic.
  */
class SkipGramSpec extends SparkSpec {
  import spark.implicits._

  private def tokens(s: String): Seq[String] =
    s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** The operator's contract replayed in memory: for each position i and
    * offset 1..w, (w_i, w_{i+d}) counts once in EACH direction.
    */
  private def referencePairs(docs: Seq[String], window: Int): Map[(String, String), Long] = {
    val pairs = docs.flatMap { doc =>
      val t = tokens(doc)
      for {
        i <- t.indices
        d <- 1 to window
        if i + d < t.length
        p <- Seq((t(i), t(i + d)), (t(i + d), t(i)))
      } yield p
    }
    pairs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
  }

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps",
    "a lazy dog and a lazy cat")

  test("skipGrams matches the in-memory symmetric-window census") {
    for (w <- Seq(1, 2, 4)) {
      val got = Ngrams.skipGrams(corpus.toDF("text"), window = w)
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      assert(got == referencePairs(corpus, w), s"window=$w")
    }
  }

  test("skipGrams window never crosses document boundaries") {
    val got = Ngrams.skipGrams(Seq("a b", "c d").toDF("text"), window = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "a"), ("c", "d"), ("d", "c")))
  }

  test("minCount prunes reported pairs") {
    val got = Ngrams.skipGrams(corpus.toDF("text"), window = 2, minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(got.nonEmpty && got.forall(_._2 >= 2L))
    assert(got.toMap == referencePairs(corpus, 2).filter(_._2 >= 2L))
  }

  test("skipGramLift: exact integer lift against the replayed matrix") {
    val co = referencePairs(corpus, 2)
    val n = co.values.sum
    val rowm = co.groupBy(_._1._1).map { case (k, v) => (k, v.values.sum) }
    val colm = co.groupBy(_._1._2).map { case (k, v) => (k, v.values.sum) }
    val want = co.map { case ((c, x), cnt) =>
      ((c, x), (cnt, BigInt(n) * cnt * 1000000 / (BigInt(rowm(c)) * colm(x))))
    }
    val got = Ngrams.skipGramLift(corpus.toDF("text"), window = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), BigInt(r.getLong(3))))).toMap
    assert(got == want)
  }

  test("skipGramLift marginals come from the FULL matrix even when minCount filters") {
    val full = Ngrams.skipGramLift(corpus.toDF("text"), window = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    val filtered = Ngrams.skipGramLift(corpus.toDF("text"), window = 2, minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(filtered.nonEmpty)
    // every surviving pair keeps the unfiltered score
    filtered.foreach { case (k, v) => assert(full(k) == v, s"pair $k rescored") }
  }

  test("lift is symmetric for a symmetric window") {
    val got = Ngrams.skipGramLift(corpus.toDF("text"), window = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    got.foreach { case ((a, b), v) => assert(got((b, a)) == v, s"asymmetric at ($a,$b)") }
  }

  test("gloveCooccurrence: counts match skipGrams, weights match the 1/d replay") {
    val w = 3
    val wants = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    for (doc <- corpus) {
      val t = tokens(doc)
      for {
        i <- t.indices
        d <- 1 to w
        if i + d < t.length
        p <- Seq((t(i), t(i + d)), (t(i + d), t(i)))
      } {
        val (n, we) = wants.getOrElse(p, (0L, 0L))
        wants(p) = (n + 1L, we + 1000000L / d)
      }
    }
    val got = Ngrams.gloveCooccurrence(corpus.toDF("text"), window = w)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == wants.toMap)
    // the count column is exactly the skipGrams census
    assert(got.view.mapValues(_._1).toMap == referencePairs(corpus, w))
  }
}

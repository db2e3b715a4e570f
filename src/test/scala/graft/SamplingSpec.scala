package graft

import org.apache.spark.sql.functions._
import graft.ops.{Decontaminate, Dedup, Sampling}

/** Deterministic sampling + decontamination semantics. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified: deterministic, per-stratum rate, unlisted strata keep default") {
    val rows = (1L to 2000L).map(i => (i, if (i % 2 == 0) "view" else "purchase"))
    val df = rows.toDF("event_id", "event_type")
    val sampled = Sampling.stratified(df, "event_type", "event_id", Map("view" -> 0.1))
    val again = Sampling.stratified(df, "event_type", "event_id", Map("view" -> 0.1))
    assert(sampled.collect().toSet === again.collect().toSet)
    val byType = sampled.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(byType("purchase") === 1000L) // default fraction 1.0 keeps everything
    val viewRate = byType.getOrElse("view", 0L).toDouble / 1000
    assert(viewRate > 0.05 && viewRate < 0.2, s"view rate $viewRate far from 0.1")
  }

  test("stratified: samples are nested — a smaller fraction is a subset of a larger one") {
    // threshold membership ⇒ sample(f₁) ⊆ sample(f₂) for f₁ ≤ f₂: ablation
    // sweeps over data fractions stay consistent (each run extends, never
    // reshuffles, the previous selection)
    val df = (1L to 3000L).map(i => (i, "view")).toDF("event_id", "event_type")
    def ids(f: Double): Set[Long] =
      Sampling.stratified(df, "event_type", "event_id", Map("view" -> f))
        .select("event_id").as[Long].collect().toSet
    val s10 = ids(0.1); val s50 = ids(0.5); val s100 = ids(1.0)
    assert(s10.subsetOf(s50) && s50.subsetOf(s100) && s100.size === 3000)
  }

  test("stratified: fraction 0 drops the stratum entirely") {
    val df = (1L to 100L).map(i => (i, "view")).toDF("event_id", "event_type")
    assert(Sampling.stratified(df, "event_type", "event_id", Map("view" -> 0.0)).count() === 0L)
  }

  test("ngrams: sliding word windows; short docs yield none") {
    val words = Seq(Seq("a", "b", "c", "d"), Seq("a", "b")).toDF("w")
    val got = words.select(Decontaminate.ngrams(col("w"), 3).as("g")).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("flagged finds shared n-grams and counts distinct hits; hashed form agrees") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words here nothing shared"),
      (3L, "quick brown fox again and again quick brown fox")).toDF("doc_id", "text")
    val test = Seq((100L, "a quick brown fox appeared")).toDF("doc_id", "text")
    val exact = Decontaminate.flagged(train, test, n = 3)
      .as[(Long, Long)].collect().toMap
    // shared 3-gram "quick brown fox": docs 1 and 3 (distinct-counted once in 3)
    assert(exact === Map(1L -> 1L, 3L -> 1L))
    val hashed = Decontaminate.flaggedHashed(train, test, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(hashed === exact)
  }

  test("flagged is case/whitespace normalized like wordTokens") {
    val train = Seq((1L, "The  Quick\tBrown Fox")).toDF("doc_id", "text")
    val test = Seq((2L, "quick brown fox")).toDF("doc_id", "text")
    assert(Decontaminate.flagged(train, test, n = 3).count() === 1L)
  }

  test("weighted: rate tracks the weight, selection deterministic, clamped at extremes") {
    val df = (1 to 2000).map(_.toLong).toDF("id")
    def rate(w: Double): Double =
      Sampling.weighted(df, "id", lit(w)).count().toDouble / 2000
    assert(rate(0.0) == 0.0 && rate(1.0) == 1.0)
    assert(rate(-5.0) == 0.0 && rate(7.0) == 1.0) // clamped
    assert(math.abs(rate(0.5) - 0.5) < 0.05 && math.abs(rate(0.1) - 0.1) < 0.03)
    // per-row weights: heavier rows selected more often
    val byParity = Sampling.weighted(df, "id", when(col("id") % 2 === 0, 0.9).otherwise(0.1))
      .groupBy((col("id") % 2).as("p")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byParity(0L) > 800 && byParity(1L) < 200)
    // deterministic across reruns/partitioning
    val a = Sampling.weighted(df, "id", lit(0.3)).select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.weighted(df.repartition(7), "id", lit(0.3)).select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("exactPerGroup: exact caps, small strata untouched, partition-independent") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++ Seq((200L, "small"), (201L, "small")))
      .toDF("id", "stratum")
    val got = Sampling.exactPerGroup(df, "stratum", "id", n = 10)
    val counts = got.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 10L, "small" -> 2L))
    val again = Sampling.exactPerGroup(df.repartition(7), "stratum", "id", n = 10)
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
    // the salted pre-pass never changes the selected set
    val salted = Sampling.exactPerGroup(df, "stratum", "id", n = 10, saltBuckets = 3)
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      salted.select("id").as[Long].collect().sorted.toSeq)
  }

  test("temporalEmbargoSplit: embargo rows drop from both sides; cross-presence flagged") {
    import java.sql.Timestamp
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-10 00:00:00")), // train
      (1L, Timestamp.valueOf("2024-01-25 00:00:00")), // test -> cross
      (2L, Timestamp.valueOf("2024-01-23 12:00:00")), // embargo only
      (3L, Timestamp.valueOf("2024-01-21 23:59:59")), // train (just before gap)
      (3L, Timestamp.valueOf("2024-01-22 00:00:00")), // embargo (gap start)
      (4L, Timestamp.valueOf("2024-01-24 00:00:00"))  // test (cut inclusive)
    ).toDF("user_id", "ts")
    val got = Sampling.temporalEmbargoSplit(rows, "user_id", "ts",
        "2024-01-24 00:00:00", embargoSeconds = 2L * 86400)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(1L) == ((1L, 1L, 0L, true)))
    assert(got(2L) == ((0L, 0L, 1L, false)))
    assert(got(3L) == ((1L, 0L, 1L, false)))
    assert(got(4L) == ((0L, 1L, 0L, false)))
  }

  test("stratifiedInterleave: round-robin positions; prefix strata do not desync offsets") {
    // "a" is a prefix of "a0" - the regression that flips concat-order vs tuple-order
    val df = ((1L to 9L).map(i => (i, "a")) ++ (10L to 15L).map(i => (i, "a0")) ++
      (16L to 18L).map(i => (i, "b"))).toDF("id", "stratum")
    val got = Sampling.stratifiedInterleave(df, "id", "stratum").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == 18)
    assert(got.forall(_._3 >= 0), s"negative positions: ${got.filter(_._3 < 0).mkString(",")}")
    // positions are unique and stratum-coded mod B=3: a->0, a0->1, b->2
    assert(got.map(_._3).distinct.length == 18)
    got.foreach { case (_, st, pos) =>
      val code = Map("a" -> 0L, "a0" -> 1L, "b" -> 2L)(st)
      assert(pos % 3 == code, s"pos $pos stratum $st")
    }
    // within each stratum, within-ranks are 0..n-1 (pos div B dense from 0)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3 / 3).sorted.toSeq == (0L until rows.length))
    }
    // deterministic under repartition
    val again = Sampling.stratifiedInterleave(df.repartition(5), "id", "stratum")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(again.toSeq == got.sortBy(_._1).toSeq)
  }

  test("apportion: exact Hamilton allocation, sums to budget, deterministic ties") {
    val counts = Seq(("a", 30L), ("b", 30L), ("c", 40L)).toDF("src", "w")
    // B=10, T=100: floors 3,3,4 sum to 10 -> no remainder seats
    val even = Sampling.apportion(counts, "src", "w", budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(even == Map("a" -> 3L, "b" -> 3L, "c" -> 4L))
    // B=7, T=100: quotas 2.1/2.1/2.8 -> floors 2,2,2, deficit 1 ->
    // largest remainder is c (.8)
    val tight = Sampling.apportion(counts, "src", "w", budget = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tight == Map("a" -> 2L, "b" -> 2L, "c" -> 3L))
    assert(tight.values.sum == 7L)
    // remainder tie: a and b tie -> smaller key wins the seat
    val tie = Sampling.apportion(Seq(("a", 50L), ("b", 50L)).toDF("src", "w"),
      "src", "w", budget = 3L).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tie == Map("a" -> 2L, "b" -> 1L))
  }

  test("budgetFill: boundary row included, order by rank then md5, per-group budgets") {
    val docs = Seq(
      ("s", 1L, 10L, 40L), ("s", 2L, 9L, 40L), ("s", 3L, 8L, 40L),
      ("t", 4L, 5L, 100L)
    ).toDF("src", "id", "rank", "w")
    val budgets = Seq(("s", 50L), ("t", 1L)).toDF("src", "alloc")
    val got = Sampling.budgetFill(docs, "src", "id", "rank", "w",
        budgets, "src", "alloc")
      .collect().map(r => (r.getLong(1), r.getLong(4))).toMap
    // s: rank order 1(40),2(40 -> cum 80 crosses 50, included),3 excluded
    // t: single row crosses its tiny budget, included
    assert(got == Map(1L -> 40L, 2L -> 80L, 4L -> 100L))
  }

  test("semanticFlags: cosine-threshold hits vs held-out, total over the corpus") {
    val corpus = Seq(
      (0L, Seq(1f, 0f)),      // cos 1.0 with held-out (2,0) → contaminated
      (2L, Seq(0.6f, 0.8f)),  // cos 0.6 / 0.8 vs the two held-out → clean
      (4L, Seq(-3f, -4f))     // antiparallel → dot < 0 → clean
    ).toDF("vec_id", "embedding")
    val heldout = Seq((1L, Seq(2f, 0f)), (3L, Seq(0f, 5f))).toDF("vec_id", "embedding")
    val got = Decontaminate.semanticFlags(corpus, heldout)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(0L -> ((1L, true)), 2L -> ((0L, false)), 4L -> ((0L, false))))
  }

  test("semanticFlags matches a reference double-cosine screen on random vectors") {
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)
    val corpus = (0L until 60L).map(i => (i, vec()))
    val heldout = (100L until 130L).map(i => (i, vec()))
    // Reference replays the op's integer contract (scale-quantized dot,
    // cross-multiplied squares) in plain Scala.
    def q(v: Seq[Float]): Seq[Long] = v.map(x => math.round(x.toDouble * 1024))
    def dot(a: Seq[Long], b: Seq[Long]): Long = a.zip(b).map { case (x, y) => x * y }.sum
    val expected = corpus.map { case (id, v) =>
      val qa = q(v); val n2a = dot(qa, qa)
      val n = heldout.count { case (_, w) =>
        val qb = q(w); val d = dot(qa, qb)
        d > 0 && d * d * 100 >= 81 * n2a * dot(qb, qb)
      }
      id -> ((n.toLong, n > 0))
    }.toMap
    val got = Decontaminate.semanticFlags(
        corpus.toDF("vec_id", "embedding"), heldout.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == expected)
  }

  /** The operator's priority contract in memory: md5-hex prefix as the
    * uniform, truncating scaled division, top-k with the (k+1)-th as τ.
    */
  private def referencePriority(
      rows: Seq[(Long, Long)], k: Int): Seq[(Long, Long, Long, Long)] = {
    def u32(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) + 1L
    }
    val pri = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, w, (w * 4294967296L) / u32(id)) }
      .sortBy { case (id, _, q) => (-q, id) }
    val tau = if (pri.size >= k + 1) pri(k)._3 else 0L
    pri.take(k).map { case (id, w, q) => (id, w, q, math.max(w, tau)) }
  }

  test("prioritySample matches the in-memory replay; τ comes from the (k+1)-th") {
    val rnd = new scala.util.Random(59)
    val rows = (1L to 150L).map(i => (i, 1L + rnd.nextInt(500).toLong))
    for (k <- Seq(5, 40, 149, 200)) {
      val got = Sampling.prioritySample(rows.toDF("doc_id", "w"), k, "w")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == referencePriority(rows, k), s"k=$k diverged")
    }
  }

  test("prioritySample: population <= k is exact (est_weight = weight)") {
    val rows = Seq((1L, 10L), (2L, 20L), (3L, 30L))
    val got = Sampling.prioritySample(rows.toDF("doc_id", "w"), k = 10, "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.length == 3 && got.forall(r => r._2 == r._3))
  }

  test("prioritySample refuses weights at or above 2^31 with the culprit named") {
    val rows = Seq((1L, 5L), (7L, (1L << 31)))
    val e = intercept[IllegalArgumentException] {
      Sampling.prioritySample(rows.toDF("doc_id", "w"), k = 1, "w")
    }
    assert(e.getMessage.contains("row 7"))
  }

  test("prioritySamplePerGroup: each group replays the single-group contract") {
    val rnd = new scala.util.Random(83)
    // ids globally unique, two groups of different sizes
    val rows = (1L to 120L).map(i =>
      (if (i <= 80) "g1" else "g2", i, 1L + rnd.nextInt(300).toLong))
    val k = 15
    val got = Sampling.prioritySamplePerGroup(
      rows.toDF("src", "doc_id", "w"), k, "w", "src")
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (g <- Seq("g1", "g2")) {
      val want = referencePriority(rows.filter(_._1 == g).map(r => (r._2, r._3)), k).toSet
      assert(got(g) == want, s"group $g diverged")
    }
  }

  test("prioritySamplePerGroup: a group smaller than k is degenerate-exact") {
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
    val got = Sampling.prioritySamplePerGroup(rows.toDF("g", "doc_id", "w"), 5, "w", "g")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.length == 3 && got.forall(r => r._2 == r._3))
  }

  test("prioritySample fails loudly when duplicate ids reach the selected top") {
    // duplicate id 5 draws the SAME uniform twice → both copies land in
    // the top-(k+1) and the bounded probe must refuse
    val rows = Seq((5L, 100L), (5L, 100L), (2L, 1L), (3L, 1L))
    val e = intercept[IllegalArgumentException] {
      Sampling.prioritySample(rows.toDF("doc_id", "w"), k = 1, "w")
    }
    assert(e.getMessage.contains("duplicate"))
  }
}

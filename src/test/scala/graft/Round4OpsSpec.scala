package graft

import org.apache.spark.sql.functions._
import graft.ops.{Audit, Cdc, FuzzyJoin, Indexing, Metrics, Ngrams, Normalize}

/** Round-4 additions: continuation counts, key-skew profile, winsorize,
  * agreement scoring, Gini, basket co-occurrence, characteristic terms,
  * vocab coverage, incremental aggregate maintenance, join estimate,
  * span coverage, multi-probe ANN + recall harness, cluster
  * representatives, Kneser–Ney, prefix-filter similarity join, novelty,
  * LOO target encoding, hard negatives, leak-free split, BPE merges.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------- continuation counts

  test("continuationCounts: token and distinct-context counts on a tiny corpus") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog sat"),
      (3L, "the cat ran")
    ).toDF("doc_id", "text")
    val got = Ngrams.continuationCounts(docs, minTokens = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "the": 3 tokens, 0 left contexts, right contexts {cat, dog}
    assert(got("the") == ((3L, 0L, 2L)))
    // "cat": 2 tokens, left {the}, right {sat, ran}
    assert(got("cat") == ((2L, 1L, 2L)))
    // "sat": 2 tokens, left {cat, dog}, 0 right
    assert(got("sat") == ((2L, 2L, 0L)))
  }

  test("continuationCounts: minTokens prunes the hapax tail") {
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val words = Ngrams.continuationCounts(docs, minTokens = 2).collect().map(_.getString(0))
    assert(words.toSet == Set("a"))
  }

  // ------------------------------------------------- key skew

  test("keySkew: ranks heavy keys with exact share and cumulative share") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold")).toDF("k")
    val got = Audit.keySkew(df, "k", topN = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "hot", 6L, 600000L, 600000L),
      (2L, "warm", 3L, 300000L, 900000L)))
  }

  test("keySkew: count ties break by key value for determinism") {
    val df = Seq("b", "a", "b", "a").toDF("k")
    val got = Audit.keySkew(df, "k", topN = 2).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  // ------------------------------------------------ winsorize

  test("winsorize clamps to the exact discrete quantile boundaries per group") {
    // Group g: values 1..20. p10 boundary = rank ceil(0.1*20)=2 → 2;
    // p90 = rank 18 → 18.
    val df = (1L to 20L).map(v => ("g", v)).toDF("grp", "v")
    val got = Normalize.winsorize(df, Seq("grp"), "v", 0.1, 0.9)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(1L) == 2L && got(2L) == 2L && got(3L) == 3L)
    assert(got(18L) == 18L && got(19L) == 18L && got(20L) == 18L)
    // Row count preserved
    assert(got.size == 20)
  }

  test("winsorize: pLow=0 clamps nothing at the bottom; single-value groups are fixed points") {
    val df = (Seq(("a", 5L), ("a", 7L), ("a", 9L)) ++ Seq(("b", 42L))).toDF("grp", "v")
    val got = Normalize.winsorize(df, Seq("grp"), "v", 0.0, 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (_, v, w) => v == w })
  }

  // ----------------------------------------- agreement scoring

  test("agreementPairs: null-safe field agreement with integer weights") {
    val df = Seq(
      (1L, "blk", Some("x"), "p"),
      (2L, "blk", Some("x"), "q"),
      (3L, "blk", None, "p"),
      (4L, "blk2", Some("x"), "p") // different block: never compared
    ).toDF("id", "blk", "f1", "f2")
    val got = FuzzyJoin.agreementPairs(df, "id", col("blk"),
      Seq(("f1", 5L, 2L), ("f2", 3L, 1L)), minScore = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(6), r.getBoolean(7))).toMap
    // (1,2): f1 agree +5, f2 disagree -1 → 4, match
    assert(got((1L, 2L)) == ((4L, true)))
    // (1,3): f1 NULL vs x disagree -2, f2 agree +3 → 1, no match
    assert(got((1L, 3L)) == ((1L, false)))
    // (2,3): -2 - 1 = -3
    assert(got((2L, 3L)) == ((-3L, false)))
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("agreementPairs: two NULLs agree null-safely") {
    val df = Seq((1L, "b", Option.empty[String]), (2L, "b", Option.empty[String]))
      .toDF("id", "b", "f")
    val got = FuzzyJoin.agreementPairs(df, "id", col("b"), Seq(("f", 7L, 3L)), minScore = 0L)
      .collect().map(r => (r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq((7L, true)))
  }

  // ------------------------------------------------------ gini

  test("gini: equal categories → 0; concentration raises the coefficient") {
    val equal = Seq(("g", "a"), ("g", "b"), ("g", "c"), ("g", "d")).toDF("grp", "cat")
    val g0 = Metrics.gini(equal, Seq("grp"), "cat").collect().head
    assert(g0.getLong(3) == 0L)
    // Sizes 1 and 9, n=2: G = (2·(1·1 + 2·9) − 3·10) / (2·10) = 8/20 = 0.4
    val skew = (Seq.fill(1)(("g", "a")) ++ Seq.fill(9)(("g", "b"))).toDF("grp", "cat")
    val g1 = Metrics.gini(skew, Seq("grp"), "cat").collect().head
    assert(g1.getLong(1) == 2L && g1.getLong(2) == 10L && g1.getLong(3) == 400000L)
  }

  // --------------------------------------------- basket co-occurrence

  test("coOccurrence: exact pair counts and lift, presence-deduped") {
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"), // duplicate presence collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "c")
    ).toDF("basket", "item")
    val got = Indexing.coOccurrence(df, "basket", "item", minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // (a,b): n_ab=2, n_a=3, n_b=2, N=4 → lift = 2·4/(3·2) = 1.333… → 1333333
    assert(got(("a", "b")) == ((2L, 3L, 2L, 1333333L)))
    // (a,c) co-occurs once only → pruned by minPairCount
    assert(got.size == 1)
  }

  // --------------------------------------------- characteristic terms

  test("characteristicTerms ranks by tf desc then rarity (df asc)") {
    val docs = Seq(
      (1L, "x x y common"),
      (2L, "y common common"),
      (3L, "common")
    ).toDF("doc_id", "text")
    val got = Indexing.characteristicTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(4)) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: x tf=2 (df=1) first; then y (tf=1, df=2) beats common (df=3)
    assert(got((1L, 1L)) == (("x", 2L, 1L)))
    assert(got((1L, 2L)) == (("y", 1L, 2L)))
    // doc 2: common tf=2 first; then y
    assert(got((2L, 1L)) == (("common", 2L, 3L)))
    assert(got((2L, 2L)) == (("y", 1L, 2L)))
    // doc 3 has a single term → one row despite k=2
    assert(got((3L, 1L)) == (("common", 1L, 3L)))
    assert(!got.contains((3L, 2L)))
  }

  // ----------------------------------------------- vocab coverage

  test("vocabCoverage: OOV counted against the frequency-truncated vocabulary") {
    val docs = Seq(
      (1L, "a a a b b rare1"),
      (2L, "a b rare2 rare3")
    ).toDF("doc_id", "text")
    // vocabSize=2 keeps {a (4), b (3)}; rare* are OOV.
    val got = Ngrams.vocabCoverage(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((6L, 1L, 166666L)))
    assert(got(2L) == ((4L, 2L, 500000L)))
  }

  test("vocabCoverage: frequency ties at the vocab boundary break by term for determinism") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")  // both count 1
    val got = Ngrams.vocabCoverage(docs, vocabSize = 1).collect().head
    // vocab = {x} (tie broken asc by term) → y is OOV
    assert((got.getLong(1), got.getLong(2)) == ((2L, 1L)))
  }

  // --------------------------------------- incremental aggregate merge

  test("mergeAggregate applies signed deltas and drops zeroed keys") {
    val base = Seq(("k1", 2L, 100L), ("k2", 1L, 50L), ("k3", 1L, 10L))
      .toDF("k", "n_rows", "sum_v")
    val deltas = Seq(
      ("k1", "I", 7L),   // k1: 3 rows, 107
      ("k2", "D", 50L),  // k2: count hits 0 → disappears
      ("k4", "I", 5L),   // brand-new key
      ("k4", "I", 6L)
    ).toDF("k", "op", "v")
    val got = Cdc.mergeAggregate(base, deltas, Seq("k"), "v", "op")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "k1" -> ((3L, 107L)),
      "k3" -> ((1L, 10L)),
      "k4" -> ((2L, 11L))))
  }

  // ------------------------------------------- repeated-span coverage

  test("spanCoverage: hot windows cover their k word positions, overlaps unioned") {
    // "a b c" appears in docs 1,2,3 (hot at minDocs=3); doc 1 has it at
    // positions 0 and 2 (overlap at word index 2): "a b c" + "c a b c".
    val docs = Seq(
      (1L, "a b a b c x"),   // window "a b c"? windows: aba,bab,abc? no: a b a, b a b, a b c, b c x
      (2L, "a b c y"),
      (3L, "z a b c"),
      (4L, "u v w")
    ).toDF("doc_id", "text")
    val got = graft.ops.Repetition.spanCoverage(docs, minDocs = 3, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // hot gram: "a b c" (docs 1,2,3).
    // doc1 words: a b a b c x — "a b c" at start 2 covers positions 2,3,4 → 3 of 6 → kept 500000
    assert(got(1L) == ((6L, 3L, 500000L)))
    // doc2: covers 0,1,2 of 4 → kept floor(1e6/4)=250000
    assert(got(2L) == ((4L, 3L, 250000L)))
    // doc3: covers 1,2,3 of 4
    assert(got(3L) == ((4L, 3L, 250000L)))
    // doc4: nothing hot
    assert(got(4L) == ((3L, 0L, 1000000L)))
  }

  test("spanCoverage: short and empty docs are safe; overlapping hot windows union") {
    val docs = Seq(
      (1L, "p q p q p q"),   // "p q p" at 0,2; "q p q" at 1,3 — if hot, union covers all 6
      (2L, "p q p q p q"),
      (3L, "p q p q p q"),
      (4L, "xy"),            // 1 word < k → no windows
      (5L, " ")              // empty
    ).toDF("doc_id", "text")
    val got = graft.ops.Repetition.spanCoverage(docs, minDocs = 3, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((6L, 6L, 0L)))
    assert(got(4L) == ((1L, 0L, 1000000L)))
    assert(got(5L) == ((0L, 0L, 1000000L)))
  }

  test("spanRemove: hot windows drop their words, text rebuilds in position order") {
    val docs = Seq(
      (1L, "a b a b c x"),
      (2L, "a b c y"),
      (3L, "z a b c"),
      (4L, "u v w")
    ).toDF("doc_id", "text")
    val got = graft.ops.Repetition.spanRemove(docs, minDocs = 3, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // hot gram "a b c": doc1 covers positions 2,3,4 → "a b x"
    assert(got(1L) == ((6L, 3L, "a b x")))
    assert(got(2L) == ((4L, 1L, "y")))
    assert(got(3L) == ((4L, 1L, "z")))
    assert(got(4L) == ((3L, 3L, "u v w")))
    // kept_words always equals spanCoverage's n_words - covered_words
    val cov = graft.ops.Repetition.spanCoverage(docs, minDocs = 3, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    assert(got.view.mapValues(_._2).toMap == cov)
  }

  test("spanRemove: fully-hot and empty docs yield empty text; rerun is a no-op here") {
    val docs = Seq(
      (1L, "p q p q p q"),
      (2L, "p q p q p q"),
      (3L, "p q p q p q"),
      (5L, " ")
    ).toDF("doc_id", "text")
    val got = graft.ops.Repetition.spanRemove(docs, minDocs = 3, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((0L, "")))
    assert(got(5L) == ((0L, "")))
    // idempotence on the cleaned corpus: no words left → no hot windows
    val again = graft.ops.Repetition.spanRemove(
      Seq((1L, ""), (2L, ""), (3L, ""), (5L, "")).toDF("doc_id", "text"), minDocs = 3, k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again.values.forall(_ == ""))
  }

  // -------------------------------------- multi-probe ANN + recall

  test("multi-probe LSH is a superset recall lever: recall@k >= single-probe, exact self-agreement = 1") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 120L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
    val single = Similarity.lshTopK(corpus, queries, k = 5)
    val multi = Similarity.lshTopK(corpus, queries, k = 5, probeHamming = 1)
    def meanRecall(ann: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.recallAt(ann, exact, k = 5).collect()
      r.map(_.getLong(2)).sum.toDouble / r.length
    }
    val rs = meanRecall(single)
    val rm = meanRecall(multi)
    assert(rm >= rs, s"multi-probe recall $rm < single-probe $rs")
    // recall of the exact result against itself is 1 for every query
    val self = Similarity.recallAt(exact, exact, k = 5).collect()
    assert(self.length == 5 && self.forall(_.getLong(2) == 1000000L))
  }

  test("recallAt reports 0 (not absence) for queries the ANN missed entirely") {
    import graft.ops.Similarity
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val ann = Seq((1L, 11L, 1)).toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.recallAt(ann, exact, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 500000L)))
    assert(got(2L) == ((0L, 0L)))
  }

  // ------------------------------------------------ join estimate

  test("joinEstimate predicts the exact equi-join output size per key") {
    val left = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("lk")
    val right = (Seq.fill(4)("a") ++ Seq.fill(5)("b") ++ Seq("d")).toDF("rk")
    val got = Audit.joinEstimate(left, "lk", right, "rk", topN = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // a: 3·4=12; b: 2·5=10; c/d unmatched → absent. total=22.
    assert(got.toSeq == Seq(
      (1L, "a", 3L, 4L, 12L, 545454L),
      (2L, "b", 2L, 5L, 10L, 454545L)))
    // Ground truth: the actual join output size.
    assert(left.join(right, col("lk") === col("rk")).count() == 22L)
  }

  test("gini agrees with a brute-force computation on random category sizes") {
    val rnd = new scala.util.Random(7)
    val sizes = Seq.fill(12)(1 + rnd.nextInt(50))
    val rows = sizes.zipWithIndex.flatMap { case (n, i) => Seq.fill(n)(("g", f"c$i%02d")) }
    val got = Metrics.gini(rows.toDF("grp", "cat"), Seq("grp"), "cat").collect().head
    val xs = sizes.map(_.toLong).sorted
    val n = xs.size.toLong
    val sum = xs.sum
    val iSum = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expected = math.floor(1e6 * (2 * iSum - (n + 1) * sum).toDouble / (n * sum)).toLong
    assert(got.getLong(3) == expected)
  }

  // ------------------------------------------ cluster representatives

  test("representatives: argmax by (rank desc, id asc), unranked members rank lowest") {
    import graft.ops.Components
    val membership = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    // cluster 1: ranks 5, 9, 9 → tie between ids 2 and 3 → rep 2.
    // cluster 10: nobody ranked → smallest id wins → rep 10.
    val ranks = Seq((1L, 5L), (2L, 9L), (3L, 9L)).toDF("id", "rank")
    val got = Components.representatives(membership, ranks)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) == ((2L, false)))
    assert(got(2L) == ((2L, true)))
    assert(got(3L) == ((2L, false)))
    assert(got(10L) == ((10L, true)))
    assert(got(11L) == ((10L, false)))
  }

  // ------------------------------------------------- Kneser–Ney

  test("kneserNeyBigrams matches the hand-computed KN rational on a tiny corpus") {
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    // bigrams: ab ab ba ba ac → counts: ab=2, ba=2, ac=1; B=3 distinct.
    // c1(a)=3, c1(b)=2; R1(a)=2, R1(b)=1; L1(b)=1, L1(a)=1, L1(c)=1.
    val got = Ngrams.kneserNeyBigrams(docs, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    def ppm(c12: Long, c1: Long, r1: Long, l1: Long, b: Long): Long =
      math.floorDiv(1000000L * (b * (4 * c12 - 3) + 3 * r1 * l1), 4 * c1 * b)
    assert(got(("a", "b")) == ((2L, ppm(2, 3, 2, 1, 3))))
    assert(got(("b", "a")) == ((2L, ppm(2, 2, 1, 1, 3))))
    assert(got(("a", "c")) == ((1L, ppm(1, 3, 2, 1, 3))))
  }

  test("kneserNeyBigrams: per-context probabilities sum to ~1 (within floor loss)") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the cat"),
      (3L, "a cat and a dog sat")
    ).toDF("doc_id", "text")
    val rows = Ngrams.kneserNeyBigrams(docs, minCount = 1).collect()
    // KN is a proper conditional distribution over OBSERVED continuations
    // plus backoff mass for unseen ones — so per w1, the observed sum must
    // be ≤ 1e6 and > 0; with every continuation observed it approaches 1e6.
    val byW1 = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(3)).sum)
    byW1.foreach { case (w1, s) =>
      assert(s > 0 && s <= 1000000L, s"w1=$w1 observed-mass sum $s out of range")
    }
  }

  // ---------------------------------------- prefix-filter similarity join

  test("prefixFilterPairs equals the brute-force Jaccard join (no false negatives/positives)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum", "gold", "gray", "jade", "rust",
      "mint", "navy", "pink", "sand", "wine")
    val docs = (0L until 60L).map { i =>
      val n = 3 + rnd.nextInt(8)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toDF("doc_id", "text")
    val got = graft.ops.Dedup.prefixFilterPairs(docs, thresholdPpm = 400000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    // brute force over the same token sets
    val sets = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split("\\s+").filter(_.nonEmpty).toSet).toMap
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = sets(a).intersect(sets(b)).size.toLong
      u = sets(a).union(sets(b)).size.toLong
      if i * 1000000L >= 400000L * u
    } yield (a, b) -> math.floorDiv(1000000L * i, u)).toMap
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(expected.nonEmpty, "fixture produced no qualifying pairs — weaken the threshold")
  }

  test("prefixFilterPairs: exactness holds across the threshold range (property)") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector.tabulate(12)(i => f"t$i%02d")
    val docs = (0L until 40L).map { i =>
      i -> Seq.fill(2 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toDF("doc_id", "text")
    val sets = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split("\\s+").filter(_.nonEmpty).toSet).toMap
    for (t <- Seq(100000L, 250000L, 500000L, 750000L, 990000L)) {
      val got = graft.ops.Dedup.prefixFilterPairs(docs, thresholdPpm = t)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        i = sets(a).intersect(sets(b)).size.toLong
        u = sets(a).union(sets(b)).size.toLong
        if i * 1000000L >= t * u
      } yield (a, b)).toSet
      assert(got == expected, s"threshold $t: got ${got.size}, expected ${expected.size}")
    }
  }

  test("prefixFilterPairs: disjoint docs produce no candidates; identical docs hit 1e6") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.prefixFilterPairs(docs, thresholdPpm = 500000L).collect()
    assert(got.length == 1)
    assert((got.head.getLong(0), got.head.getLong(1), got.head.getLong(5)) == ((1L, 2L, 1000000L)))
  }

  // --------------------------------------------------- novelty

  test("novelty: first occurrence by min doc id; verbatim copy scores 0") {
    val docs = Seq(
      (1L, "a b c d"),        // grams: abc, bcd — both first here
      (2L, "a b c d"),        // verbatim copy → 0 new
      (3L, "a b c x y z")     // abc seen; bcx, cxy, xyz new → 3/4
    ).toDF("doc_id", "text")
    val got = Ngrams.novelty(docs, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((2L, 2L, 1000000L)))
    assert(got(2L) == ((2L, 0L, 0L)))
    assert(got(3L) == ((4L, 3L, 750000L)))
  }

  test("novelty: short docs fall back to the whole-sequence gram; repeats dedup") {
    val docs = Seq(
      (1L, "a b"),            // short fallback gram "a b" — new
      (2L, "a b"),            // same fallback gram — not new
      (3L, "p q p q p q")     // grams pqp, qpq repeat → 2 distinct, both new
    ).toDF("doc_id", "text")
    val got = Ngrams.novelty(docs, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((1L, 1L, 1000000L)))
    assert(got(2L) == ((1L, 0L, 0L)))
    assert(got(3L) == ((2L, 2L, 1000000L)))
  }

  // ------------------------------------------- LOO target encoding

  test("targetEncode: leave-one-out mean, floor division, singleton NULL") {
    import graft.ops.Normalize
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 31L),
      (4L, "b", 7L)
    ).toDF("id", "cat", "y")
    val got = Normalize.targetEncode(df, Seq("cat"), "y").select("id", "loo_code")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).contains(25L)) // (20+31)/2 = 25.5 → 25
    assert(got(2L).contains(20L)) // (10+31)/2 = 20.5 → 20
    assert(got(3L).contains(15L)) // (10+20)/2 = 15
    assert(got(4L).isEmpty)       // singleton → NULL
  }

  test("targetEncode: negative sums floor toward -inf (matching SQL floor)") {
    import graft.ops.Normalize
    val df = Seq((1L, "a", -10L), (2L, "a", -5L), (3L, "a", 0L)).toDF("id", "cat", "y")
    val got = Normalize.targetEncode(df, Seq("cat"), "y").select("id", "loo_code")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == -3L) // (-5+0)/2 = -2.5 → floor -3
    assert(got(2L) == -5L) // (-10+0)/2 = -5
    assert(got(3L) == -8L) // (-15)/2 = -7.5 → floor -8
  }

  // ---------------------------------------------- hard negatives

  test("hardNegatives: nearest different-label vectors only; positives never surface") {
    import graft.ops.Similarity
    // 1-D embeddings make similarity transparent: cosine is sign-based,
    // so order falls to the deterministic neighbor_id tie-break.
    val corpus = Seq(
      (1L, Seq(1.0f), 0), (2L, Seq(1.0f), 0), (3L, Seq(1.0f), 1),
      (4L, Seq(1.0f), 1), (5L, Seq(-1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val queries = corpus.where(col("vec_id") === 1L)
      .select(col("vec_id").as("query_id"), col("embedding"), col("label"))
    val got = Similarity.hardNegatives(corpus, queries, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    // label-0 query: candidates are label-1 vectors {3,4,5}; cosine ties
    // between 3 and 4 (both +1) break by id; 5 (cosine −1) is out at k=2.
    assert(got.toSeq == Seq((3L, 1, 1), (4L, 1, 2)))
  }

  // ------------------------------------------------- dense ids

  test("denseIds assigns the exact global enumeration across many partitions") {
    import graft.ops.Normalize
    val rnd = new scala.util.Random(41)
    val rows = (0L until 5000L).map(i => (i, rnd.nextInt(100).toLong)).toDF("id", "v")
    val got = Normalize.denseIds(rows, orderCol = "v", tieCol = "id")
      .select("id", "v", "dense_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ids are a permutation of 0..n-1 and agree with the total order
    assert(got.map(_._3).sorted.toSeq == (0L until 5000L))
    val byOrder = got.sortBy(t => (t._2, t._1)).map(_._3)
    assert(byOrder.toSeq == (0L until 5000L), "dense ids must follow the (v, id) total order")
  }

  test("rankedPrefixSum matches the global-window semantics it replaces, desc order included") {
    import graft.ops.Normalize
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(43)
    val rows = (0L until 3000L).map(i => (i, rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "v", "n").repartition(7)
    val w = Window.orderBy(col("v").desc, col("id"))
    val expected = rows
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "rk", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val got = Normalize.rankedPrefixSum(rows, Seq(col("v").desc, col("id")), "n", "rk", "cum")
      .select("id", "rk", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
  }

  // ------------------------------------------------- BPE merges

  test("bpeMerges replays the classic hand-computed merge sequence") {
    val docs = Seq((1L, "ab ab ac")).toDF("doc_id", "text")
    // word types: ab×2 → [a,b,</w>], ac×1 → [a,c,</w>]
    // r1: (a,b)=2 ties (b,</w>)=2 → smallest pair (a,b); r2: (ab,</w>)=2;
    // r3: count-1 tie → (a,c); r4: (ac,</w>); r5: no pairs → stop early.
    val got = Ngrams.bpeMerges(docs, rounds = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", 2L),
      (2L, "ab", "</w>", 2L),
      (3L, "a", "c", 1L),
      (4L, "ac", "</w>", 1L)))
  }

  test("bpeMerges: leftmost-greedy rewrite counts overlapping pairs like the reference trainer") {
    // "aaa" → [a,a,a,</w>]: (a,a) counted twice in round 1; after the
    // (a,a) merge the word is [aa,a,</w>] (leftmost-greedy, NOT [a,aa]).
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = Ngrams.bpeMerges(docs, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.head == ((1L, "a", "a", 2L)))
    // round 2 elects (aa,a): count 1, smaller than (a,</w>)… both count 1,
    // tie → lexicographic: "a" < "aa", and pair (a,</w>) has left "a" →
    // (a,</w>) wins the tie.
    assert(got(1) == ((2L, "a", "</w>", 1L)))
  }

  test("bpeMerges agrees with an in-memory reference trainer on a random corpus") {
    // Straight-line reference implementation of the same spec: pair
    // counts over word types (overlapping, frequency-weighted), election
    // by (count desc, left asc, right asc), leftmost-greedy rewrite.
    def refBpe(wordCounts: Map[String, Long], rounds: Int): Seq[(Long, String, String, Long)] = {
      var vocab: Map[Vector[String], Long] =
        wordCounts.map { case (w, n) => (w.map(_.toString).toVector :+ "</w>") -> n }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      for (r <- 1 to rounds if out.size == r - 1) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, n) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
          }
        }
        if (counts.nonEmpty) {
          val ((l, rt), cnt) = counts.toSeq.minBy { case ((l, rt), c) => (-c, l, rt) }
          out += ((r.toLong, l, rt, cnt))
          vocab = vocab.groupMapReduce { case (syms, _) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rt) {
                b += (l + rt); i += 2
              } else { b += syms(i); i += 1 }
            }
            b.result()
          }(_._2)(_ + _)
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(23)
    val words = Seq.fill(150)(Seq.fill(2 + rnd.nextInt(5))(('a' + rnd.nextInt(4)).toChar).mkString)
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Ngrams.bpeMerges(docs, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val expected = refBpe(words.groupBy(identity).view.mapValues(_.size.toLong).toMap, rounds = 8)
    assert(got == expected)
  }

  test("bpeMerges batched: disjoint prefix applies in one round, conflicts stop the batch") {
    // word types: ab×3 [a,b,</w>], cd×2 [c,d,</w>].
    // Round-1 election order: (a,b)=3, (b,</w>)=3 … tie → (a,b) first;
    // next disjoint candidate in order is (c,d)=2 — but (b,</w>) sits
    // between them and CONFLICTS on b, so the prefix rule stops at it:
    // batch 1 = [(a,b)] only. Sequential equivalence holds regardless.
    val docs = Seq((1L, "ab ab ab cd cd")).toDF("doc_id", "text")
    val batched = Ngrams.bpeMerges(docs, rounds = 6, batch = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val sequential = Ngrams.bpeMerges(docs, rounds = 6, batch = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // On this corpus no merge ever creates a pair that out-ranks a later
    // batch member, so batched == sequential — the equivalence case.
    assert(batched == sequential)
    assert(batched.head == ((1L, "a", "b", 3L)))
  }

  test("bpeMerges batched: recorded counts are exact at merge time (disjointness)") {
    // Two independent high-frequency pairs in one batch: (a,b) and (c,d)
    // share no symbol, so both merge in round 1 with their true counts.
    // Election order: (a,b)=5, (c,d)=5 → tie by pair: a<c so (a,b) first,
    // then (b,</w>)? No — (b,</w>)=5 too: order is (a,b),(b,</w>),(c,d)…
    // (b,</w>) conflicts on b → batch stops after (a,b). So assert merges
    // arrive in SOME valid order with exact counts, and determinism.
    val docs = Seq((1L, ("ab " * 5) + ("cd " * 5))).toDF("doc_id", "text")
    val a = Ngrams.bpeMerges(docs, rounds = 4, batch = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b = Ngrams.bpeMerges(docs, rounds = 4, batch = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(a == b) // deterministic across runs
    assert(a.head == ((1L, "a", "b", 5L)))
    assert(a.map(m => (m._2, m._3)).contains(("c", "d")))
    assert(a.find(m => m._2 == "c" && m._3 == "d").get._4 == 5L)
  }

  test("bpeEncodeStats: merges apply in rank order, leftmost-greedy; fertility exact") {
    val docs = Seq((1L, "abab ac"), (2L, "")).toDF("doc_id", "text")
    // merges: (a,b)→ab then (ab,ab)→abab then (abab,</w>)
    val merges = Seq(("a", "b"), ("ab", "ab"), ("abab", "</w>"))
    val got = Ngrams.bpeEncodeStats(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "abab": a b a b </w> → ab ab </w> → abab </w> → abab</w> = 1 subword
    // "ac":   a c </w> → unchanged by all merges = 3 subwords
    assert(got(1L) == ((2L, 4L, 2000000L)))
    assert(got(2L) == ((0L, 0L, 0L)))
  }

  test("bpeEncodeStats round-trips the trainer: encoding the training corpus with its own merges") {
    val docs = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val merges = Ngrams.bpeMerges(docs, rounds = 6)
      .orderBy("merge_rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Ngrams.bpeEncodeStats(docs, merges).collect().head
    // 6 merges on this corpus fully assemble "low</w>" and reduce "lower</w>"
    // to ≤ 2 symbols: 5 words → at most 3+2·2 = 7 subwords, ≥ 5.
    assert(got.getLong(1) == 5L)
    assert(got.getLong(2) >= 5L && got.getLong(2) <= 7L)
  }

  // ---------------------------------------------- leak-free split

  test("groupSplit: a whole group lands in one split; singletons key by own id") {
    import graft.ops.Sampling
    val docs = (0L until 40L).toDF("doc_id")
    val membership = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val rows = Sampling.groupSplit(docs, membership)
      .select("doc_id", "group_id", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byGroup = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    // every group is split-pure
    byGroup.foreach { case (g, splits) => assert(splits.size == 1, s"group $g straddles $splits") }
    // grouped rows share their family's split
    val split0 = rows.filter(_._1 == 0L).head._3
    assert(rows.filter(r => Set(1L, 2L).contains(r._1)).forall(_._3 == split0))
    // singletons use their own id as group key
    assert(rows.filter(_._1 == 39L).head._2 == 39L)
    // with 40 ids and the default 204/230 bounds, all three splits appear
    assert(rows.map(_._3).toSet == Set("train", "val", "test"))
  }
}

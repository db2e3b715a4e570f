package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.ops.{Audit, Chunking, Decontaminate, Dedup, Similarity}

/** Corpus-hygiene additions: segment-level dedup with reassembly,
  * cross-corpus novelty, split-leakage audit, whole-token truncation,
  * blocked semantic dedup, and the exact integer dot kernel.
  */
class CorpusHygieneSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------- segment dedup

  test("segmentDedup: corpus-wide first occurrence wins, docs reassembled in order") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d a b"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, segWords = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 owns both "a b" and "c d"; doc 2 keeps only its novel tail;
    // doc 3 is entirely seen-before; the empty doc survives untouched.
    assert(got(1L) == (("a b c d", 2L, 0L)))
    assert(got(2L) == (("x y", 2L, 1L)))
    assert(got(3L) == (("", 2L, 2L)))
    assert(got(4L) == (("", 0L, 0L)))
  }

  test("segmentDedup: a within-doc repeat dedups against its own earlier segment") {
    val docs = Seq((7L, "p q p q z")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, segWords = 2).collect().head
    assert(got.getString(1) == "p q z")
    assert(got.getLong(2) == 3L && got.getLong(3) == 1L)
  }

  test("segmentDedup: the final short block is its own segment, not padded or dropped") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, segWords = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 2's single-word doc matches doc 1's trailing block "c"
    assert(got(1L) == "a b c" && got(2L) == "")
  }

  test("segmentDedup invariant: dropped total = segment total − distinct fingerprints (random corpus)") {
    // deterministic pseudo-random corpus with a small vocabulary so
    // segment collisions actually occur
    val rng = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (1L to 40L).map { i =>
      val n = rng.nextInt(12)
      (i, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, segWords = 3)
    val (totSegs, totDropped) = got.agg(sum("n_segments"), sum("n_dropped"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    // distinct fingerprints, recomputed independently of the operator
    val distinctSegs = docs
      .select(col("doc_id"), Dedup.wordTokens(col("text")).as("w"))
      .where(size(col("w")) > 0)
      .select(explode(transform(
        sequence(lit(0), (ceil(size(col("w")) / 3.0) - 1).cast("int")),
        i => concat_ws(" ", slice(col("w"), i * 3 + 1, lit(3))))).as("seg"))
      .select(countDistinct(col("seg"))).collect().head.getLong(0)
    assert(totSegs - totDropped == distinctSegs,
      s"kept $totSegs-$totDropped, expected $distinctSegs distinct segments")
    // and every clean_text re-tokenizes to a subsequence of the original tokens
    val bad = got.join(docs, "doc_id")
      .where(!col("text").startsWith(col("clean_text")) && col("n_dropped") === 0)
      .count()
    assert(bad == 0, "an undropped doc's clean_text diverged from its source")
  }

  test("segmentDupProfile: cluster-size histogram over segment fingerprints") {
    val docs = Seq(
      (1L, "a b c d"),   // segs: "a b", "c d"
      (2L, "a b x y"),   // "a b" (2nd), "x y"
      (3L, "a b")        // "a b" (3rd)
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDupProfile(docs, segWords = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "a b" occurs 3×; "c d" and "x y" once each
    assert(got == Map(1L -> ((2L, 2L)), 3L -> ((1L, 3L))))
  }

  test("crossGroupOverlap counts DISTINCT shared segments per group pair") {
    val docs = Seq(
      (1L, "s1", "a b c d"),
      (2L, "s1", "a b"),        // "a b" twice within s1 — still one distinct
      (3L, "s2", "a b z z"),
      (4L, "s3", "q q")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.crossGroupOverlap(docs, segWords = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("s1", "s2") -> 1L)) // only "a b" is shared; s3 overlaps nothing
  }

  test("log2Histogram: integer bit-length buckets, zeros in bucket 0") {
    val df = Seq(("a", 0L), ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("b", 1024L))
      .toDF("g", "v")
    val got = graft.ops.Metrics.log2Histogram(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("a", 0)) == ((1L, 0L, 0L, 0L)))
    assert(got(("a", 1)) == ((1L, 1L, 1L, 1L)))
    assert(got(("a", 2)) == ((2L, 5L, 2L, 3L)))  // 2 and 3 share bit length 2
    assert(got(("a", 3)) == ((1L, 4L, 4L, 4L)))
    assert(got(("b", 11)) == ((1L, 1024L, 1024L, 1024L))) // 2^10 → 11 bits
  }

  // ------------------------------------------- cross-corpus novelty

  test("crossCorpusNovel equals the exact anti-join on content fingerprints") {
    val target = Seq((1L, "alpha beta"), (2L, "gamma  delta"), (3L, "unique here")).toDF("doc_id", "text")
    val ref = Seq((10L, "ALPHA BETA"), (11L, "gamma delta"), (12L, "other")).toDF("doc_id", "text")
    // fingerprints normalize case and whitespace, so docs 1 and 2 are dups
    val got = Dedup.crossCorpusNovel(target, ref, expectedItems = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("crossCorpusNovel: an undersized bloom loses no rows (false positives only)") {
    val target = (1L to 200L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val ref = (1L to 200L).filter(_ % 3 == 0).map(i => (i + 1000, s"doc number $i")).toDF("doc_id", "text")
    val got = Dedup.crossCorpusNovel(target, ref, expectedItems = 4) // absurdly small
      .select("doc_id").as[Long].collect().toSet
    assert(got == (1L to 200L).filterNot(_ % 3 == 0).toSet)
  }

  // ------------------------------------------- split leakage

  test("splitLeakage counts cross-split pairs; endpoints missing a split drop out") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 99L)).toDF("a_id", "b_id")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "test")).toDF("doc_id", "split")
    val got = Audit.splitLeakage(pairs, splits).collect().head
    // (1,2) crosses, (2,3) doesn't, (3,99) has no split for 99 → dropped
    assert((got.getLong(0), got.getLong(1)) == ((2L, 1L)))
  }

  test("splitLeakage reports 0 for a component-grouped split of the same relation") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val comps = graft.ops.Components.connectedComponents(pairs)
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val split = graft.ops.Sampling.groupSplit(docs, comps)
    val got = Audit.splitLeakage(pairs, split).collect().head
    assert(got.getLong(0) == 3L && got.getLong(1) == 0L)
  }

  // ------------------------------------------- token truncation

  test("truncateTokens cuts at whole tokens; exactly-max docs are not flagged") {
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "one two"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Chunking.truncateTokens(docs, maxTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2), r.getString(3)))).toMap
    assert(got(1L) == ((4, true, "one two")))
    assert(got(2L) == ((2, false, "one two")))
    assert(got(3L) == ((0, false, "")))
  }

  // ------------------------------------------- semantic dedup

  test("semanticDedup drops the larger id of a within-block near-pair; blocks isolate") {
    val mk = (x: Double, y: Double) => Array(x.toFloat, y.toFloat)
    val emb = Seq(
      (1L, 0, mk(1.0, 0.0)),
      (2L, 0, mk(0.9995, 0.0316)), // cos vs v1 ≈ 0.9995 → dropped
      (3L, 0, mk(0.0, 1.0)),       // orthogonal → kept
      (4L, 1, mk(1.0, 0.0))        // near-dup of v1 but different block → kept
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.semanticDedup(emb)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false, 4L -> false))
  }

  test("semanticDedup: the threshold test is exact at the integer boundary") {
    // After quantization at scale 1024: a=(3,4)→(3072,4096), b=(4,3)→(4096,3072).
    // dot=2*3072*4096=25165824, n2=26214400 each → cos = 24/25 = 0.96 exactly.
    val emb = Seq(
      (1L, 0, Array(3.0f, 4.0f)),
      (2L, 0, Array(4.0f, 3.0f))
    ).toDF("vec_id", "label", "embedding")
    def dropped(num: Int, den: Int): Boolean =
      Similarity.semanticDedup(emb, tauNum = num, tauDen = den)
        .where(col("vec_id") === 2L).select("dropped").as[Boolean].collect().head
    assert(dropped(24, 25))  // τ = cos exactly → ≥ holds → dropped
    assert(!dropped(97, 100)) // τ just above → kept
  }

  // ------------------------------------------- pack offsets

  test("packOffsets: offsets restart at each pack boundary and never exceed the budget") {
    val docs = (1L to 60L).map(i => (i, ("tok " * 100).trim)).toDF("doc_id", "text")
    val got = graft.jobs.CorpusPrep.packOffsets(docs, budgetTokens = 256, nShards = 2).collect()
    got.foreach { r =>
      val (tok, packId, off) = (r.getLong(r.fieldIndex("tok")),
        r.getLong(r.fieldIndex("pack_id")), r.getLong(r.fieldIndex("offset_tok")))
      assert(off >= 0 && off < 256, s"offset out of range: $r")
      assert(tok == 100L)
      // offset must equal (exclusive cum) − pack_id·budget by construction:
      // re-derivable as (pack docs before me)·tok − pack start
      assert((off + packId * 256) % 100 == 0, s"offset not a whole-doc boundary: $r")
    }
    // within every (split, shard, pack), offsets are distinct and start at the min
    val grouped = got.groupBy(r => (r.getString(r.fieldIndex("split")),
      r.getLong(r.fieldIndex("shard")), r.getLong(r.fieldIndex("pack_id"))))
    grouped.foreach { case (_, rows) =>
      val offs = rows.map(_.getLong(rows.head.fieldIndex("offset_tok"))).sorted
      assert(offs.distinct.length == offs.length)
    }
  }

  // ------------------------------------------- overlap stats

  test("overlapStats: ppm degree per train doc; clean and short docs report zeros") {
    val train = Seq(
      (1L, "a b c d e"),       // grams: "a b c","b c d","c d e" — 2 hits
      (2L, "x y z w"),          // no overlap
      (3L, "a b")               // too short for 3-grams
    ).toDF("doc_id", "text")
    val test = Seq((10L, "a b c d q")).toDF("doc_id", "text") // grams: "a b c","b c d","c d q"
    val got = Decontaminate.overlapStats(train, test, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 2L, 666666L)))
    assert(got(2L) == ((2L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("overlapStats counts DISTINCT grams — a repeated shared gram is one hit") {
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val test = Seq((9L, "a b c")).toDF("doc_id", "text")
    val got = Decontaminate.overlapStats(train, test, n = 3).collect().head
    // distinct grams of train doc: "a b c","b c a","c a b" and "a b c" again → 3 distinct, 1 hit
    assert((got.getLong(1), got.getLong(2)) == ((3L, 1L)))
  }

  // ------------------------------------------- block centroids

  test("blockCentroids: exact integer sums and floor-means per (block, dim)") {
    val emb = Seq(
      (1L, 0, Array(1.0f, -1.0f)),
      (2L, 0, Array(0.5f, 0.25f)),
      (3L, 1, Array(2.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.blockCentroids(emb, scale = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // label 0 dim 1: q = 4, 2 → sum 6, floor(6/2)=3 ; dim 2: -4, 1 → sum -3, floor(-1.5) = -2
    assert(got((0, 1)) == ((2L, 6L, 3L)))
    assert(got((0, 2)) == ((2L, -3L, -2L)))
    assert(got((1, 1)) == ((1L, 8L, 8L)))
  }

  test("intDot matches the interpreted HOF fold and stays integer-exact") {
    val df = Seq((Array(1L, -2L, 3L), Array(7L, 11L, -13L))).toDF("a", "b")
    val native = df.select(VectorFunctions.intDot(col("a"), col("b"))).as[Long].collect().head
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x))
      .as[Long].collect().head
    assert(native == hof && native == (7L - 22L - 39L))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.VectorFunctions
import graft.functions.expressions.{DotProduct, HyperplaneBucket, SketchHash}

/** The native codegen expressions must agree exactly with their
  * higher-order-function reference formulations (same accumulation order,
  * same null-safety), on both the codegen and interpreted eval paths.
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val vecs = Seq.fill(50)(
    (Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1)))

  test("native dot/cosine are bit-identical to the HOF reference forms") {
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.dotHof(col("a"), col("b")).as("dh"),
      VectorFunctions.cosine(col("a"), col("b")).as("c"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("ch")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot != dotHof")
      assert(r.getDouble(2) == r.getDouble(3), "cosine != cosineHof")
    }
  }

  test("quantizeInt8MaxAbs is bit-identical to the staged HOF pair") {
    // random vectors + edge cases: all-zero, empty, null elements, all-null
    val base = vecs.map(_._1)
    val edge = Seq(Seq.fill(8)(0.0f), Seq.empty[Float])
    val df = (base ++ edge).map(v => Tuple1(v.map(Option(_)))).toDF("v")
      .union(Seq(Tuple1(Seq(Option(1.5f), None, Option(-2.5f)))).toDF("v"))
      .union(Seq(Tuple1(Seq.fill(3)(Option.empty[Float]))).toDF("v"))
    val rows = df.select(
      VectorFunctions.quantizeInt8MaxAbs(col("v")).as("fused"),
      VectorFunctions.quantizeInt8(col("v"), VectorFunctions.maxAbs(col("v"))).as("staged")
    ).collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"fused=${r.getSeq[Any](0)} staged=${r.getSeq[Any](1)}")
    }
    // interpreted eval path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit = Literal.create(Seq(1.0f, -2.0f, 0.5f), ArrayType(FloatType))
    val interp = graft.functions.expressions.QuantizeInt8MaxAbs(lit).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val viaDf = Seq(Tuple1(Seq(1.0f, -2.0f, 0.5f))).toDF("v")
      .select(VectorFunctions.quantizeInt8MaxAbs(col("v"))).head().getSeq[Long](0)
    assert(interp == viaDf)
  }

  test("native expressions: interpreted eval path matches codegen result") {
    val a = Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType))
    val b = Literal.create(Seq(4.0, 5.0, 6.0), ArrayType(DoubleType))
    assert(DotProduct(a, b).eval() == 32.0)
    val viaDf = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).head().getDouble(0)
    assert(viaDf == 32.0)
  }

  test("hyperplane bucket is scale-invariant and deterministic") {
    val df = vecs.map(_._1).map(v => (v, v.map(_ * 2.5f))).toDF("v", "v2")
    val rows = df.select(
      VectorFunctions.simhashBucket(col("v"), nBits = 8, seed = 3).as("b1"),
      VectorFunctions.simhashBucket(col("v2"), nBits = 8, seed = 3).as("b2")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), "bucket not scale-invariant"))
    // deterministic across plans/JVMs: pure function of (bit, i, seed)
    assert(HyperplaneBucket.coef(3, 17, 42) == HyperplaneBucket.coef(3, 17, 42))
    assert(HyperplaneBucket.coef(3, 17, 42) != HyperplaneBucket.coef(4, 17, 42))
  }

  test("minhash signature estimates jaccard: 1 for identical, ~0 for disjoint") {
    val df = Seq((
      (1 to 100).map(_.toLong),
      (1 to 100).map(_.toLong),
      (1001 to 1100).map(_.toLong))).toDF("s1", "s2", "s3")
    val r = df.select(
      VectorFunctions.minhashSignature(col("s1"), 64).as("m1"),
      VectorFunctions.minhashSignature(col("s2"), 64).as("m2"),
      VectorFunctions.minhashSignature(col("s3"), 64).as("m3")).head()
    val (m1, m2, m3) = (r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[Long](2))
    assert(m1 == m2)
    assert(m1.size == 64)
    val overlap = m1.zip(m3).count { case (x, y) => x == y }
    assert(overlap <= 3, s"disjoint sets should share ~no mins, shared $overlap")
  }

  test("simhash64: identical tokens equal; near-identical docs are close in hamming") {
    val base = (1 to 200).map(i => s"tok$i")
    val df = Seq((base, base, base.updated(0, "changed").updated(1, "words"))).toDF("t1", "t2", "t3")
    val r = df.select(
      VectorFunctions.simhash64(col("t1")),
      VectorFunctions.simhash64(col("t2")),
      VectorFunctions.simhash64(col("t3"))).head()
    assert(r.getLong(0) == r.getLong(1))
    val hamming = java.lang.Long.bitCount(r.getLong(0) ^ r.getLong(2))
    assert(hamming <= 16, s"2/200 token change moved $hamming of 64 bits")
    assert(SketchHash.hash64(org.apache.spark.unsafe.types.UTF8String.fromString("a")) !=
      SketchHash.hash64(org.apache.spark.unsafe.types.UTF8String.fromString("b")))
  }

  test("shingle hashes: distinct, order-sensitive windows, short-doc fallback") {
    val df = Seq((
      Seq("a", "b", "c", "d"),        // 2 shingles of 3: abc, bcd
      Seq("a", "b"),                  // < k → one shingle over all words
      Seq("x", "b", "c", "d"),        // windows xbc, bcd — shares only bcd with t1
      Seq("a", "b", "c", "a", "b", "c", "d"))).toDF("t1", "t2", "t3", "t4")
    val r = df.select(
      VectorFunctions.shingleHashes(col("t1"), 3),
      VectorFunctions.shingleHashes(col("t2"), 3),
      VectorFunctions.shingleHashes(col("t3"), 3),
      VectorFunctions.shingleHashes(col("t4"), 3)).head()
    val (s1, s2, s3, s4) = (r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3))
    assert(s1.size == 2 && s2.size == 1)
    assert(s1.intersect(s3).size == 1) // only "b c d" survives the reorder
    // duplicate window "a b c" deduped: windows = abc,bca,cab,abc,bcd → 4 distinct
    assert(s4.size == 4 && s4.toSet.size == 4)
    assert(s1.forall(h => s4.contains(h)))
  }

  test("count occurrences: native indexOf scan matches the length/replace form") {
    val texts = Seq(
      " the cat and the dog and the bird ",
      "aaaa",            // overlap: "aa" counts 2 non-overlapping, not 3
      "no match here",
      "",                // empty haystack
      " ééé ü the ü ")   // multi-byte chars: char semantics, not bytes
      .toDF("t")
    Seq(" the ", "aa", "ü").foreach { needle =>
      val rows = texts.select(
        graft.functions.TextFunctions.occurrences(col("t"), needle).as("n"),
        graft.functions.TextFunctions.occurrencesHof(col("t"), needle).as("nh")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"needle '$needle' on ${r}"))
    }
  }

  test("regexp count: native matcher walk matches size(regexp_extract_all)") {
    val texts = Seq(
      "Hello, world! 42 tokens?",
      "a1b2c3",                      // alternating runs
      "",                            // empty
      "    ",                        // whitespace only (zero tokens)
      "ünïcödé mixed ASCII 7 ...",   // multi-byte chars + symbol runs
      "x" * 5000)                    // long single run
      .toDF("t")
    val rows = texts.select(
      graft.functions.TextFunctions.tokenCount(col("t")).as("n"),
      graft.functions.TextFunctions.tokenCountHof(col("t")).as("nh")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"$r"))
    // and the random cross-check, both engines' count on arbitrary text
    val rnd = new scala.util.Random(11)
    val alphabet = "ab1 ,.!\tZ9é"
    val fuzz = (1 to 200).map(_ =>
      Tuple1((0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString))
      .toDF("t")
    val fr = fuzz.select(
      graft.functions.TextFunctions.tokenCount(col("t")).as("n"),
      graft.functions.TextFunctions.tokenCountHof(col("t")).as("nh")).collect()
    fr.foreach(r => assert(r.getLong(0) === r.getLong(1), s"$r"))
  }

  test("sorted intersect count matches size(array_intersect) on sorted distinct arrays") {
    val pairs = Seq.fill(80) {
      val a = Seq.fill(1 + rnd.nextInt(30))(f"w${rnd.nextInt(40)}%02d").distinct.sorted
      val b = Seq.fill(1 + rnd.nextInt(30))(f"w${rnd.nextInt(40)}%02d").distinct.sorted
      (a, b)
    } :+ ((Seq.empty[String], Seq("w01"))) // empty side
    val rows = pairs.toDF("a", "b").select(
      VectorFunctions.sortedIntersectCount(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"native $r"))
    // long-element variant
    val lp = Seq((Seq(1L, 3L, 7L, 9L), Seq(2L, 3L, 9L, 11L))).toDF("a", "b")
    assert(lp.select(VectorFunctions.sortedIntersectCount(col("a"), col("b")))
      .head().getLong(0) == 2L)
  }

  test("nearest lattice centroid: exact integer argmin, ties to smallest cid") {
    import graft.functions.expressions.LatticeCodebook
    val cb = spark.sparkContext.broadcast(LatticeCodebook(
      Array(0L, 1L, 2L),
      Array(Array(0L, 0L), Array(10L, 0L), Array(5L, 5L))))
    val pts = Seq(
      (1L, Seq(1L, 0L)),   // d² = 1 / 81 / 41 → cid 0
      (2L, Seq(10L, 1L)),  // d² = 101 / 1 / 41 → cid 1
      (3L, Seq(5L, 0L))    // d² = 25 / 25 / 25 → three-way tie → cid 0
    ).toDF("id", "qv")
    val got = pts.select(col("id"),
      VectorFunctions.nearestLatticeCentroid(col("qv"), cb).as("best"))
      .select(col("id"), col("best")(0).as("cid"), col("best")(1).as("dist"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((0L, 1L)))
    assert(got(2L) == ((1L, 1L)))
    assert(got(3L) == ((0L, 25L)))
  }

  test("SQL surface: graft_* functions registered via SparkSessionExtensions") {
    val occ = spark.sql("SELECT graft_count_occurrences(' a b a ', 'a') AS n").head().getLong(0)
    assert(occ == 2L)
    val d = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(d == 11.0)
    val c = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head().getDouble(0)
    assert(c == 1.0)
    val sig = spark.sql("SELECT graft_minhash_sig(array(1L, 2L), 8) AS s").head().getSeq[Long](0)
    assert(sig.size == 8)
    val bkt = spark.sql("SELECT graft_hyperplane_bucket(array(1.0D, -1.0D), 8, 42) AS b").head().getLong(0)
    assert(bkt >= 0L && bkt < 256L)
    val sh = spark.sql("SELECT graft_simhash64(array('a', 'b')) AS h").head().getLong(0)
    assert(sh != 0L)
    val sic = spark.sql(
      "SELECT graft_sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n")
      .head().getLong(0)
    assert(sic == 2L)
    val psh = spark.sql(
      "SELECT graft_positional_shingle_hashes(array('a','b','c'), 2) AS g").head().getSeq[Long](0)
    assert(psh.size == 2)
    val idot = spark.sql("SELECT graft_int_dot(array(2L, -3L), array(5L, 7L)) AS d").head().getLong(0)
    assert(idot == -11L)
    val rc = spark.sql("SELECT graft_regexp_count('ab1 cd2', '[a-z]+') AS n").head().getLong(0)
    assert(rc == 2L)
  }

  test("positional shingle hashes: order-preserving, content-determined, empty below k") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "a", "b")),
      (2L, Seq("a", "b")),
      (3L, Seq.empty[String])).toDF("id", "w")
    val got = df.select(col("id"),
      VectorFunctions.positionalShingleHashes(col("w"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).size == 3)
    // identical window content => identical hash, regardless of position…
    val again = df.where(col("id") === 1L).select(
      VectorFunctions.positionalShingleHashes(col("w"), 2).as("g")).head().getSeq[Long](0)
    assert(again.size == 4 && again(0) == again(3), "'a b' windows at 0 and 3 must agree")
    // …and adjacent different windows differ
    assert(again(0) != again(1))
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }
}

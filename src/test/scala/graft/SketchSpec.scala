package graft

import graft.ops.{Sampling, Sketch}

/** Deterministic HLL and the Poisson bootstrap: exact in-memory replays
  * of the md5-contract draws plus statistical sanity floors.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)

  // ---- HLL ----------------------------------------------------------------

  private def referenceRegisters(values: Seq[String], b: Int): Map[Long, Long] = {
    val wBits = 32 - b
    val regs = scala.collection.mutable.Map((0L until (1L << b)).map(_ -> 0L): _*)
    for (v <- values) {
      val u = u32(v)
      val bucket = u >> wBits
      val w = u & ((1L << wBits) - 1)
      val rank =
        if (w == 0) wBits + 1L
        else (1 to wBits).find(r => w >= (1L << (wBits - r))).get.toLong
      regs(bucket) = math.max(regs(bucket), rank)
    }
    regs.toMap
  }

  test("hllRegisters matches the in-memory replay, duplicates free") {
    val values = (1 to 500).map(i => s"v${i % 200}") // 200 distinct, heavy dups
    val got = Sketch.hllRegisters(values.toDF("v"), "v", b = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 64)
    assert(got == referenceRegisters(values.map(v => v), 6))
    // duplicate-insensitivity: the distinct set sketches identically
    val dedup = Sketch.hllRegisters(values.distinct.toDF("v"), "v", b = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == dedup)
  }

  test("hllMerge: per-register max of shard sketches equals the whole-set sketch") {
    val values = (1 to 900).map(i => s"v${i % 400}")
    val (evens, odds) = values.zipWithIndex.partition(_._2 % 2 == 0)
    val ra = Sketch.hllRegisters(evens.map(_._1).toDF("v"), "v", b = 6)
    val rb = Sketch.hllRegisters(odds.map(_._1).toDF("v"), "v", b = 6)
    val merged = Sketch.hllMerge(ra, rb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val whole = Sketch.hllRegisters(values.toDF("v"), "v", b = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == whole)
    // commutative, idempotent — fold order over shards never matters
    val swapped = Sketch.hllMerge(rb, ra)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(swapped == merged)
    val self = Sketch.hllMerge(ra, ra)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(self == ra.collect().map(r => (r.getLong(0), r.getLong(1))).toMap)
    // the sketch-only estimate over merged registers equals the direct one
    val eMerged = Sketch.hllEstimate(Sketch.hllMerge(ra, rb), b = 6).head()
    val eWhole = Sketch.hllEstimate(Sketch.hllRegisters(values.toDF("v"), "v", b = 6), b = 6).head()
    assert(eMerged == eWhole)
  }

  test("hllProfile: integer estimator replays and lands near the truth") {
    for (n <- Seq(300, 3000)) {
      val values = (1 to n).map(i => s"item-$i")
      val r = Sketch.hllProfile(values.toDF("v"), "v", b = 6).head()
      val (m, nZero, sNum, est6, exact) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(m == 64 && exact == n)
      // replay the estimator from the replayed registers
      val regs = referenceRegisters(values, 6)
      val sNumWant = regs.values.map(mr => 1L << (27 - mr)).sum
      assert(sNum == sNumWant)
      assert(est6 == 709340L * 64 * 64 * (1L << 27) / sNumWant)
      if (n == 3000) assert(nZero == 0L)
      // raw HLL with m=64 has ~13% relative error; 35% is a safe floor
      // for a fixed hash (no randomness: this is a regression pin)
      val rel = math.abs(est6 / 1e6 - n) / n
      assert(rel < 0.35, s"n=$n est=${est6 / 1e6} rel=$rel")
    }
  }

  test("hllByGroup: every group equals the single-group profile") {
    val rows = (1 to 2000).map(i => (s"g${i % 3}", s"v${i % (200 + (i % 3) * 150)}"))
    val got = Sketch.hllByGroup(rows.toDF("g", "v"), "g", "v", b = 6)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set("g0", "g1", "g2"))
    for (g <- got.keySet) {
      val single = Sketch.hllProfile(
        rows.filter(_._1 == g).map(_._2).toDF("v"), "v", b = 6).head()
      assert(got(g) == ((single.getLong(1), single.getLong(2), single.getLong(3), single.getLong(4))),
        s"group $g diverged from hllProfile")
    }
  }

  // ---- Poisson bootstrap --------------------------------------------------

  private def kOf(u: Long): Long = {
    val c = Sampling.PoissonCum
    c.count(t => u >= t).toLong
  }

  test("poissonBootstrap matches the in-memory md5 replay exactly") {
    val rows = (1L to 300L).map(i => (i, i % 17))
    val b = 8
    val got = Sampling.poissonBootstrap(rows.toDF("id", "v"), "id", "v", replicates = b)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = (0L until b.toLong).map { rep =>
      val ks = rows.map { case (id, v) => (kOf(u32(s"$id:$rep")), v) }
      (rep, (ks.map(_._1).sum, ks.map { case (k, v) => k * v }.sum))
    }.toMap
    assert(got == want)
  }

  test("poissonBootstrap replicate means bracket the truth (CI sanity)") {
    val rows = (1L to 2000L).map(i => (i, 10L + (i % 21))) // mean 20
    val got = Sampling.poissonBootstrap(rows.toDF("id", "v"), "id", "v", replicates = 32)
      .collect().map(r => r.getLong(2).toDouble / r.getLong(1))
    assert(got.length == 32)
    val lo = got.min; val hi = got.max
    assert(lo <= 20.2 && hi >= 19.8, s"bootstrap range [$lo, $hi] should bracket ~20")
    assert(hi - lo < 2.0, s"replicate spread ${hi - lo} implausibly wide for n=2000")
  }

  // ---- KMV ------------------------------------------------------------

  test("kmvProfile: estimator replays from the k-th minimum and lands near truth") {
    val values = (1 to 5000).map(i => s"item-${i % 1500}") // 1500 distinct
    val r = Sketch.kmvProfile(values.toDF("v"), "v", k = 128).head()
    val (k, kth, est, exact) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(k == 128 && exact == 1500)
    val us = values.map(u32).distinct.sorted
    assert(kth == us(127))
    assert(est == 127L * 4294967296L / us(127))
    assert(math.abs(est - 1500.0) / 1500 < 0.3, s"est $est far from 1500")
  }

  test("kmvProfile: fewer distincts than k is degenerate-exact") {
    val values = Seq("a", "b", "c", "a")
    val r = Sketch.kmvProfile(values.toDF("v"), "v", k = 16).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((0L, 3L, 3L)))
  }

  test("kmvJaccard: estimator replays from the union sketch; exact beside it") {
    val a = (1 to 900).map(i => s"w$i")        // |A| = 900
    val b = (601 to 1400).map(i => s"w$i")     // |B| = 800, |A∩B| = 300, |A∪B| = 1400
    val r = Sketch.kmvJaccard(a.toDF("v"), b.toDF("v"), "v", k = 128).head()
    val (k, nSketch, nShared, estPpm, nInter, nUnion, exactPpm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(k == 128 && nSketch == 128 && nInter == 300 && nUnion == 1400)
    assert(exactPpm == 1000000L * 300 / 1400)
    // replay: bottom-128 of the union hashes, shared = in both
    val ua = a.map(u32).toSet; val ubs = b.map(u32).toSet
    val bottom = (ua ++ ubs).toSeq.sorted.take(128)
    val sharedWant = bottom.count(u => ua(u) && ubs(u))
    assert(nShared == sharedWant)
    assert(estPpm == 1000000L * sharedWant / 128)
    // the estimate should be in the neighborhood of the truth (~214286 ppm)
    assert(math.abs(estPpm - exactPpm) < 120000, s"est $estPpm vs exact $exactPpm")
  }

  test("kmvJaccard degenerate cases: identical sets and sub-k unions are exact") {
    val a = (1 to 50).map(i => s"x$i")
    val r = Sketch.kmvJaccard(a.toDF("v"), a.toDF("v"), "v", k = 256).head()
    assert(r.getLong(1) == 50L && r.getLong(2) == 50L)   // sketch = union, all shared
    assert(r.getLong(3) == 1000000L && r.getLong(6) == 1000000L)
    val disjoint = Sketch.kmvJaccard(a.toDF("v"),
      (1 to 50).map(i => s"y$i").toDF("v"), "v", k = 256).head()
    assert(disjoint.getLong(2) == 0L && disjoint.getLong(3) == 0L)
  }

  // ---- count-min --------------------------------------------------------

  test("countMinTopK: estimates replay and upper-bound the exact counts") {
    val rnd = new scala.util.Random(7)
    // zipf-ish: value i appears ~ 600/i times
    val values = (1 to 40).flatMap(i => Seq.fill(600 / i)(s"k$i")) ++
      (1 to 300).map(i => s"tail$i")
    val got = Sketch.countMinTopK(rnd.shuffle(values).toDF("v"), "v",
      rows = 4, width = 64, topK = 10)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.length == 10)
    // rank 1 is the most frequent value
    assert(got.find(_._2._3 == 1L).get._1 == "k1")
    // CM structural invariant: never underestimates
    got.foreach { case (v, (exact, est, _)) => assert(est >= exact, s"$v: $est < $exact") }
    // replay: counters from the same salted buckets
    val counters = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (v <- values; r <- 0L until 4L) {
      val b = u32(s"$v:$r") % 64
      counters((r, b)) = counters.getOrElse((r, b), 0L) + 1
    }
    got.foreach { case (v, (_, est, _)) =>
      val want = (0L until 4L).map(r => counters((r, u32(s"$v:$r") % 64))).min
      assert(est == want, s"$v cm mismatch")
    }
  }

  // ---- bloom ------------------------------------------------------------

  test("bloomAudit: members always positive, FP rate replays exactly") {
    val members = (1 to 200).map(i => s"m$i")
    val probes = members ++ (1 to 2000).map(i => s"p$i")
    val bits = 1024; val hashes = 3
    val r = Sketch.bloomAudit(probes.toDF("v"), "v",
      members.toDF("m"), "m", bits = bits, hashes = hashes).head()
    val (nProbed, nMemberProbed, nPos, nFp, fpPpm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nProbed == 2200 && nMemberProbed == 200)
    // replay the bit set and every probe
    val bitSet = members.flatMap(m => (0 until hashes).map(h => u32(s"$m#$h") % bits)).toSet
    val pos = probes.distinct.count(p => (0 until hashes).forall(h => bitSet(u32(s"$p#$h") % bits)))
    assert(nPos == pos)
    assert(nFp == pos - 200)
    assert(fpPpm == 1000000L * (pos - 200) / 2000)
    // with 200*3 bits in 1024, theory predicts a meaningful but sub-50% FP rate
    assert(nFp > 0 && nFp < 1000, s"implausible FP count $nFp")
  }

  test("poisson draw distribution is plausibly Poisson(1)") {
    // across many (id, replicate) cells the empirical mean of k must sit
    // near 1 (fixed hash: this is a regression pin, not a flaky test)
    val rows = (1L to 1000L).map(i => (i, 1L))
    val got = Sampling.poissonBootstrap(rows.toDF("id", "v"), "id", "v", replicates = 4)
      .collect().map(r => r.getLong(1)).sum
    val mean = got.toDouble / 4000
    assert(mean > 0.93 && mean < 1.07, s"mean draw $mean far from 1")
  }

  test("quantileSketch with k >= n IS the data — estimates are exact quantiles") {
    import spark.implicits._
    val vals = (1L to 100L).map(i => (i, i * 3)) // values 3..300
    val df = vals.toDF("rid", "v")
    val got = Sketch.quantileEstimate(
      Sketch.quantileSketch(df, "rid", "v", k = 200),
      Seq(10000L, 500000L, 1000000L))
      .orderBy("q_ppm").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // rank ceil(q*100): 1% → rank 1 (v=3), 50% → rank 50 (v=150), 100% → rank 100 (v=300)
    assert(got.toSeq == Seq((10000L, 3L, 100L), (500000L, 150L, 100L), (1000000L, 300L, 100L)))
  }

  test("quantileMerge of a disjoint split is bit-identical to the direct sketch") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, (i * 7919) % 1000)).toDF("rid", "v")
    val direct = Sketch.quantileSketch(df, "rid", "v", k = 64)
      .orderBy("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val merged = Sketch.quantileMerge(
      Sketch.quantileSketch(df.where($"rid" % 2 === 0), "rid", "v", k = 64),
      Sketch.quantileSketch(df.where($"rid" % 2 === 1), "rid", "v", k = 64),
      k = 64)
      .orderBy("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(direct.toSeq == merged.toSeq)
  }

  test("quantileSketch estimates land near the true quantiles at k << n") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i, i)).toDF("rid", "v") // uniform 1..20000
    val got = Sketch.quantileEstimate(
      Sketch.quantileSketch(df, "rid", "v", k = 512),
      Seq(250000L, 500000L, 750000L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for ((q, est) <- got) {
      val truth = q * 20000L / 1000000L
      assert(math.abs(est - truth) < 2500,
        s"q=$q estimate $est too far from $truth") // ±3σ ≈ 2.1% of range at k=512
    }
  }

  test("quantileSketchByGroup: every group equals the single-group sketch") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (s"g${i % 3}", i, (i * 13) % 500))
    val df = rows.toDF("g", "rid", "v")
    val qs = Seq(250000L, 500000L, 750000L)
    val got = Sketch.quantileEstimateByGroup(
      Sketch.quantileSketchByGroup(df, "g", "rid", "v", k = 32), qs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val single = Sketch.quantileEstimate(
        Sketch.quantileSketch(df.where($"g" === g), "rid", "v", k = 32), qs)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      for (q <- qs)
        assert(got((g, q)) == single(q), s"group $g q=$q diverges from the single-group path")
    }
  }

  test("quantileEstimate rejects out-of-range fractions") {
    import spark.implicits._
    val sk = Sketch.quantileSketch(Seq((1L, 1L)).toDF("rid", "v"), "rid", "v", k = 4)
    intercept[IllegalArgumentException](Sketch.quantileEstimate(sk, Seq(1000001L)))
    intercept[IllegalArgumentException](Sketch.quantileEstimate(sk, Seq.empty))
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Chunking, Components, Repetition, Sampling}

/** Property tests for the corpus operators: invariants that must hold on
  * ANY input, not just the hand-built fixtures. (ScalaCheck generators
  * driven explicitly — deterministic seeds, no scalatestplus bridge, same
  * pattern as SessionizePropertySpec.)
  */
class CorpusPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsi", "zeta")
  private val docGen = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("chunking: zero-overlap windows tile each token stream exactly") {
    (1 to 8).foreach { seed =>
      val texts = sample(Gen.listOfN(6, docGen), seed)
      val chunkSize = 2 + seed % 8
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val chunks = Chunking.byWords(docs, chunkSize, overlap = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).map(_._3).mkString(" ")
      }
      texts.zipWithIndex.foreach { case (t, i) =>
        val norm = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
        if (norm.nonEmpty) assert(rebuilt(i.toLong) == norm, s"seed=$seed doc=$i")
        else assert(!rebuilt.contains(i.toLong), s"seed=$seed empty doc $i emitted chunks")
      }
      // every window except a doc's last is exactly chunkSize words
      chunks.groupBy(_._1).foreach { case (_, cs) =>
        cs.sortBy(_._2).dropRight(1).foreach(c => assert(c._4 == chunkSize))
      }
    }
  }

  test("components: agrees with union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.chooseNum(2, 60)
      m <- Gen.chooseNum(1, 80)
      es <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
    } yield es.map { case (a, b) => (a.toLong, b.toLong) }.filter(e => e._1 != e._2)
    (1 to 5).foreach { seed =>
      val edges = sample(edgeGen, seed)
      if (edges.nonEmpty) {
        val got = Components.connectedComponents(edges.toDF("a_id", "b_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) => parent(find(a)) = find(b) }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = nodes.groupBy(find).flatMap { case (_, ms) => ms.map(_ -> ms.min) }
        assert(got == expected, s"seed=$seed")
      }
    }
  }

  test("repetition: every fraction lies in [0, 1] for arbitrary docs") {
    (1 to 5).foreach { seed =>
      val texts = sample(Gen.listOfN(8, docGen), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      Repetition.signals(docs).collect().foreach { r =>
        (1 to 3).foreach { c =>
          assert(r.getDouble(c) >= 0.0 && r.getDouble(c) <= 1.0, s"seed=$seed col $c: $r")
        }
      }
    }
  }

  test("quota sampling: caps hold and selection is salt-invariant") {
    val df = (1 to 60).map(i => (i.toLong, if (i % 3 == 0) "a" else "b")).toDF("id", "stratum")
    (1 to 5).foreach { seed =>
      val n = 1 + seed * 2
      val salts = 1 + seed % 5
      val a = Sampling.exactPerGroup(df, "stratum", "id", n, saltBuckets = salts)
        .select("id").as[Long].collect().sorted.toSeq
      val b = Sampling.exactPerGroup(df, "stratum", "id", n, saltBuckets = 64)
        .select("id").as[Long].collect().sorted.toSeq
      assert(a == b, s"n=$n salts=$salts selection changed with salt count")
      val counts = Sampling.exactPerGroup(df, "stratum", "id", n, saltBuckets = salts)
        .groupBy("stratum").count().collect().map(_.getLong(1))
      assert(counts.forall(_ <= n))
    }
  }

  test("apportion: sums to budget exactly, never negative, monotone-ish in weight") {
    (1 to 10).foreach { seed =>
      val n = 2 + seed % 7
      val weights = sample(Gen.listOfN(n, Gen.chooseNum(1L, 10000L)), seed)
      val budget = sample(Gen.chooseNum(0L, 5000L), seed + 100)
      val counts = weights.zipWithIndex.map { case (w, i) => (s"k$i", w) }.toDF("k", "w")
      val got = Sampling.apportion(counts, "k", "w", budget)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got.values.sum == budget, s"seed=$seed: sum != budget")
      assert(got.values.forall(_ >= 0), s"seed=$seed: negative alloc")
      // every category within 1 unit of its exact proportional quota
      val tot = weights.sum
      weights.zipWithIndex.foreach { case (w, i) =>
        val quota = budget.toDouble * w / tot
        assert(math.abs(got(s"k$i") - quota) < 1.0 + 1e-9, s"seed=$seed k$i")
      }
    }
  }

  test("stratifiedInterleave: bijective onto distinct ordering keys, stratum-cyclic") {
    (1 to 6).foreach { seed =>
      val n = 5 + seed * 7
      val strata = Seq("s1", "s2", "longerstratum")
      val rows = (1 to n).map(i => (i.toLong, strata(sample(Gen.chooseNum(0, 2), seed * 1000 + i))))
      val df = rows.toDF("id", "st")
      val got = Sampling.stratifiedInterleave(df, "id", "st").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(got.length == n)
      assert(got.map(_._3).distinct.length == n, s"seed=$seed: positions collide")
      assert(got.forall(_._3 >= 0))
      // pos mod B encodes the stratum consistently
      val codes = strata.sorted.zipWithIndex.toMap
      got.foreach { case (_, st, pos) =>
        assert(pos % 3 == codes(st), s"seed=$seed stratum $st pos $pos")
      }
      // within a stratum the interleave ranks are dense from 0
      got.groupBy(_._2).foreach { case (_, rs) =>
        assert(rs.map(_._3 / 3).sorted.toSeq == (0L until rs.length), s"seed=$seed")
      }
    }
  }
}

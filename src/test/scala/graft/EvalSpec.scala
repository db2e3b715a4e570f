package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Round-4 eval metrics: ROC AUC, Cohen's kappa, chi-square cells, MRR —
  * each checked against a hand-computed textbook example, plus the
  * integer conventions (truncation direction, miss handling) the oracle
  * contract depends on.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc: perfect, random, inverted, and tied scores") {
    // perfect separation: all positives above all negatives → 1e6
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false))
      .toDF("s", "y").withColumn("g", lit("a"))
    val p = Eval.rocAuc(perfect, "g", "s", col("y")).head()
    assert(p.getAs[Long]("auc_ppm") == 1000000L)
    assert(p.getAs[Long]("n_pos") == 2 && p.getAs[Long]("n_neg") == 2)

    // inverted → 0
    val inv = Eval.rocAuc(
      Seq((1L, true), (2L, true), (9L, false), (10L, false))
        .toDF("s", "y").withColumn("g", lit("a")),
      "g", "s", col("y")).head()
    assert(inv.getAs[Long]("auc_ppm") == 0L)

    // all scores tied → every pair is a half-win → exactly 0.5
    val tied = Eval.rocAuc(
      Seq((5L, true), (5L, true), (5L, false), (5L, false))
        .toDF("s", "y").withColumn("g", lit("a")),
      "g", "s", col("y")).head()
    assert(tied.getAs[Long]("auc_ppm") == 500000L)

    // hand-computed mix: pos {3,5}, neg {4,5}: pairs (3>4)=0 (3>5)=0
    // (5>4)=1 (5=5)=.5 → U=1.5/4 → 375000
    val mix = Eval.rocAuc(
      Seq((3L, true), (5L, true), (4L, false), (5L, false))
        .toDF("s", "y").withColumn("g", lit("a")),
      "g", "s", col("y")).head()
    assert(mix.getAs[Long]("auc_ppm") == 375000L)

    // one-class group → NULL auc
    val oneClass = Eval.rocAuc(
      Seq((1L, true), (2L, true)).toDF("s", "y").withColumn("g", lit("a")),
      "g", "s", col("y")).head()
    assert(oneClass.isNullAt(oneClass.fieldIndex("auc_ppm")))
  }

  test("rocAuc matches the brute-force pair count on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextBoolean()))
    val df = rows.toDF("s", "y").withColumn("g", lit("a"))
    val r = Eval.rocAuc(df, "g", "s", col("y")).head()
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val want = 1000000L * u2 / (2L * pos.size * neg.size)
    assert(r.getAs[Long]("auc_ppm") == want)
  }

  test("cohensKappa: textbook 2x2 table and the sign convention") {
    // Classic example: raters agree 20+15 of 50; marginals A:{yes 25,no 25},
    // B:{yes 30,no 20} → po=0.7, pe=(25*30+25*20)/2500=0.5 → kappa=0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
        Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val df = rows.toDF("a", "b").withColumn("g", lit("x"))
    val r = Eval.cohensKappa(df, "g", "a", "b").head()
    assert(r.getAs[Long]("n") == 50 && r.getAs[Long]("n_agree") == 35)
    assert(r.getAs[Long]("kappa_ppm") == 400000L)

    // systematic disagreement → negative kappa, truncated toward zero:
    // 1 agree of 4, marginals a:{y 2,n 2} b:{y 2,n 2} → pe=.5,
    // po=.25 → kappa = -0.5 exactly
    val neg = Seq(("y", "n"), ("n", "y"), ("y", "n"), ("n", "n"))
      .toDF("a", "b").withColumn("g", lit("x"))
    val rn = Eval.cohensKappa(neg, "g", "a", "b").head()
    assert(rn.getAs[Long]("kappa_ppm") == -500000L)

    // both raters constant → pe=1 → NULL kappa
    val const = Seq(("y", "y"), ("y", "y")).toDF("a", "b")
      .withColumn("g", lit("x"))
    val rc = Eval.cohensKappa(const, "g", "a", "b").head()
    assert(rc.isNullAt(rc.fieldIndex("kappa_ppm")))

    // null-rated rows are excluded
    val withNull = Seq(("y", Some("y")), ("y", None), ("n", Some("n")))
      .toDF("a", "b").withColumn("g", lit("x"))
    assert(Eval.cohensKappa(withNull, "g", "a", "b").head().getAs[Long]("n") == 2)
  }

  test("chiSquareCells: uniform table is exactly zero; known 2x2 matches") {
    // perfectly proportional table → every residual d = 0
    val unif = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(60)(("b", "y"))).toDF("r", "c")
    val cells = Eval.chiSquareCells(unif, "r", "c").collect()
    assert(cells.length == 4 && cells.forall(_.getAs[Long]("chi2_micro") == 0L))

    // 2x2: o=[[10,20],[30,10]] N=70, chi2 = Σd²/(N·r·c) with
    // d(a,x)=10·70−30·40=−500 → cell χ² = 250000/(70·30·40)
    val skew = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("r", "c")
    val got = Eval.chiSquareCells(skew, "r", "c").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("chi2_micro"))
      .toMap
    def cell(o: Long, rt: Long, ct: Long): Long = {
      val d = (o * 70 - rt * ct).toDouble
      math.floor(1000000.0 * d * d / (70.0 * rt * ct)).toLong
    }
    assert(got(("a", "x")) == cell(10, 30, 40))
    assert(got(("b", "y")) == cell(10, 40, 30))
    // expectation column is the exact ppm rational
    val ex = Eval.chiSquareCells(skew, "r", "c").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("e_ppm")).toMap
    assert(ex(("a", "x")) == 1000000L * 30 * 40 / 70)
  }

  test("meanReciprocalRank: ranks, misses, and the truncation convention") {
    // u1 hits at position 2 (rr 500000), u2 at 1 (1000000), u3 never
    val df = Seq(
      ("c", 1L, 10L, 100L, "view"), ("c", 1L, 20L, 101L, "buy"),
      ("c", 2L, 10L, 102L, "buy"), ("c", 2L, 20L, 103L, "buy"),
      ("c", 3L, 10L, 104L, "view"))
      .toDF("cohort", "u", "ms", "eid", "kind")
    val r = Eval.meanReciprocalRank(df, "cohort", "u", "ms", "eid",
      col("kind") === "buy").head()
    assert(r.getAs[Long]("n_actors") == 3 && r.getAs[Long]("n_hit") == 2)
    // (500000 + 1000000) div 3 = 500000
    assert(r.getAs[Long]("mrr_ppm") == 500000L)

    // rank 3 → 1e6 div 3 = 333333 (truncated), single-user cohort
    val r3 = Eval.meanReciprocalRank(
      Seq(("d", 9L, 1L, 1L, "v"), ("d", 9L, 2L, 2L, "v"), ("d", 9L, 3L, 3L, "b"))
        .toDF("cohort", "u", "ms", "eid", "kind"),
      "cohort", "u", "ms", "eid", col("kind") === "b").head()
    assert(r3.getAs[Long]("mrr_ppm") == 333333L)

    // a cohort with zero hits still emits a row with mrr 0
    val miss = Eval.meanReciprocalRank(
      Seq(("e", 1L, 1L, 1L, "v")).toDF("cohort", "u", "ms", "eid", "kind"),
      "cohort", "u", "ms", "eid", col("kind") === "b").head()
    assert(miss.getAs[Long]("n_hit") == 0 && miss.getAs[Long]("mrr_ppm") == 0L)
  }

  test("gainsTable: cumulative lift concentrates where the positives are") {
    // 10 rows, scores 10..1, positives exactly the top 2 scorers, 5 buckets
    val df = (1 to 10).map(i => (11 - i).toLong -> (i <= 2)).toDF("s", "y")
      .withColumn("g", lit("a")).withColumn("id", col("s"))
    val rows = graft.ops.Eval.gainsTable(df, "g", "s", "id", col("y"), buckets = 5)
      .orderBy("bucket").collect()
    assert(rows.length == 5)
    // bucket 1 = top 2 rows = both positives → lift = (2/2)/(2/10) = 5×
    assert(rows(0).getAs[Long]("n_pos") == 2)
    assert(rows(0).getAs[Long]("lift_ppm") == 5000000L)
    // the last bucket's cumulative lift is exactly 1
    assert(rows(4).getAs[Long]("cum_n") == 10 && rows(4).getAs[Long]("cum_pos") == 2)
    assert(rows(4).getAs[Long]("lift_ppm") == 1000000L)
    // no positives at all → NULL lift everywhere
    val nolift = graft.ops.Eval.gainsTable(
      (1 to 10).map(i => (i.toLong, false)).toDF("s", "y")
        .withColumn("g", lit("a")).withColumn("id", col("s")),
      "g", "s", "id", col("y"), buckets = 5).collect()
    assert(nolift.forall(_.isNullAt(nolift.head.fieldIndex("lift_ppm"))))
  }

  test("classPrf: per-class tp/marginals, one-sided classes, fraction-free F1") {
    val rows = Seq(
      ("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("b", "a"),
      ("c", "b"), // gold-only class: never predicted
      ("b", "d")) // pred-only class: never gold
    val got = graft.ops.Eval.classPrf(rows.toDF("gold", "pred"), "gold", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("tp") == 3 && a.getAs[Long]("n_gold") == 4 && a.getAs[Long]("n_pred") == 4)
    assert(a.getAs[Long]("precision_ppm") == 750000L && a.getAs[Long]("f1_ppm") == 750000L)
    val b = got("b")
    assert(b.getAs[Long]("tp") == 2 && b.getAs[Long]("n_gold") == 4 && b.getAs[Long]("n_pred") == 4)
    assert(b.getAs[Long]("f1_ppm") == 2000000L * 2 / 8)
    // gold-only: precision NULL (0 predictions), recall 0, f1 0
    val c = got("c")
    assert(c.isNullAt(c.fieldIndex("precision_ppm")))
    assert(c.getAs[Long]("recall_ppm") == 0L && c.getAs[Long]("f1_ppm") == 0L)
    // pred-only: recall NULL, precision 0
    val d = got("d")
    assert(d.isNullAt(d.fieldIndex("recall_ppm")))
    assert(d.getAs[Long]("precision_ppm") == 0L)
  }

  test("rocAuc plan collapses to distinct scores before the window") {
    // the pre-window aggregate must appear below the window (sort) node:
    // a HashAggregate keyed on (g, score) — i.e. the window never sees
    // raw rows, only the distinct-score table
    val df = Seq((1L, true), (2L, false)).toDF("s", "y").withColumn("g", lit("a"))
    val plan = Eval.rocAuc(df, "g", "s", col("y"))
      .queryExecution.executedPlan.toString
    val winAt = plan.indexOf("Window")
    val aggBelow = plan.indexOf("HashAggregate", winAt)
    assert(winAt >= 0 && aggBelow > winAt,
      s"expected pre-aggregation below the window:\n$plan")
  }
}

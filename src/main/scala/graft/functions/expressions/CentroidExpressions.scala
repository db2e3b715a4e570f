package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** A centroid codebook: parallel arrays of ids and unit-normalized vectors,
  * sorted by id ascending (so first-max argmax ties resolve to the smallest
  * centroid id). Shipped to executors as a [[Broadcast]] — the expression
  * tree carries only the broadcast HANDLE, so the logical/physical plan and
  * the codegen constant pool stay flat however many centroids there are
  * (the `typedLit` alternative inlines every vector into the plan).
  */
case class CentroidCodebook(ids: Array[Long], vecs: Array[Array[Double]]) {
  require(ids.length == vecs.length, "ids and vecs must be parallel")
  require(ids.nonEmpty, "empty centroid codebook")
}

/** Id of the nearest centroid by dot product (= cosine for unit-normalized
  * inputs): the IVF assignment step, evaluated as a map-only codegen'd
  * double loop per corpus row. Arithmetic replays
  * `transform(centroids, c => DotProduct(vec, c))` + first-position-of-max
  * exactly: left-to-right accumulation, null elements contribute 0, strict
  * `>` keeps the first (smallest-id) maximum.
  */
case class NearestCentroidId(child: Expression, codebook: Broadcast[CentroidCodebook])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid_id"
  // Broadcast handles have reference equality; two expressions are the same
  // iff they carry the same broadcast id and child.
  override lazy val canonicalized: Expression = copy(child = child.canonicalized)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = codebook.value
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < m.vecs.length) {
      val cv = m.vecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) s += VectorExpressions.elemAt(v, child.dataType, i) * cv(i)
        i += 1
      }
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    m.ids(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = VectorExpressions.elemGetter(child.dataType)
    // Reference the broadcast handle, not its value: tasks deserialize a
    // few-byte handle and executors fetch the codebook once via torrent.
    val bcast = ctx.addReferenceObj("centroidCodebook", codebook,
      classOf[Broadcast[CentroidCodebook]].getName)
    val cbClass = classOf[CentroidCodebook].getName
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.freshName("cb")
      val vecs = ctx.freshName("vecs")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |final $cbClass $m = ($cbClass) $bcast.value();
         |final double[][] $vecs = $m.vecs();
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $vecs.length; $c++) {
         |  final double[] $cv = $vecs[$c];
         |  final int $n = java.lang.Math.min($v.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $s += ((double) $v.$getter($i)) * $cv[$i];
         |    }
         |  }
         |  if ($s > $bestScore) { $bestScore = $s; $best = $c; }
         |}
         |${ev.value} = $m.ids()[$best];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidId =
    copy(child = newChild)
}

/** Ids of the `nProbe` nearest centroids by (dot desc, id asc): the IVF
  * query-probe step. CodegenFallback on purpose — this runs over the query
  * set (tiny, broadcast side of the probe join), so interpreter overhead
  * is irrelevant; the corpus-side [[NearestCentroidId]] is the codegen'd
  * hot path.
  */
case class TopCentroidIds(child: Expression, codebook: Broadcast[CentroidCodebook], nProbe: Int)
    extends UnaryExpression with CodegenFallback {
  require(nProbe > 0, "nProbe must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_centroid_ids"
  override lazy val canonicalized: Expression = copy(child = child.canonicalized)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = codebook.value
    val scores = new Array[Double](m.vecs.length)
    var c = 0
    while (c < m.vecs.length) {
      val cv = m.vecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) s += VectorExpressions.elemAt(v, child.dataType, i) * cv(i)
        i += 1
      }
      scores(c) = s
      c += 1
    }
    // Repeated strict-> argmax over unused slots: (score desc, id asc)
    // without sorting the whole codebook; nProbe is small by construction.
    val k = math.min(nProbe, scores.length)
    val out = new Array[Long](k)
    val used = new Array[Boolean](scores.length)
    var j = 0
    while (j < k) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      c = 0
      while (c < scores.length) {
        if (!used(c) && (best < 0 || scores(c) > bestScore)) { bestScore = scores(c); best = c }
        c += 1
      }
      used(best) = true
      out(j) = m.ids(best)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroidIds =
    copy(child = newChild)
}

/** Integer-lattice codebook (parallel to [[CentroidCodebook]], but exact
  * long coordinates), cid-sorted ascending so strict `<` argmin ties
  * resolve to the smallest cid.
  */
case class LatticeCodebook(ids: Array[Long], vecs: Array[Array[Long]]) {
  require(ids.length == vecs.length, "ids and vecs must be parallel")
  require(ids.nonEmpty, "empty lattice codebook")
}

/** Nearest centroid on the integer lattice: `[cid, squared_distance]` as a
  * 2-element long array, all-integer arithmetic (exact for lattice
  * coordinates ≤ ~2²⁰ per |element| at any realistic dim) — the Lloyd
  * assignment hot path of [[graft.ops.KMeans]], replacing an interpreted
  * `aggregate(codebook, …, sqDist)` HOF chain that allocates per element.
  * Ties on distance keep the smallest cid (cid-sorted codebook, strict <).
  * Input must be `array<bigint>`; null elements are treated as 0.
  */
case class NearestLatticeCentroid(child: Expression, codebook: Broadcast[LatticeCodebook])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_lattice_centroid"
  override lazy val canonicalized: Expression = copy(child = child.canonicalized)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = codebook.value
    var best = 0
    var bestDist = Long.MaxValue
    var c = 0
    while (c < m.vecs.length) {
      val cv = m.vecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0L
      var i = 0
      while (i < n) {
        val d = (if (v.isNullAt(i)) 0L else v.getLong(i)) - cv(i)
        s += d * d
        i += 1
      }
      if (s < bestDist) { bestDist = s; best = c }
      c += 1
    }
    new GenericArrayData(Array(m.ids(best), bestDist))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcast = ctx.addReferenceObj("latticeCodebook", codebook,
      classOf[Broadcast[LatticeCodebook]].getName)
    val cbClass = classOf[LatticeCodebook].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.freshName("cb")
      val vecs = ctx.freshName("vecs")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |final $cbClass $m = ($cbClass) $bcast.value();
         |final long[][] $vecs = $m.vecs();
         |int $best = 0;
         |long $bestDist = Long.MAX_VALUE;
         |for (int $c = 0; $c < $vecs.length; $c++) {
         |  final long[] $cv = $vecs[$c];
         |  final int $n = java.lang.Math.min($v.numElements(), $cv.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $d = ($v.isNullAt($i) ? 0L : $v.getLong($i)) - $cv[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestDist) { $bestDist = $s; $best = $c; }
         |}
         |${ev.value} = new $gad(new long[]{$m.ids()[$best], $bestDist});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestLatticeCentroid =
    copy(child = newChild)
}

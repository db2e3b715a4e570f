package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (`doGenCode`) for the vector / sketch hot
  * paths. The higher-order-function formulations in
  * [[graft.functions.VectorFunctions]] are semantically identical but
  * interpreted — every element evaluation allocates and boxes. These
  * compile to tight Java loops over `ArrayData` primitives inside
  * whole-stage codegen, which is what a 100 TB similarity scan needs:
  * scoring a candidate pair costs one fused loop, not three boxed folds.
  */
object VectorExpressions {

  private[expressions] def elemGetter(t: DataType): String = t match {
    case ArrayType(FloatType, _)  => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  private[expressions] def elemAt(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case ArrayType(FloatType, _)  => arr.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => arr.getDouble(i)
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }
}

/** Σ aᵢ·bᵢ in left-to-right order, accumulating in double — element-wise
  * identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)` over non-null
  * elements. Null elements contribute 0; length mismatch folds the common
  * prefix.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        sum += VectorExpressions.elemAt(x, left.dataType, i) * VectorExpressions.elemAt(y, right.dataType, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (VectorExpressions.elemGetter(left.dataType), VectorExpressions.elemGetter(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, sum) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("sum"))
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ((double) $a.$ga($i)) * ((double) $b.$gb($i));
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in one fused pass. The arithmetic replays the staged
  * formulation exactly — `dot / (sqrt(Σa²) · sqrt(Σb²))`, every sum
  * left-to-right — so results are bit-identical to
  * [[graft.functions.VectorFunctions.cosine]] (incl. the null-safe 0 for
  * zero-norm inputs).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        dot += VectorExpressions.elemAt(x, left.dataType, i) * VectorExpressions.elemAt(y, right.dataType, i)
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) { val v = VectorExpressions.elemAt(x, left.dataType, i); na += v * v }
      i += 1
    }
    var nb = 0.0
    i = 0
    while (i < y.numElements()) {
      if (!y.isNullAt(i)) { val v = VectorExpressions.elemAt(y, right.dataType, i); nb += v * v }
      i += 1
    }
    val norm = math.sqrt(na) * math.sqrt(nb)
    if (norm > 0) dot / norm else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (VectorExpressions.elemGetter(left.dataType), VectorExpressions.elemGetter(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val v = ctx.freshName("v")
      val norm = ctx.freshName("norm")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $dot += ((double) $a.$ga($i)) * ((double) $b.$gb($i));
         |  }
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) { double $v = (double) $a.$ga($i); $na += $v * $v; }
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if (!$b.isNullAt($i)) { double $v = (double) $b.$gb($i); $nb += $v * $v; }
         |}
         |final double $norm = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = $norm > 0 ? $dot / $norm : 0.0;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object HyperplaneBucket {
  /** Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5) for
    * (bit, dim index, seed) — splitmix64 finalizer, computable on any
    * executor with no broadcast state.
    */
  def coef(bit: Int, i: Int, seed: Int): Double = {
    var z = bit.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL + seed.toLong * 0x165667B19E3779F9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    // top 53 bits → [0,1) → [-0.5, 0.5)
    (z >>> 11).toDouble / 9007199254740992.0 - 0.5
  }
}

/** Signed random-hyperplane LSH bucket: sign bits of `nBits` pseudo-random
  * projections packed into a long, in one pass over the vector (the staged
  * HOF form walks the vector once per bit). Cosine-similar vectors collide
  * with high probability; scale-invariant, so bucket before or after
  * normalization interchangeably.
  */
case class HyperplaneBucket(child: Expression, nBits: Int, seed: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  def projections(arr: ArrayData): Array[Double] = {
    val proj = new Array[Double](nBits)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val v = VectorExpressions.elemAt(arr, child.dataType, i)
        var b = 0
        while (b < nBits) { proj(b) += v * HyperplaneBucket.coef(b, i, seed); b += 1 }
      }
      i += 1
    }
    proj
  }

  override protected def nullSafeEval(input: Any): Any = {
    val proj = projections(input.asInstanceOf[ArrayData])
    var bucket = 0L
    var b = 0
    while (b < nBits) { if (proj(b) >= 0) bucket |= 1L << b; b += 1 }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = VectorExpressions.elemGetter(child.dataType)
    nullSafeCodeGen(ctx, ev, a => {
      val (proj, i, b, v, bucket) =
        (ctx.freshName("proj"), ctx.freshName("i"), ctx.freshName("b"), ctx.freshName("v"), ctx.freshName("bucket"))
      s"""
         |double[] $proj = new double[$nBits];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = (double) $a.$g($i);
         |    for (int $b = 0; $b < $nBits; $b++) {
         |      $proj[$b] += $v * graft.functions.expressions.HyperplaneBucket.coef($b, $i, $seed);
         |    }
         |  }
         |}
         |long $bucket = 0L;
         |for (int $b = 0; $b < $nBits; $b++) { if ($proj[$b] >= 0) $bucket |= 1L << $b; }
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object SketchHash {
  /** 64-bit mix of (value, stream) — splitmix64 finalizer. */
  def mix64(value: Long, stream: Long): Long = {
    var z = value * 0x9E3779B97F4A7C15L + stream * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit string hash (FNV-1a over UTF-8 bytes, splitmix-finalized). */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xFF)) * 0x100000001B3L; i += 1 }
    mix64(h, 0L)
  }
}

/** MinHash signature: element `h` is `min over shingles of mix64(shingle, h)`
  * — one pass over the shingle set updating all `numHashes` mins, instead of
  * `numHashes` interpreted transform+array_min walks. Empty set → Long.Max
  * sentinels (no spurious matches).
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def signature(arr: ArrayData): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val isLong = child.dataType == ArrayType(LongType, containsNull = false) ||
      child.dataType == ArrayType(LongType, containsNull = true)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = if (isLong) arr.getLong(i) else arr.getInt(i).toLong
        var h = 0
        while (h < numHashes) {
          val v = SketchHash.mix64(s, h.toLong)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    mins
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(signature(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = child.dataType match {
      case ArrayType(IntegerType, _) => "getInt"
      case ArrayType(LongType, _)    => "getLong"
      case other => throw new IllegalArgumentException(s"expected array<int|long>, got $other")
    }
    nullSafeCodeGen(ctx, ev, a => {
      val (mins, i, h, s, v) =
        (ctx.freshName("mins"), ctx.freshName("i"), ctx.freshName("h"), ctx.freshName("s"), ctx.freshName("v"))
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final long $s = (long) $a.$getter($i);
         |    for (int $h = 0; $h < $numHashes; $h++) {
         |      final long $v = graft.functions.expressions.SketchHash.mix64($s, (long) $h);
         |      if ($v < $mins[$h]) $mins[$h] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct hashed word k-shingles in one pass: hash each word once
  * (64-bit), combine each length-k window of word hashes order-sensitively,
  * and deduplicate. Replaces an interpreted transform+slice+concat_ws+hash
  * chain that re-concatenated strings per shingle. Fewer than k words →
  * one shingle over all words; empty input → one sentinel shingle (the
  * empty-document fingerprint), mirroring the staged form.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  def shingles(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val wordHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      wordHashes(i) = if (arr.isNullAt(i)) 0L else SketchHash.hash64(arr.getUTF8String(i))
      i += 1
    }
    val width = if (n < k) math.max(n, 1) else k
    val count = if (n < k) 1 else n - k + 1
    val out = new Array[Long](count)
    i = 0
    while (i < count) {
      var h = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < width && i + j < n) { h = SketchHash.mix64(h, wordHashes(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    // distinct, order-insensitive downstream (set semantics): sort + dedup
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < count) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(shingles(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($self.shingles($a));")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** POSITIONAL k-shingle hashes: `out[i] = h(words[i..i+k-1])` for every
  * window start, in document order — length `n−k+1`, or empty when the
  * document is shorter than one window. The order-PRESERVING sibling of
  * [[ShingleHashes]] (which dedups into set semantics): span-level
  * operators ([[graft.ops.Repetition.spanCoverage]]) need the position of
  * every gram occurrence, not the set. Each word hashes exactly once;
  * windows combine word hashes by mix64 — no per-window array slicing, no
  * string re-concatenation, and the whole column evaluates as one native
  * call per row instead of an interpreted `transform(sequence…, slice…)`
  * chain per window.
  */
case class PositionalShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "positional_shingle_hashes"

  def shingles(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    if (n < k) return Array.emptyLongArray
    val wordHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      wordHashes(i) = if (arr.isNullAt(i)) 0L else SketchHash.hash64(arr.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i < out.length) {
      var h = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < k) { h = SketchHash.mix64(h, wordHashes(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(shingles(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("posShingleHashes", this, classOf[PositionalShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($self.shingles($a));")
  }

  override protected def withNewChildInternal(newChild: Expression): PositionalShingleHashes =
    copy(child = newChild)
}

/** One BPE merge step over a symbol array: every adjacent (left, right)
  * pair becomes the single symbol `left+right`, scanning left-to-right
  * greedily and non-overlapping ("a a a" under (a,a) → "aa a", not
  * "a aa") — exactly the rewrite a byte-pair-encoding trainer applies
  * after electing a merge. One native pass per row; the merge pair is
  * constant for the whole column (it comes from the per-round argmax), so
  * it lives in the expression, not in a join.
  */
case class MergeAdjacentPair(child: Expression, left: String, right: String)
    extends UnaryExpression {
  require(left.nonEmpty && right.nonEmpty, "merge symbols must be non-empty")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "merge_adjacent_pair"

  @transient private lazy val leftU = UTF8String.fromString(left)
  @transient private lazy val rightU = UTF8String.fromString(right)
  @transient private lazy val mergedU = UTF8String.fromString(left + right)

  def merge(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var w = 0
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(leftU) &&
        arr.getUTF8String(i + 1) != null && arr.getUTF8String(i + 1).equals(rightU)) {
        out(w) = mergedU
        i += 2
      } else {
        out(w) = cur
        i += 1
      }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def nullSafeEval(input: Any): Any =
    merge(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mergePair", this, classOf[MergeAdjacentPair].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.merge($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MergeAdjacentPair =
    copy(child = newChild)
}

/** BPE ENCODE: segment each word of a token array into subwords by
  * applying a learned merge table ([[graft.ops.Ngrams.bpeMerges]]) in
  * rank order — each word splits to characters plus the end-of-word
  * marker, then every merge rewrites it leftmost-greedy, exactly like
  * the trainer did. Output is the flattened subword array for the row.
  * The merge list is constant for the column (vocabulary metadata, like
  * a broadcast codebook), so it lives in the expression; evaluation is
  * one native pass per word per merge — no joins, no shuffles.
  */
case class ApplyBpeMerges(child: Expression, merges: Seq[(String, String)], endOfWord: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "apply_bpe_merges"

  @transient private lazy val mergePairs: Array[(UTF8String, UTF8String, UTF8String)] =
    merges.map { case (l, r) =>
      (UTF8String.fromString(l), UTF8String.fromString(r), UTF8String.fromString(l + r))
    }.toArray
  @transient private lazy val eow = UTF8String.fromString(endOfWord)

  private def encodeWord(word: UTF8String, out: java.util.ArrayList[UTF8String]): Unit = {
    val n = word.numChars()
    var syms = new Array[UTF8String](n + 1)
    var i = 0
    while (i < n) { syms(i) = word.substring(i, i + 1); i += 1 }
    syms(n) = eow
    var len = n + 1
    var m = 0
    while (m < mergePairs.length) {
      val (l, r, lr) = mergePairs(m)
      var w = 0
      var j = 0
      while (j < len) {
        if (j + 1 < len && syms(j).equals(l) && syms(j + 1).equals(r)) {
          syms(w) = lr; j += 2
        } else { syms(w) = syms(j); j += 1 }
        w += 1
      }
      len = w
      m += 1
    }
    var k = 0
    while (k < len) { out.add(syms(k)); k += 1 }
  }

  def encode(words: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < words.numElements()) {
      if (!words.isNullAt(i)) encodeWord(words.getUTF8String(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("applyBpe", this, classOf[ApplyBpeMerges].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ApplyBpeMerges =
    copy(child = newChild)
}

/** Non-overlapping occurrence count of a constant `needle`, scanning
  * left-to-right — character-for-character the same count as the portable
  * `(length(h) - length(replace(h, needle, ''))) / length(needle)`
  * formulation (the DuckDB-oracle form), but as an indexOf walk: no
  * replaced-string allocation. The language-ID / quality scorers evaluate
  * ~20 marker needles per row, so the allocation-free form is the hot-path
  * variant.
  */
case class CountOccurrences(child: Expression, needle: String) extends UnaryExpression {
  require(needle.nonEmpty, "needle must be non-empty")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val needleU = UTF8String.fromString(needle)
  @transient private lazy val needleChars = needleU.numChars()

  def count(h: UTF8String): Long = {
    var c = 0L
    var pos = h.indexOf(needleU, 0)
    while (pos >= 0) {
      c += 1
      pos = h.indexOf(needleU, pos + needleChars)
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("countOccurrences", this, classOf[CountOccurrences].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountOccurrences =
    copy(child = newChild)
}

/** Count of non-overlapping matches of a constant regex, as one matcher
  * walk — the same count as `size(regexp_extract_all(text, pattern, 0))`
  * (both sides are java.util.regex find() loops), WITHOUT materializing
  * the match array: the extract-all form allocates every matched
  * substring plus an ArrayData per row just to take its length, which on
  * a 100 TB token-counting scan (q13/q44/q140/q143/q166/q207 all count
  * BPE-ish tokens) is pure GC pressure. The pattern compiles once per
  * operator instance.
  */
case class RegexpCount(child: Expression, pattern: String) extends UnaryExpression {
  require(pattern.nonEmpty, "pattern must be non-empty")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  def count(h: UTF8String): Long = {
    val m = compiled.matcher(h.toString)
    var c = 0L
    while (m.find()) c += 1
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("regexpCount", this, classOf[RegexpCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpCount =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: each token hashes once to 64 bits;
  * per-bit signed votes; result bit set where votes are positive. The
  * staged HOF form hashes every token once per bit (64×).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SketchHash.hash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) { votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.simhash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Σ aᵢ·bᵢ over two `array<long>` columns in EXACT 64-bit integer
  * arithmetic — the pairwise kernel of quantized-embedding similarity,
  * where a float accumulator would make threshold comparisons
  * engine-dependent at the boundary. Null elements contribute 0; length
  * mismatch folds the common prefix (mirrors [[DotProduct]]). The caller
  * owns overflow headroom: |value| ≤ scale·maxAbs and dim·(scale·maxAbs)²
  * must fit a long (for unit vectors at scale 1024 the dot is ≤ ~2²⁶ —
  * six orders of magnitude of slack).
  */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, sum) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("sum"))
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| over two SORTED (ascending, binary order), DISTINCT, null-free
  * arrays — string or long elements — in one two-pointer merge pass.
  * Equivalent to `size(array_intersect(a, b))` on such inputs, but
  * O(|A|+|B|) with no per-row hash-set allocation and whole-stage
  * codegen: this is the verification kernel of the prefix-filter
  * similarity join, which evaluates it once per CANDIDATE pair (millions
  * of times per partition), exactly where an interpreted ArrayIntersect
  * stalls the scan. Inputs that violate sortedness/distinctness give
  * undefined counts — callers own `array_sort(array_distinct(...))`.
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  private lazy val isString: Boolean = left.dataType match {
    case ArrayType(StringType, _) => true
    case ArrayType(LongType, _)   => false
    case other => throw new IllegalArgumentException(s"expected array<string|bigint>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (x.numElements(), y.numElements())
    var (i, j) = (0, 0)
    var count = 0L
    while (i < n && j < m) {
      val c =
        if (isString) x.getUTF8String(i).compareTo(y.getUTF8String(j))
        else java.lang.Long.compare(x.getLong(i), y.getLong(j))
      if (c == 0) { count += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, m, i, j, c, cnt) = (ctx.freshName("n"), ctx.freshName("m"), ctx.freshName("i"),
        ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("cnt"))
      val cmp =
        if (isString) s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        else s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  final int $c = $cmp;
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Fused symmetric int8 quantization: one pass computing the vector's
  * max|xᵢ| and a second emitting `round(xᵢ·127/maxAbs)` as longs —
  * element-wise identical to the staged HOF pair
  * `quantizeInt8(vec, maxAbs(vec))` in
  * [[graft.functions.VectorFunctions]] (array_max ignores null elements;
  * an all-null or all-zero or empty vector quantizes to all zeros with no
  * nulls; in the quantizing branch a null element stays null; round is
  * HALF_UP away from zero — Spark's `round(double)` BigDecimal contract).
  *
  * Exists because the INLINE composition `quantizeInt8(v, maxAbs(v))`
  * re-evaluates the interpreted maxAbs HOF once per ELEMENT of the
  * transform lambda (~65 array scans per 64-dim row — profiled as ~30 s
  * of CPU in one PQ scan stage at sf0.1), while this is one codegen'd
  * loop pair. The staged two-argument form stays available for callers
  * that already carry a maxAbs column.
  */
case class QuantizeInt8MaxAbs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_int8_maxabs"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ma = 0.0
    var has = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val d = math.abs(VectorExpressions.elemAt(x, child.dataType, i))
        if (!has || d > ma) { ma = d; has = true }
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (has && ma > 0) {
      i = 0
      while (i < n) {
        if (!x.isNullAt(i)) {
          val d = VectorExpressions.elemAt(x, child.dataType, i) * 127.0 / ma
          out(i) = java.math.BigDecimal.valueOf(d)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
        }
        i += 1
      }
    } else {
      i = 0
      while (i < n) { out(i) = 0L; i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = VectorExpressions.elemGetter(child.dataType)
    nullSafeCodeGen(ctx, ev, v => {
      val (n, i, ma, has, d, out) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("ma"), ctx.freshName("has"), ctx.freshName("d"), ctx.freshName("out"))
      s"""
         |final int $n = $v.numElements();
         |double $ma = 0.0;
         |boolean $has = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    final double $d = java.lang.Math.abs((double) $v.$g($i));
         |    if (!$has || $d > $ma) { $ma = $d; $has = true; }
         |  }
         |}
         |final Object[] $out = new Object[$n];
         |if ($has && $ma > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $out[$i] = java.lang.Long.valueOf((long) java.math.BigDecimal
         |        .valueOf(((double) $v.$g($i)) * 127.0 / $ma)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue());
         |    }
         |  }
         |} else {
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] = java.lang.Long.valueOf(0L); }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8MaxAbs =
    copy(child = newChild)
}

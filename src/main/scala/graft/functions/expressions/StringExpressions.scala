package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Record-linkage string kernels Spark lacks natively: unrestricted
  * Damerau–Levenshtein (true transposition edit distance) and
  * Jaro–Winkler similarity. Both are static-method kernels invoked from
  * `doGenCode`, so callers stay inside whole-stage codegen (the pattern
  * Spark itself uses for `levenshtein`) while the O(n·m) / O(n+m) loops
  * run as plain JVM code the JIT can vectorize.
  *
  * Both operate on Unicode code points, which coincides with DuckDB's
  * per-character semantics on the BMP text these oracles compare against.
  */
object StringKernels {

  private def codePoints(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  // Per-thread scratch for the DP matrix and the ASCII last-occurrence
  // table: a verification join evaluates the kernel millions of times per
  // task, and per-call allocation (matrix + boxed HashMap) dominated the
  // bench profile (q211 measured ~6 µs/pair allocating vs ~2 µs reusing).
  // Executor task threads each get their own scratch — no sharing.
  private val dpScratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64 * 64)
  }
  // One MessageDigest per executor thread: getInstance per call costs
  // more than the digest itself at bulk fan-out (q331: 19M rows).
  private val md5Scratch = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** See [[Md5PrefixLong]]: the first nHex md5 hex digits as a Long,
    * read straight off the digest bytes.
    */
  def md5PrefixLong(s: UTF8String, nHex: Int): Long = {
    val md = md5Scratch.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  private val asciiLastRow = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](128)
  }

  /** Unrestricted Damerau–Levenshtein distance (Lowrance–Wagner): edit
    * distance with insert/delete/substitute at cost 1 plus TRANSPOSITION
    * of two characters at cost 1 even when other edits happen between
    * them — so `ca → abc` is 2 (the restricted/OSA variant says 3).
    * Matches DuckDB's `damerau_levenshtein` (verified: ca/abc = 2).
    *
    * O(n·m) time and memory — callers bound input length (the fuzzy-join
    * operators verify on capped normalized prefixes, never raw bodies).
    * The `da` last-occurrence table is a flat 128-slot array when both
    * strings are ASCII (the hot path) and a boxed map otherwise —
    * identical recurrence either way.
    */
  def damerauLevenshtein(left: UTF8String, right: UTF8String): Int = {
    val a = codePoints(left.toString)
    val b = codePoints(right.toString)
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    // d is (n+2)×(m+2): row/col 0 hold the "infinity" sentinel the
    // transposition recurrence reads when a character has no previous
    // occurrence; row/col 1 are the usual empty-prefix base case.
    val w = m + 2
    val need = (n + 2) * w
    var d = dpScratch.get()
    if (d.length < need) { d = new Array[Int](need); dpScratch.set(d) }
    val inf = n + m
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    var ascii = true
    i = 0
    while (i < n && ascii) { if (a(i) >= 128) ascii = false; i += 1 }
    j = 0
    while (j < m && ascii) { if (b(j) >= 128) ascii = false; j += 1 }
    // last row index (1-based) where each code point occurred in `a`
    val daFlat = if (ascii) { val t = asciiLastRow.get(); java.util.Arrays.fill(t, 0); t } else null
    val daMap = if (ascii) null else new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= n) {
      var db = 0 // last column j' < j (1-based) with b(j'-1) == a(i-1)
      j = 1
      while (j <= m) {
        val k =
          if (ascii) daFlat(b(j - 1))
          else { val v = daMap.get(b(j - 1)); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      if (ascii) daFlat(a(i - 1)) = i else daMap.put(a(i - 1), i)
      i += 1
    }
    d((n + 1) * w + m + 1)
  }

  /** Jaro–Winkler similarity with the standard parameters DuckDB's
    * `jaro_winkler_similarity` uses (empirically pinned this round on
    * transposition-heavy, prefix-heavy, and sub-threshold pairs):
    * match window ⌊max(n,m)/2⌋−1, transpositions halved, Winkler prefix
    * boost p=0.1 over at most 4 leading characters, applied only when
    * jaro > 0.7. Arithmetic order mirrors the reference exactly —
    * `(m/n + m/m' + (m−t)/m)/3` then `j + (ℓ·0.1)·(1−j)` — so results
    * are bit-identical doubles, which the hash oracle requires.
    */
  def jaroWinkler(left: UTF8String, right: UTF8String): Double = {
    if (left.equals(right)) return 1.0
    val a = codePoints(left.toString)
    val b = codePoints(right.toString)
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(n, m) / 2 - 1
    val ma = new Array[Boolean](n)
    val mb = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = matches.toDouble
    val jaro = (md / n + md / m + (md - t) / md) / 3
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(n, m)) && a(l) == b(l)) l += 1
    jaro + (l * 0.1) * (1.0 - jaro)
  }

  private val SoundexCodes: Array[Char] = {
    // A B C D E F G H I J K L M N O P Q R S T U V W X Y Z
    "01230120022455012623010202".toCharArray
  }

  /** Soundex phonetic code, SEPARATOR VARIANT: uppercase the letters
    * (non-letters dropped), map every letter to its Soundex digit class
    * (vowels AND h/w/y → 0), collapse consecutive equal digits, drop the
    * first collapsed digit (it belongs to the kept first letter), strip
    * zeros, pad to `X999`. Differs from classic American Soundex in ONE
    * documented rule: h and w SEPARATE equal codes instead of being
    * transparent (ASHCRAFT → A226 here vs A261 classic) — the variant
    * every pure-SQL formulation computes, chosen so the DuckDB oracle can
    * replicate it exactly (RE2 has no backreferences and no mechanism
    * for code-transparency, so classic Soundex is not SQL-expressible).
    * Empty / letterless input → empty string.
    */
  def soundexSep(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(4)
    var first: Char = 0
    var prev: Char = 'x' // last emitted code, collapse state
    var i = 0
    while (i < str.length && sb.length < 4) {
      val c0 = str.charAt(i)
      val c = if (c0 >= 'a' && c0 <= 'z') (c0 - 32).toChar else c0
      if (c >= 'A' && c <= 'Z') {
        val code = SoundexCodes(c - 'A')
        if (first == 0) {
          first = c
          sb.append(c)
        } else if (code != prev && code != '0') sb.append(code)
        prev = code
      }
      i += 1
    }
    if (first == 0) UTF8String.EMPTY_UTF8
    else {
      while (sb.length < 4) sb.append('0')
      UTF8String.fromString(sb.toString)
    }
  }

  /** Unicode NFC canonical normalization (java.text.Normalizer) — the
    * corpus-hygiene primitive that makes `café` (e + combining acute)
    * and `café` (precomposed é) the same bytes before any md5-exact
    * dedup or tokenizer sees them. `isNormalized` first: it answers
    * without allocating for the overwhelmingly-common already-NFC
    * (all-ASCII included) case, so the hot path returns the input
    * UTF8String untouched. Matches DuckDB's `nfc_normalize`.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unrestricted Damerau–Levenshtein distance — see
  * [[StringKernels.damerauLevenshtein]].
  */
case class DamerauLevenshtein(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.StringKernels.damerauLevenshtein($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

/** Jaro–Winkler similarity — see [[StringKernels.jaroWinkler]]. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.StringKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Separator-variant Soundex phonetic code — see
  * [[StringKernels.soundexSep]].
  */
case class SoundexSep(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    StringKernels.soundexSep(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.StringKernels.soundexSep($c)")

  override protected def withNewChildInternal(newChild: Expression): SoundexSep =
    copy(child = newChild)
}

/** Unicode NFC canonical normalization — see [[StringKernels.nfcNormalize]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    StringKernels.nfcNormalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.StringKernels.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** First `nHex` hex digits of md5(utf8(s)) as an unsigned Long — the
  * value of `conv(substring(md5(s), 1, nHex), 16, 10)` without ever
  * materializing the hex string: the digest bytes are consumed nibble
  * by nibble. The repo's md5-uniform contract (idBucket, priority
  * sampling, Poisson bootstrap, HLL registers) evaluates this millions
  * of times per task, and Spark's `conv` path (hex string build +
  * NumberConverter re-parse) measured ~735 ns/row at q331's fan-out —
  * this kernel is a digest plus four shifts. nHex ≤ 15 keeps the value
  * positive.
  */
case class Md5PrefixLong(child: Expression, nHex: Int) extends UnaryExpression {
  require(nHex >= 1 && nHex <= 15, s"nHex must be in [1,15]: $nHex")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    StringKernels.md5PrefixLong(s.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.StringKernels.md5PrefixLong($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.expressions._

/** Registers the native graft expressions as SQL functions, so the hot
  * vector/sketch primitives are callable from `spark.sql(...)` as well as
  * the Scala Column API:
  *
  * {{{
  * spark.sql("SELECT graft_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * on the session builder (the documented `SparkSessionExtensions` path —
  * no session-state hacking).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    // cheap necessary-condition guards in front of edit-distance DPs,
    // in filters and join conditions alike
    ext.injectOptimizerRule(_ => graft.plans.EditDistanceGuardRule)

    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float/double arrays"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity, 0 for zero-norm inputs"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_bucket"),
      info("graft_hyperplane_bucket",
        "graft_hyperplane_bucket(vec, nBits, seed) - random-hyperplane LSH bucket (long)"),
      (children: Seq[Expression]) =>
        HyperplaneBucket(children(0), intArg(children(1), "nBits"), intArg(children(2), "seed"))))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(shingles, numHashes) - MinHash signature as array<long>"),
      (children: Seq[Expression]) =>
        MinHashSignature(children(0), intArg(children(1), "numHashes"))))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash of a string array"),
      (children: Seq[Expression]) => SimHash64(children(0))))

    ext.injectFunction((
      FunctionIdentifier("graft_count_occurrences"),
      info("graft_count_occurrences",
        "graft_count_occurrences(haystack, needle) - non-overlapping occurrence count of a literal needle"),
      (children: Seq[Expression]) =>
        CountOccurrences(children(0), stringArg(children(1), "needle"))))

    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(words, k) - distinct hashed word k-shingles as array<long>"),
      (children: Seq[Expression]) =>
        ShingleHashes(children(0), intArg(children(1), "k"))))

    ext.injectFunction((
      FunctionIdentifier("graft_positional_shingle_hashes"),
      info("graft_positional_shingle_hashes",
        "graft_positional_shingle_hashes(words, k) - order-preserving k-shingle hashes, one per window start"),
      (children: Seq[Expression]) =>
        PositionalShingleHashes(children(0), intArg(children(1), "k"))))

    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count",
        "graft_sorted_intersect_count(a, b) - |A ∩ B| of two sorted distinct string/long arrays"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_int_dot"),
      info("graft_int_dot",
        "graft_int_dot(a, b) - exact 64-bit integer dot product of two long arrays"),
      (children: Seq[Expression]) => IntDotProduct(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_damerau"),
      info("graft_damerau",
        "graft_damerau(a, b) - unrestricted Damerau-Levenshtein distance (transposition cost 1)"),
      (children: Seq[Expression]) => DamerauLevenshtein(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (p=0.1, prefix<=4, boost above 0.7)"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_regexp_count"),
      info("graft_regexp_count",
        "graft_regexp_count(text, pattern) - non-overlapping match count of a literal regex, no match-array materialization"),
      (children: Seq[Expression]) =>
        RegexpCount(children(0), stringArg(children(1), "pattern"))))
  }
}

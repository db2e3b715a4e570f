package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction — term → posting list, the retrieval-side
  * data structure [[Bm25]] scores against. Building it IS a distributed
  * aggregation problem: the posting list of a common term ("the") is as
  * long as the corpus, so an index builder must bound what any single
  * reducer materializes.
  */
object Indexing {

  /** Posting-list summary per term: (term, df, postings) where `postings`
    * is the first `k` doc ids in ascending order, comma-joined. Terms
    * are distinct-per-doc (presence, not frequency — [[Bm25.stats]]
    * owns tf).
    *
    * Scale shape: explode to (term, doc_id) pairs — distinct within doc
    * via `array_distinct` BEFORE the explode, so the shuffle carries one
    * pair per (doc, term), not per token occurrence. The bounded-k
    * posting prefix means no reducer ever holds an unbounded list …
    * almost: `collect_list` buffers each term's group before the
    * sort+slice, so this form is exact-but-bounded only with a df cap or
    * pre-truncation; the scalable exact form for full posting lists is a
    * (term, doc_id)-sorted WRITE (partitionBy(term) sort_within), which
    * [[graft.io.Bucketing]] covers. `k` here bounds the oracled surface.
    */
  def postingSummary(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    Dedup.parallelize(docs)
      .select(col(idCol).cast("long").as("id"),
        explode(array_distinct(Dedup.wordTokens(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        concat_ws(",", slice(sort_array(collect_list(col("id"))), 1, k)).as("postings"))
  }

  /** Bitmap index of categorical presence per key: each category from
    * the CLOSED `categories` list owns one bit; per key emit the OR of
    * the bits seen (`cat_mask`) and its popcount (`n_cats`). The "which
    * event types has this user ever fired" profile as ONE Long per key —
    * set algebra over entities (users who did A and B but never C)
    * becomes bitwise AND/OR on the mask instead of k semi-joins.
    *
    * Scale shape: a single hash aggregation — `bit_or` partials combine
    * map-side, the shuffle carries one Long per (partition, key).
    * Categories outside the list map to no bit (count them upstream if
    * that matters); ≤ 63 categories by construction.
    */
  def categoryBitmap(
      df: DataFrame,
      keyCols: Seq[String],
      catCol: String,
      categories: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(categories.nonEmpty && categories.size <= 63,
      s"need 1..63 categories: ${categories.size}")
    require(categories.distinct.size == categories.size, "categories must be distinct")
    val bit = categories.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (c, i)) => when(col(catCol) === c, lit(1L << i)).otherwise(acc)
    }
    df.groupBy(keyCols.map(col): _*)
      .agg(bit_or(bit).as("cat_mask"))
      .withColumn("n_cats", bit_count(col("cat_mask")).cast("long"))
  }

  /** Market-basket co-occurrence: for every unordered item pair that
    * shares at least `minPairCount` baskets, the pair count, each item's
    * basket count, and the exact lift in ppm —
    * `lift_ppm = ⌊1e6·n_ab·N / (n_a·n_b)⌋` (N = total baskets). Lift > 1e6
    * means the pair co-occurs MORE than independence predicts — the
    * "bought together" / co-mention signal behind recommendations and
    * template detection.
    *
    * Scale shape: presence is deduped to one (basket, item) row BEFORE
    * the pair join, so the self-join on the basket key materializes
    * Σ_b |b|² pairs — bounded by basket size (carts, orders, docs'
    * tag sets are small by construction), never corpus². `minPairCount`
    * prunes the long tail right after the pair count; the item-count
    * table is vocabulary-sized and broadcasts; N rides along as a one-row
    * broadcast crossJoin.
    */
  def coOccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1: $minPairCount")
    val presence = df.select(col(basketCol).as("basket"), col(itemCol).as("item")).distinct()
    val itemCounts = presence.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val totals = presence.select(col("basket")).distinct().agg(count(lit(1)).as("__N"))
    val pairs = presence.alias("l").hint("shuffle_hash")
      .join(presence.alias("r").hint("shuffle_hash"),
        col("l.basket") === col("r.basket") && col("l.item") < col("r.item"))
      .groupBy(col("l.item").as("a_item"), col("r.item").as("b_item"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    pairs
      .join(broadcast(itemCounts.select(col("item").as("a_item"), col("n_item").as("n_a"))), "a_item")
      .join(broadcast(itemCounts.select(col("item").as("b_item"), col("n_item").as("n_b"))), "b_item")
      .crossJoin(broadcast(totals))
      .select(col("a_item"), col("b_item"), col("n_ab"), col("n_a"), col("n_b"),
        floor(lit(1000000L) * col("n_ab") * col("__N") / (col("n_a") * col("n_b"))).as("lift_ppm"))
  }

  /** Characteristic terms per document: the `k` terms that are frequent
    * IN the document but rare ACROSS the corpus — ranked by
    * (tf desc, df asc, term asc), an all-integer TF-IDF surrogate (the
    * float idf log is monotone in 1/df, so the rank order matches
    * tf·idf's within equal tf) that stays exact and engine-portable.
    * The keyword/topic-tag extraction step of a corpus pipeline.
    *
    * Scale shape: per-doc term frequencies aggregate map-side (one
    * (doc, term) row per distinct term, not per occurrence, after the
    * count); the document-frequency table is vocabulary-sized and joins
    * the per-doc table on the term key; final top-k is a per-doc window
    * over ≤ |doc vocabulary| rows. Document bodies never shuffle.
    */
  def characteristicTerms(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val tokens = Dedup.parallelize(docs)
      .select(col(idCol).cast("long").as("id"),
        explode(Dedup.wordTokens(col(textCol))).as("term"))
    val tf = tokens.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("id").as(idCol), col("term"), col("tf"), col("df"), col("rank"))
  }

  /** Hierarchical path rollup: rows carrying a `/`-separated path emit
    * one aggregate row per path PREFIX — the "usage by subtree" report
    * (telemetry namespaces, dataset directories, category trees) without
    * a recursive query: `a/b/c` contributes to `a`, `a/b`, and `a/b/c`.
    * Output per prefix: (path, depth, n_rows, total).
    *
    * Scale shape: prefix fan-out happens in the map projection (bounded
    * by path depth), then ONE map-side-combined hash aggregation on the
    * prefix — shallow prefixes ("a") receive heavy partial-aggregated
    * traffic but each partition sends one partial row per prefix, so the
    * hot root key is a combiner problem, not a skew problem.
    */
  def pathRollup(
      df: DataFrame,
      pathCol: String,
      valueCol: String): DataFrame = {
    // substring_index, not transform(slice+concat_ws): the nested-HOF
    // form falls out of whole-stage codegen and ran ~4× slower at bench
    // scale — prefix extraction is a plain string scan per (row, depth).
    df
      .select(col(pathCol).as("__path"), col(valueCol).cast("long").as("__v"),
        size(split(col(pathCol), "/")).as("__d"))
      .select(col("__path"), col("__v"),
        explode(sequence(lit(1), col("__d"))).as("__depth"))
      .groupBy(expr("substring_index(__path, '/', __depth)").as("path"),
        col("__depth").cast("long").as("depth"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("total"))
  }

  /** Reciprocal-rank fusion: merge several per-key rankings of the same
    * item space into one consensus ranking. Each input carries
    * (key, item, rank); an item's fused score is `Σ ⌊1e6 / (k0 + rank)⌋`
    * over the rankings that listed it (the classic RRF formula, kept in
    * integer micro-units so every engine reproduces it bit-for-bit —
    * floor-per-list BEFORE the sum, so addition order can't matter).
    * Items absent from a list simply contribute nothing — RRF's built-in
    * handling of partial overlap, no imputation step. Output: per key,
    * the `topK` items by (score desc, item asc), with `fused_rank`.
    *
    * The standard way to combine heterogeneous retrieval signals (BM25
    * vs embedding ANN, or any multi-criteria ranking) without score
    * calibration — only ranks cross the boundary, so scales never clash.
    *
    * Scale shape: union of the (already small, top-k-sized) ranking
    * relations → one hash aggregation on (key, item) — partials combine
    * map-side — then a per-key window over ≤ Σk items. No join against
    * the corpus: fusion touches ranks, never documents.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      keyCol: String,
      itemCol: String,
      rankCol: String,
      k0: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rankings must be non-empty")
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    require(topK >= 1, s"topK must be >= 1: $topK")
    import org.apache.spark.sql.expressions.Window
    val contribs = rankings
      .map(_.select(col(keyCol), col(itemCol),
        expr(s"1000000L div (${k0}L + cast($rankCol as long))").as("__c")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__score").desc, col(itemCol))
    contribs.groupBy(col(keyCol), col(itemCol))
      .agg(sum(col("__c")).as("__score"), count(lit(1)).as("n_lists"))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .where(col("fused_rank") <= topK)
      .withColumnRenamed("__score", "rrf_score")
  }
}

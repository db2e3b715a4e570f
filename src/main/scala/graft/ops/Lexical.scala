package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document lexical-diversity profile — the vocabulary-richness quality
  * signals a corpus filter thresholds on (template-generated and keyword-spam
  * pages score low; natural prose scores high). All-integer outputs so the
  * report is exact, order-independent, and engine-portable.
  */
object Lexical {

  /** Per-doc lexical diversity over the shared whitespace tokenizer
    * ([[Dedup.wordTokens]]):
    *
    *  - `n_tokens` / `n_types`: token and distinct-token counts;
    *  - `ttr_ppm`: type–token ratio ⌊1e6·types/tokens⌋ (0 for empty);
    *  - `simpson_sum`: Σ tf² over the doc's term frequencies — the exact
    *    integer numerator of the repeat/collision probability
    *    (Σtf² − n)/(n(n−1)); kept unnormalized so it stays exact;
    *  - `hapax`: terms occurring exactly once (hapax legomena).
    *
    * Empty/whitespace-only docs are kept with all-zero counts (a filter
    * wants to SEE them, not lose them).
    *
    * Scale shape: explode → one `(doc, term)` map-side-combined count →
    * one per-doc agg — the shuffle carries term-frequency integers, never
    * text bodies — then a broadcast-sized zero-fill join back to the doc
    * ids (doc_id is unique, so the join is 1:1 and stays hash-partitioned
    * on the same key as the agg).
    */
  def diversity(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(Dedup.wordTokens(col(textCol))).as("__term"))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val perDoc = tf.groupBy(col(idCol))
      .agg(
        sum(col("__tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__tf") * col("__tf")).as("simpson_sum"),
        count_if(col("__tf") === 1).as("hapax"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("(1000000L * n_types) div n_tokens")).as("ttr_ppm"),
        coalesce(col("simpson_sum"), lit(0L)).as("simpson_sum"),
        coalesce(col("hapax"), lit(0L)).as("hapax"))
  }

  /** Per-doc sentence-shape profile: sentence count (segments between
    * `[.!?]+` runs that contain any non-whitespace) plus exact-integer
    * chars-per-sentence and words-per-sentence in ppm — the
    * readability-proxy features a quality filter thresholds on (both
    * one-word telegraphic spam and unpunctuated run-on walls score at the
    * extremes). Map-only column math; zero shuffles.
    */
  def sentenceStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val segs = split(col(textCol), "[.!?]+")
    val nSent = size(filter(segs, s => s.rlike("\\S"))).cast("long")
    val nChars = coalesce(length(col(textCol)).cast("long"), lit(0L))
    val nWords = graft.functions.TextFunctions.wordCount(col(textCol)).cast("long")
    docs.select(
      col(idCol),
      coalesce(nSent, lit(0L)).as("n_sentences"),
      nChars.as("n_chars"),
      coalesce(nWords, lit(0L)).as("n_words"))
      .withColumn("chars_per_sentence_ppm",
        when(col("n_sentences") === 0, 0L)
          .otherwise(expr("(1000000L * n_chars) div n_sentences")))
      .withColumn("words_per_sentence_ppm",
        when(col("n_sentences") === 0, 0L)
          .otherwise(expr("(1000000L * n_words) div n_sentences")))
  }

  /** Per-doc character-class census: exact counts of digits, uppercase,
    * lowercase, whitespace, and everything else (each via one global
    * regexp strip — `len − len(strip(class))` — so the five counts always
    * sum to the length), plus the digit share in ppm. The raw signals
    * under boilerplate/spam heuristics ("mostly digits", "no lowercase",
    * "symbol soup"), exposed as columns instead of a baked-in score.
    * Map-only; zero shuffles. ASCII classes by design — engine-portable
    * where Unicode category classes are ICU-version-dependent.
    */
  def charClasses(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val len = length(t).cast("long")
    def classCount(pattern: String) =
      (len - length(regexp_replace(t, pattern, ""))).cast("long")
    docs.select(
      col(idCol),
      len.as("n_chars"),
      classCount("[0-9]").as("n_digit"),
      classCount("[A-Z]").as("n_upper"),
      classCount("[a-z]").as("n_lower"),
      classCount("\\s").as("n_space"))
      .withColumn("n_other",
        col("n_chars") - col("n_digit") - col("n_upper") - col("n_lower") - col("n_space"))
      .withColumn("digit_ppm",
        when(col("n_chars") === 0, 0L)
          .otherwise(expr("(1000000L * n_digit) div n_chars")))
  }

  /** Per-doc PII density report: independent match counts for each
    * [[graft.functions.TextFunctions.RedactionRules]] pattern (email, IP,
    * long-id, phone) plus matches-per-kilochar — the triage signal that
    * decides between dropping a document and redacting it
    * ([[graft.functions.TextFunctions.redact]]). Counts are independent
    * per pattern (unlike redaction, where earlier rules consume text), so
    * the report shows what each rule WOULD see. Map-only; zero shuffles;
    * patterns stay in the Java-regex ∩ RE2 subset, so any engine replays
    * them.
    */
  def piiDensity(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val names = Seq("n_email", "n_ip", "n_longid", "n_phone")
    val counts = graft.functions.TextFunctions.RedactionRules.map(_._1).zip(names).map {
      case (pattern, name) =>
        size(regexp_extract_all(t, lit(pattern), lit(0))).cast("long").as(name)
    }
    docs.select(col(idCol) +: length(t).cast("long").as("n_chars") +: counts: _*)
      .withColumn("pii_per_kilochar",
        expr(s"(1000L * (${names.mkString(" + ")})) div greatest(n_chars, 1L)"))
  }

  /** Pairwise unigram-distribution drift between corpus groups: for every
    * group pair (a < b), the L1 distance between their word distributions
    * in exact ppm — `Σ_w |p_a(w) − p_b(w)|` with `p(w) = ⌊1e6·tf/total⌋`
    * — plus the shared-vocabulary size. 0 = identical mix, up to
    * ~2 000 000 = disjoint vocabularies. The corpus-mix drift monitor:
    * run it source-vs-source to spot a feed whose content shifted, or
    * snapshot-vs-snapshot as the ingest regression gate.
    *
    * Scale shape: one token explode → (group, word) hash agg (map-side
    * combined — the only corpus-sized stage); the distance then runs on
    * vocabulary-sized data: an inner self-join on word for shared terms
    * (each side's distribution table, re-read via identical child plans
    * so the exchange is reused) + broadcast per-group ppm totals to
    * account for unshared mass without materializing the disjoint word
    * union: `L1 = Σ_shared|p_a−p_b| + (T_a − Σ_shared p_a) +
    * (T_b − Σ_shared p_b)`. The group-pair universe is a broadcast cross
    * of the (tiny) group list, so pairs with zero shared words still
    * report.
    */
  /** Intra-document sentence repetition profile: per doc, sentence count,
    * distinct-sentence count, removed-if-deduped count and its ppm share
    * — the WITHIN-document complement of the cross-corpus segment
    * profile ([[Dedup.segmentDupProfile]]). Template/spam pages repeat
    * their own sentences; this is the signal a "dedup lines within doc"
    * cleaning pass (C4-style) keys on. Sentences split on `[.!?]+`
    * ([[sentenceStats]]' convention), trimmed, blanks dropped; zero-
    * sentence docs report zeros. Map-only; zero shuffles.
    */
  def sentenceDupProfile(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val segs = filter(
      transform(split(coalesce(col(textCol), lit("")), "[.!?]+"), s => trim(s)),
      s => s =!= "")
    docs.select(col(idCol), segs.as("__s"))
      .select(col(idCol),
        size(col("__s")).cast("long").as("n_sentences"),
        size(array_distinct(col("__s"))).cast("long").as("n_distinct"))
      .withColumn("n_dup", col("n_sentences") - col("n_distinct"))
      .withColumn("dup_ppm",
        when(col("n_sentences") === 0, 0L)
          .otherwise(expr("(1000000L * n_dup) div n_sentences")))
  }

  def unigramDrift(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val counts = Dedup.parallelize(docs)
      .select(col(groupCol).as("g"), explode(Dedup.wordTokens(col(textCol))).as("word"))
      .groupBy(col("g"), col("word")).agg(count(lit(1)).as("__n"))
    val withTot = counts
      .withColumn("__tot", sum(col("__n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .withColumn("__p", expr("(1000000L * __n) div __tot"))
      .select(col("g"), col("word"), col("__p"))
    val ppmTot = withTot.groupBy(col("g")).agg(sum(col("__p")).as("__t"))
    val shared = withTot.alias("a").hint("shuffle_hash")
      .join(withTot.alias("b").hint("shuffle_hash"),
        col("a.word") === col("b.word") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g_a"), col("b.g").as("g_b"))
      .agg(sum(abs(col("a.__p") - col("b.__p"))).as("__l1s"),
        sum(col("a.__p")).as("__sa"), sum(col("b.__p")).as("__sb"),
        count(lit(1)).as("n_shared_terms"))
    val pairs = ppmTot.alias("ta").crossJoin(broadcast(ppmTot.alias("tb")))
      .where(col("ta.g") < col("tb.g"))
      .select(col("ta.g").as("g_a"), col("tb.g").as("g_b"),
        col("ta.__t").as("__ta"), col("tb.__t").as("__tb"))
    pairs.join(shared, Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"),
        (coalesce(col("__l1s"), lit(0L)) +
          (col("__ta") - coalesce(col("__sa"), lit(0L))) +
          (col("__tb") - coalesce(col("__sb"), lit(0L)))).as("l1_ppm"),
        coalesce(col("n_shared_terms"), lit(0L)).as("n_shared_terms"))
  }

  /** Tokenizer fertility per language — the tokens-per-word and
    * characters-per-token ratios a tokenizer budget planner reads per
    * language bucket (high fertility = the tokenizer fragments that
    * language; drives vocab allocation and per-language token pricing).
    * Words are the whitespace tokenizer ([[Dedup.wordTokens]]); tokens the
    * BPE-ish pre-tokenizer ([[graft.functions.TextFunctions.TokenPattern]]).
    * Ratios are ⌊1e6·x⌋ ppm so the report is integer-exact.
    *
    * Scale shape: one map-side projection (two regex scans per doc, no
    * explode — counts only) + one hash agg on the language key. The 100 TB
    * cost is the corpus scan itself.
    */
  def tokenFertility(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    docs
      .select(col(langCol).as("lang"),
        size(Dedup.wordTokens(col(textCol))).cast("long").as("__w"),
        TextFunctions.tokenCount(col(textCol)).as("__t"),
        length(col(textCol)).cast("long").as("__c"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__w")).as("n_words"),
        sum(col("__t")).as("n_tokens"),
        sum(col("__c")).as("n_chars"))
      .withColumn("fertility_ppm",
        when(col("n_words") === 0, 0L)
          .otherwise(expr("(1000000L * n_tokens) div n_words")))
      .withColumn("chars_per_token_ppm",
        when(col("n_tokens") === 0, 0L)
          .otherwise(expr("(1000000L * n_chars) div n_tokens")))
  }

  /** Per-language hapax legomena profile: vocabulary size (types),
    * token count, and the share of types seen EXACTLY ONCE — the
    * classic corpus-maturity signal (a healthy natural-language corpus
    * runs ~40–60% hapax by Zipf; scraped boilerplate collapses it,
    * OCR noise and mixed-language shards inflate it). Complements
    * [[graft.ops.Ngrams]]' vocabulary growth/coverage curves with the
    * type-frequency-spectrum endpoint.
    *
    * Scale shape: one (lang, word) count agg — map-side combined, the
    * shuffle carries the vocabulary, never documents — then a
    * lang-cardinality rollup. No windows.
    */
  def hapax(docs: DataFrame, langCol: String = "lang", textCol: String = "text"): DataFrame = {
    docs
      .select(col(langCol).as("lang"), explode(Dedup.wordTokens(col(textCol))).as("word"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("__n")).as("n_tokens"),
        count_if(col("__n") === 1).as("n_hapax"))
      .withColumn("hapax_ppm", expr("(1000000L * n_hapax) div n_types"))
  }

  /** Pairwise VOCABULARY Jaccard between groups (sources, languages,
    * snapshots): exact `|A∩B| / |A∪B|` over each group's distinct word
    * set — the lexical-identity Venn that catches a relabeled or
    * re-crawled source sharing its entire vocabulary, where
    * [[graft.ops.Dedup.crossGroupOverlap]]'s 16-word blocks only catch
    * verbatim passages. Emits every unordered group pair with the exact
    * integer evidence: (g_a, g_b, n_a, n_b, n_common, jaccard_ppm).
    *
    * Scale shape: one distinct (group, word) agg (vocabulary-sized, the
    * documents never shuffle), one word-keyed self-join producing
    * pair-intersection counts (cost Σ_w groups(w)² — bounded by the
    * group count, not the corpus), one broadcast of per-group sizes.
    */
  def vocabJaccard(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val vocab = docs
      .select(col(groupCol).as("g"), explode(Dedup.wordTokens(col(textCol))).as("word"))
      .distinct()
    val sizes = vocab.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val common = vocab.alias("a")
      .join(vocab.alias("b"),
        col("a.word") === col("b.word") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g_a"), col("b.g").as("g_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("g").as("g_a"), col("n").as("n_a"))), Seq("g_a"))
      .join(broadcast(sizes.select(col("g").as("g_b"), col("n").as("n_b"))), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"), col("n_common"),
        expr("(1000000L * n_common) div (n_a + n_b - n_common)").as("jaccard_ppm"),
        // Szymkiewicz–Simpson overlap (∩ / min) and both directional
        // containments: a re-crawl that swallowed a smaller source whole
        // shows overlap ≈ 1 while Jaccard stays low
        expr("(1000000L * n_common) div least(n_a, n_b)").as("overlap_ppm"),
        expr("(1000000L * n_common) div n_a").as("a_in_b_ppm"),
        expr("(1000000L * n_common) div n_b").as("b_in_a_ppm"))
  }

  /** Language-ID confusion matrix: the recorded `lang` label crossed
    * with [[graft.functions.TextFunctions]]' n-gram-marker guess, with
    * each cell's within-label share in ppm — the eval table that says
    * WHERE the classifier is wrong (es→fr confusion reads differently
    * from everything→und), where q14 only emits the guesses.
    *
    * Scale shape: the guess is map-only column math; one (label, guess)
    * count agg + a labels-bounded broadcast for shares.
    */
  def langConfusion(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    val cells = docs
      .select(col(langCol).as("lang"),
        TextFunctions.langGuessFromPadded(TextFunctions.paddedText(col(textCol)))
          .as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("__tot"))
    cells.join(broadcast(totals), Seq("lang"))
      .withColumn("share_ppm", expr("(1000000L * n) div __tot"))
      .drop("__tot")
  }

  /** Rarity-ranked keyword extraction: each document's `k` RAREST
    * distinct terms by global document frequency (ties by term) — the
    * integer-exact cousin of tf-idf keyword picking (df ordering equals
    * idf ordering; no float log needed), good enough for routing,
    * clustering seeds and index keys. Emits (doc_id, term, df, rank).
    *
    * Scale shape: one vocabulary-sized df aggregation broadcast onto
    * the distinct (doc, term) stream, one per-doc rank window — both
    * key-partitioned; bodies never shuffle.
    */
  def rarestTerms(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .select(col(idCol).as("doc_id"), explode(Dedup.wordTokens(col(textCol))).as("term"))
      .distinct()
    val df = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("term"))
    terms.join(broadcast(df), Seq("term"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("df"), col("rank"))
  }

  /** Token-sort duplicate keys: normalize each name/title to its SORTED
    * distinct-token fingerprint ("smith, john" ≡ "John Smith") and emit
    * every fingerprint shared by 2+ records with its member ids — the
    * zero-cost entity-resolution pass that catches word-order and
    * punctuation variants BEFORE any edit-distance join runs. Emits
    * (fingerprint, n_records, ids sorted).
    *
    * Scale shape: one fingerprint count agg + a collect bounded by the
    * duplicate-group size (groups are name-collision-sized, not
    * corpus-sized); records never pair-join.
    */
  def tokenSortDups(
      df: DataFrame,
      idCol: String,
      nameCol: String): DataFrame = {
    df.select(col(idCol).cast("long").as("__id"),
        concat_ws(" ",
          array_sort(array_distinct(Dedup.wordTokens(col(nameCol))))).as("fingerprint"))
      .where(length(col("fingerprint")) > 0)
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_records"),
        concat_ws(",", transform(sort_array(collect_list(col("__id"))),
          i => i.cast("string"))).as("ids"))
      .where(col("n_records") >= 2)
  }

  /** Per-doc readability: Flesch reading-ease from exact integer counts —
    * words (whitespace tokens), sentences (`[.!?]+`-separated segments
    * with any non-whitespace), and syllables approximated the standard
    * heuristic way as VOWEL-GROUP RUNS (`[aeiouy]+` in the lowercased
    * text; "readable" → 3). The score is published in milli-points,
    * `⌊1000·(206.835 − 1.015·W/S − 84.6·Y/W)⌋`, with the double
    * arithmetic spelled in one fixed order so any IEEE engine reproduces
    * the identical bits — plus the three raw counts, which are the
    * scale-safe signals a quality filter actually thresholds.
    *
    * Run counting is the two-strip identity
    * `len(replace(runs → "#")) − len(replace(runs → ""))` — each run
    * collapses to one `#` in the first strip and to nothing in the
    * second, so the difference counts runs with no per-row loop. Docs
    * with zero sentences or zero words emit a null score (the counts
    * still flow). Map-only column math; zero shuffles.
    */
  def readability(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val lower = org.apache.spark.sql.functions.lower(t)
    def runCount(s: Column, pattern: String) =
      (length(regexp_replace(s, pattern, "#")) - length(regexp_replace(s, pattern, ""))).cast("long")
    val segs = split(t, "[.!?]+")
    docs.select(
      col(idCol),
      graft.functions.TextFunctions.wordCount(t).cast("long").as("n_words"),
      size(filter(segs, s => s.rlike("\\S"))).cast("long").as("n_sentences"),
      runCount(lower, "[aeiouy]+").as("n_syllables"))
      .withColumn("flesch_milli",
        when(col("n_sentences") === 0 || col("n_words") === 0, lit(null).cast("long"))
          .otherwise(floor(lit(1000.0) *
            (lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
              - lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double"))))
            .cast("long")))
  }

  /** Unicode-normalization audit per group: how much of the corpus is
    * NOT in NFC canonical form — the dedup-blindspot detector (a
    * combining-sequence `café` and a precomposed `café` hash apart in
    * every byte-exact fingerprint until normalization runs). Emits doc
    * counts, non-NFC docs (via the native
    * [[graft.functions.TextFunctions.nfc]] kernel — allocation-free on
    * already-normalized text), the ppm share, and the total char-length
    * delta normalization would apply (0 for a clean corpus; negative
    * never — NFC only shortens or preserves combining sequences).
    *
    * Scale shape: pure map-side Column expressions into one
    * group-cardinality hash agg — embarrassingly parallel.
    */
  /** Intra-document half-overlap: Jaccard between the vocabularies of
    * each document's first and second half (by word count) — the
    * boilerplate/template detector ([[graft.ops.Repetition]] finds
    * repeated tokens; this finds documents whose back half RESTATES the
    * front, the mail-merge and scraped-listing shape). Pure map-side
    * array math per document — no shuffle at all until the caller
    * aggregates.
    */
  def halfVocabOverlap(df: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val words = filter(split(lower(coalesce(textCol, lit(""))), "\\s+"),
      w => length(w) > 0)
    df
      .withColumn("__w", words)
      .withColumn("__n", size(col("__w")))
      .withColumn("__h", expr("__n div 2"))
      .withColumn("__v1", array_distinct(slice(col("__w"), lit(1), col("__h"))))
      .withColumn("__v2", array_distinct(
        slice(col("__w"), col("__h") + 1, col("__n") - col("__h"))))
      .withColumn("__inter", size(array_intersect(col("__v1"), col("__v2"))))
      .withColumn("__union",
        size(col("__v1")) + size(col("__v2")) - col("__inter"))
      .select(col(idCol), col("__n").cast("long").as("n_words"),
        size(col("__v1")).cast("long").as("vocab_front"),
        size(col("__v2")).cast("long").as("vocab_back"),
        col("__inter").cast("long").as("n_common"),
        when(col("__union") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000L * __inter) div __union")).as("overlap_ppm"))
  }

  /** Vocabulary retention between consecutive periods: of the distinct
    * tokens period p−1 used, how many survive into p, how many dropped,
    * how many are new — the corpus-churn companion to
    * [[graft.ops.Cohort.revenueRetention]]'s money view, and the
    * early-warning for a scraper/source change (retention cliffs before
    * any volume metric moves).
    *
    * Scale shape: one distinct (period, token) pass, one token-keyed
    * lag-1 self-join (full outer, so drops and entries both count), one
    * period-level agg.
    */
  def vocabRetention(df: DataFrame, periodCol: Column, tokenCol: Column): DataFrame = {
    val pt = df.select(periodCol.cast("long").as("__p"), tokenCol.as("__t"))
      .where(col("__t").isNotNull)
      .distinct()
    val prev = pt.select((col("__p") + 1L).as("period"), col("__t"), lit(1).as("__inPrev"))
    val cur = pt.select(col("__p").as("period"), col("__t"), lit(1).as("__inCur"))
    prev.join(cur, Seq("period", "__t"), "full_outer")
      .groupBy(col("period"))
      .agg(count_if(col("__inPrev").isNotNull).as("prev_vocab"),
        count_if(col("__inPrev").isNotNull && col("__inCur").isNotNull).as("retained"),
        count_if(col("__inPrev").isNotNull && col("__inCur").isNull).as("dropped"),
        count_if(col("__inPrev").isNull).as("entered"))
      .where(col("prev_vocab") > 0)
      .withColumn("retention_ppm", expr("(1000000L * retained) div prev_vocab"))
  }

  /** Stylometric similarity between corpora: cosine over FUNCTION-WORD
    * frequency vectors — the authorship/style-drift signal (content
    * words say what a corpus is about; how often it says "the", "of",
    * "but" says who wrote it). Integer dot/norms with the single cosine
    * division in pinned double order (the
    * [[graft.ops.TimeSeries.dailyAutocorrelation]] posture — sqrt is
    * IEEE-exact, so both engines agree bit-for-bit).
    *
    * Scale shape: token explode filtered to the bounded function-word
    * list at the map side → a (group, word) count whose cardinality is
    * G×|words|; everything pairwise runs on that tiny table.
    */
  def stylometricCosine(
      df: DataFrame,
      groupCol: String,
      textCol: Column,
      functionWords: Seq[String] = Seq("the", "of", "and", "a", "to", "in",
        "is", "it", "that", "was", "for", "on", "with", "as", "but", "at",
        "by", "from", "or", "an")): DataFrame = {
    require(functionWords.nonEmpty, "need at least one function word")
    val counts = df
      .select(col(groupCol).cast("string").as("__g"),
        explode(split(lower(coalesce(textCol, lit(""))), "\\s+")).as("__w"))
      .where(col("__w").isin(functionWords: _*))
      .groupBy(col("__g"), col("__w")).agg(count(lit(1)).as("__c"))
    val norms = counts.groupBy(col("__g"))
      .agg(sum(col("__c") * col("__c")).as("__n2"), sum(col("__c")).as("__tot"))
    val dots = counts.alias("a")
      .join(counts.alias("b"),
        col("a.__w") === col("b.__w") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("g_a"), col("b.__g").as("g_b"))
      .agg(sum(col("a.__c") * col("b.__c")).as("dot"))
    dots
      .join(broadcast(norms.select(col("__g").as("g_a"), col("__n2").as("__n2a"),
        col("__tot").as("fw_tokens_a"))), Seq("g_a"))
      .join(broadcast(norms.select(col("__g").as("g_b"), col("__n2").as("__n2b"),
        col("__tot").as("fw_tokens_b"))), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("fw_tokens_a"), col("fw_tokens_b"), col("dot"),
        floor(lit(1000000.0) * col("dot") / (sqrt(col("__n2a")) * sqrt(col("__n2b"))))
          .cast("long").as("cosine_ppm"))
  }

  /** Weighted Jaccard between every pair of corpora over TOKEN COUNTS:
    * `Σ_t min(w_a(t), w_b(t)) / Σ_t max(w_a(t), w_b(t))` — the overlap
    * measure that, unlike set Jaccard, notices when one corpus merely
    * MENTIONS the other's dominant vocabulary vs actually sharing its
    * distribution. Exact integers: only common tokens need pairing,
    * because `Σmax = tot_a + tot_b − Σmin`.
    *
    * Scale shape: one (group, token) count agg, one token-keyed inner
    * join between group pairs (intermediate bounded by
    * Σ_t groups(t)² — the per-token group fan-out, ≤ G², never token
    * cardinality), totals broadcast on a groups-sized table.
    */
  def weightedJaccard(df: DataFrame, groupCol: String, tokenCol: Column): DataFrame = {
    val counts = df
      .select(col(groupCol).cast("string").as("__g"), tokenCol.as("__t"))
      .where(col("__t").isNotNull)
      .groupBy(col("__g"), col("__t")).agg(count(lit(1)).as("__w"))
    val totals = counts.groupBy(col("__g")).agg(sum(col("__w")).as("__tot"))
    val smin = counts.alias("a")
      .join(counts.alias("b"),
        col("a.__t") === col("b.__t") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("g_a"), col("b.__g").as("g_b"))
      .agg(sum(least(col("a.__w"), col("b.__w"))).as("sum_min"))
    smin
      .join(broadcast(totals.select(col("__g").as("g_a"), col("__tot").as("tot_a"))), Seq("g_a"))
      .join(broadcast(totals.select(col("__g").as("g_b"), col("__tot").as("tot_b"))), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("tot_a"), col("tot_b"), col("sum_min"),
        expr("(1000000L * sum_min) div (tot_a + tot_b - sum_min)").as("wjaccard_ppm"))
  }

  /** Log template mining, mask-and-count: hex runs (ids, hashes) then
    * digit runs collapse to placeholders, and the surviving template is
    * the message's shape — the observability workhorse that turns a
    * billion raw log lines into a few hundred countable behaviors.
    * Emits per template: occurrences, distinct raw forms, and the
    * lexicographically-smallest example (deterministic cross-engine).
    *
    * Scale shape: pure map-side regexp_replace into one
    * template-cardinality hash agg (min() carries the example — no
    * second pass, no window).
    */
  def logTemplates(df: DataFrame, messageCol: Column): DataFrame = {
    val raw = coalesce(messageCol, lit(""))
    val template =
      regexp_replace(
        regexp_replace(raw, "[0-9a-fA-F]{8,}", "<hex>"),
        "[0-9]+", "<n>")
    df.select(template.as("template"), raw.as("__raw"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n_msgs"),
        countDistinct(col("__raw")).as("n_distinct_msgs"),
        min(col("__raw")).as("example"))
  }

  /** Unicode SCRIPT profile per group: how many characters fall in each
    * major script range (Latin incl. the Latin-1/Extended accents,
    * Cyrillic, Greek, CJK+kana, Arabic, ASCII digits) plus a dominant
    * label — the mixed-script / wrong-language-routing detector that
    * byte-level lang-ID misses (a "de" document full of Cyrillic is a
    * routing bug, whatever the classifier said). Ranges are explicit
    * char classes — NOT `\\p{Script=...}` — because Java regex and RE2
    * spell script properties differently; explicit ranges are the
    * engine-identical subset. Dominant is the first maximum in a fixed
    * precedence order, `none` on script-less text.
    *
    * Scale shape: pure map-side regexp_replace/length Column math into
    * one group-cardinality hash agg.
    */
  def scriptProfile(df: DataFrame, groupCols: Seq[String], textCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val t = coalesce(textCol, lit(""))
    def inRange(range: String) =
      length(regexp_replace(t, s"[^$range]", "")).cast("long")
    val scripts = Seq(
      "latin" -> "A-Za-zÀ-ɏ",
      "cyrillic" -> "Ѐ-ӿ",
      "greek" -> "Ͱ-Ͽ",
      "cjk" -> "一-鿿぀-ヿ",
      "arabic" -> "؀-ۿ",
      "digit" -> "0-9")
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        scripts.map { case (name, r) => sum(inRange(r)).as(s"n_$name") }: _*)
    val top = greatest(scripts.map { case (n, _) => col(s"n_$n") }: _*)
    val dominant = scripts.foldRight(lit("none")) { case ((name, _), rest) =>
      when(top > 0 && col(s"n_$name") === top, name).otherwise(rest)
    }
    // foldRight keeps precedence latin > cyrillic > ... > digit: the
    // FIRST script hitting the max wins ties, mirrored in the oracle.
    agged.withColumn("dominant", dominant)
  }

  def unicodeAudit(df: DataFrame, groupCols: Seq[String], textCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val t = coalesce(textCol, lit(""))
    val n = graft.functions.TextFunctions.nfc(t)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        count_if(n =!= t).as("n_non_nfc"),
        sum((length(t) - length(n)).cast("long")).as("char_delta"))
      .withColumn("non_nfc_ppm", expr("(1000000L * n_non_nfc) div n_docs"))
  }
}

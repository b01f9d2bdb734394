package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.{LangId, TextSig}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` fixture (driver brief:
  * quality scoring, token counting, fingerprinting, language-ID).
  *
  * All per-document metrics are single-pass array expressions producing
  * exact integers; every ratio is one double division of exact ints, so
  * the outputs are engine-deterministic and DuckDB-oracle-checked
  * (q40–q43, q70, q97, q100–q105, q107, q109). Language-ID is a heuristic (no ground truth recoverable
  * from the synthetic fixture, whose languages share one vocabulary) and
  * is spec-tested on real sentences instead ([[graft.functions.LangId]]).
  *
  * Scale: per-doc metrics are map-only (no shuffle); the corpus rollups
  * are single hash-partitioned groupBys with map-side partial
  * aggregation; token frequencies are the canonical explode → groupBy
  * word-count whose combiner keeps the shuffle at vocabulary size.
  */
object TextOps {

  /** Stopword list used by the quality metrics (fixed; EN function
    * words — the fixture vocabulary contains 'the' and 'a'). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  // NOT fanned out by default (measured, r21 — see DedupOps.docs): the
  // shuffle-bearing queries here lose more to the added AQE stage than
  // the single-task scan costs them; the map-only heavy consumers apply
  // Tables.fanOut themselves (repetitionScores below, the codec family).
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Per-document metric columns shared by q40/q41. */
  private def withMetrics(d: DataFrame): DataFrame = {
    val tok = TextSig.tokens(col("text"))
    d.withColumn("tok", tok)
      .withColumn("n_tokens", size(col("tok")).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(col("tok"))).cast("long"))
      .withColumn("char_sum",
        aggregate(col("tok"), lit(0L), (acc, t) => acc + length(t)))
      .withColumn("n_stopwords",
        size(filter(col("tok"), w => w.isin(Stopwords: _*))).cast("long"))
  }

  // q40 — per-document quality metrics: token counts, distinct-token
  // ratio (repetitiveness), mean token length, stopword ratio
  val docQuality: (SparkSession, String) => DataFrame = (s, dir) =>
    withMetrics(docs(s, dir)).select(
      col("doc_id"),
      col("lang"),
      col("n_chars"),
      col("n_tokens"),
      col("n_distinct_tokens"),
      (col("n_distinct_tokens").cast("double") / col("n_tokens")).as("distinct_ratio"),
      (col("char_sum").cast("double") / col("n_tokens")).as("avg_token_len"),
      (col("n_stopwords").cast("double") / col("n_tokens")).as("stopword_ratio"))

  // q41 — corpus quality rollup per language: doc counts, length stats,
  // short-doc share, corpus-level stopword ratio
  val corpusQualityByLang: (SparkSession, String) => DataFrame = (s, dir) =>
    withMetrics(docs(s, dir))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
        sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("short_docs"),
        (sum(col("n_stopwords")).cast("double") / sum(col("n_tokens")))
          .as("stopword_ratio"))

  // q42 — token frequencies: the canonical distributed word count with
  // document frequency (explode → two-key aggregate; map-side combine
  // keeps the shuffle at vocabulary size)
  val tokenFrequencies: (SparkSession, String) => DataFrame = (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"), explode(TextSig.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("term_freq"),
        countDistinct(col("doc_id")).as("doc_freq"))

  // q43 — content fingerprints: md5 fingerprint + 16-hex-char prefix
  // bucket (the shard key a fingerprint dedup store would use); the
  // Karp–Rabin rolling hash variant is spec-tested (not SQL-expressible)
  val fingerprints: (SparkSession, String) => DataFrame = (s, dir) =>
    docs(s, dir).select(
      col("doc_id"),
      md5(col("text")).as("fingerprint"),
      substring(md5(col("text")), 1, 4).as("shard"))

  /** BPE-style pre-tokenizer regex (the GPT-2 shape reduced to constructs
    * both Java regex and DuckDB's RE2 support — no lookahead, no \p
    * classes): a token is an optional leading space followed by a letter
    * run, a digit run, or a punctuation run. Word-boundary splitting like
    * this is what real BPE vocabularies pre-segment on; the fixture text
    * is ASCII so the simplified classes are exact. */
  val BpeTokenRegex = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  // q70 — token counting, whitespace vs BPE-ish: per-doc whitespace token
  // count, regex pre-token count, and chars-per-pretoken (the
  // compression-rate proxy used to budget training-token costs)
  val tokenCounts: (SparkSession, String) => DataFrame = (s, dir) =>
    docs(s, dir)
      .withColumn("bpe", regexp_extract_all(col("text"), lit(BpeTokenRegex), lit(0)))
      .select(
        col("doc_id"),
        size(TextSig.tokens(col("text"))).cast("long").as("n_ws_tokens"),
        size(col("bpe")).cast("long").as("n_bpe_tokens"),
        (col("n_chars").cast("double") / size(col("bpe"))).as("chars_per_bpe_token"))

  /** q97 — deterministic train/val/test split, the standard 80/10/10
    * hash split every training-data pipeline runs before anything else.
    * The bucket is the LOW 32 BITS of md5(doc_id-as-string) mod 100 —
    * low 32 deliberately: they are non-negative in a signed long, so
    * Spark's signed `pmod` and DuckDB's unsigned `%` agree (the full
    * low-64 value would flip sign cross-engine). Content-independent
    * (id-keyed) so re-crawled/edited documents keep their split, pure
    * map-side at any corpus size, and fully engine-portable (the q72
    * md5-basis lesson) — the oracle recomputes every assignment. */
  /** The split bucket (md5-low-32 mod 100) shared by q97 and q103 — one
    * definition so the curation pipeline's train gate can never drift
    * from the actual dataset split. */
  private def splitBucket: Column = pmod(
    conv(substring(md5(col("doc_id").cast("string")), 9, 8), 16, 10).cast("long"),
    lit(100L))

  val splitAssign: (SparkSession, String) => DataFrame = (s, dir) => {
    val bucket = splitBucket
    docs(s, dir).select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
  }

  /** Language-ID over the corpus (heuristic; spec-tested — see scaladoc). */
  def detectLanguages(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      LangId.langId(col("text")).as("detected_lang"))

  /** q100 — DOMAIN-MIXTURE SAMPLING: draw the largest corpus subset that
    * exactly hits a target language mixture (the "data mixing" step every
    * pretraining pipeline runs — weights per domain/language, then a
    * deterministic sample honoring them). Integer arithmetic end to end:
    * feasible total T = min over languages of (count·100 div weight),
    * per-language quota q = (T·weight) div 100, and the q kept documents
    * are the FIRST q in the (md5(doc_id), doc_id) order — content-free,
    * reproducible, engine-portable (the q97 hash-order lesson).
    *
    * Scale design — exact top-q per stratum WITHOUT sorting a stratum:
    * a `row_number() over (partition by lang)` would put each language's
    * entire corpus slice in one task (languages are few and huge — the
    * one window shape that cannot scale). Instead the md5 order is split
    * by its own 16-bit prefix into 65 536 buckets: per-(lang, bucket)
    * counts (a small aggregate) give running totals, every bucket
    * strictly below the quota crossing is kept whole with NO sort, and
    * only the single crossing bucket — 1/65536th of the stratum — is
    * rank-filtered. Bucket-prefix order equals md5 order (hex sorts
    * lexicographically = numerically), so the result is bit-identical to
    * the naive global-rank form the oracle runs. */
  val MixtureWeights: Seq[(String, Int)] =
    Seq("en" -> 30, "de" -> 20, "fr" -> 20, "es" -> 15, "zh" -> 15)

  val mixtureSample: (SparkSession, String) => DataFrame = (s, dir) =>
    mixtureSampleOn(docs(s, dir), MixtureWeights)

  /** [[mixtureSample]] over any (doc_id, lang) DataFrame and weight set —
    * split out so specs can property-test arbitrary mixtures. */
  private[graft] def mixtureSampleOn(d: DataFrame,
      weights: Seq[(String, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = d.sparkSession
    val w = s.createDataFrame(weights).toDF("lang", "wt")
    // quotas: a weighted language with zero documents caps T at 0 (an
    // unreachable mixture yields the empty sample, loudly, not a skewed one)
    val counts = w.join(d.groupBy(col("lang")).agg(count(lit(1)).as("n")),
        Seq("lang"), "left")
      .select(col("lang"), col("wt"), coalesce(col("n"), lit(0L)).as("n"))
    // feasible total as a window-min over the LANGUAGE table (|langs|
    // rows — metadata scale), not a scalar cross join: keeps the plan
    // audit's no-nested-loop-join invariant intact for free
    val quota = counts
      .withColumn("t", min(expr("n * 100 div wt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("lang"), expr("(t * wt) div 100").as("q"))
    val bucketed = d
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", conv(substring(col("h"), 1, 4), 16, 10).cast("long"))
    val stats = bucketed.groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", coalesce(
        sum(col("cnt")).over(Window.partitionBy(col("lang")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(quota, "lang") // both sides tiny: <= 65536 buckets x langs
    val fullBuckets = stats
      .filter(col("cum_before") + col("cnt") <= col("q"))
      .select(col("lang"), col("bucket"))
    val crossingBuckets = stats
      .filter(col("cum_before") < col("q") && col("cum_before") + col("cnt") > col("q"))
      .select(col("lang"), col("bucket"), (col("q") - col("cum_before")).as("k"))
    val keptWhole = bucketed.join(broadcast(fullBuckets), Seq("lang", "bucket"))
      .select(col("doc_id"), col("lang"))
    val keptRanked = bucketed.join(broadcast(crossingBuckets), Seq("lang", "bucket"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang"), col("bucket")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rnk") <= col("k"))
      .select(col("doc_id"), col("lang"))
    keptWhole.unionAll(keptRanked)
  }

  /** q101 — PII REDACTION: scrub emails and phone numbers, reporting
    * per-document match counts plus the redacted text's fingerprint (the
    * verifiable evidence a compliance pass wants). The synthetic corpus
    * contains no organic PII, so deterministic PII is PLANTED first —
    * built by concat from doc_id, identically in both engines, the
    * q91/q92 planted-fixture pattern — and the oracle re-runs the whole
    * plant+redact chain from scratch. Regexes avoid lookahead and \p
    * classes so Java regex and DuckDB's RE2 agree; map-only at any
    * corpus size. */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRegex = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]+"

  val piiRedaction: (SparkSession, String) => DataFrame = (s, dir) => {
    val planted = docs(s, dir).withColumn("txt", concat(
      col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call +1-555-"), (col("doc_id") % 10000).cast("string")))
        .otherwise(lit(""))))
    val redacted = regexp_replace(
      regexp_replace(col("txt"), lit(EmailRegex), lit("<EMAIL>")),
      lit(PhoneRegex), lit("<PHONE>"))
    planted.select(
      col("doc_id"),
      regexp_count(col("txt"), lit(EmailRegex)).cast("long").as("n_emails"),
      regexp_count(col("txt"), lit(PhoneRegex)).cast("long").as("n_phones"),
      length(redacted).cast("long").as("n_chars_redacted"),
      md5(redacted).as("redacted_md5"))
  }

  /** q102 — SEQUENCE-PACKING PLANNER: assign every document a global
    * token offset in doc_id order and derive its training-context bin
    * (fixed 2048-token windows) — the packing manifest a training job
    * consumes (documents may straddle bins; the offset says where each
    * starts, bin_offset where inside the window).
    *
    * A global running sum is the textbook non-scalable window (ORDER BY
    * with no partition = all rows in one task), so it is computed as the
    * classic TWO-PHASE DISTRIBUTED PREFIX SUM instead: per-4096-doc-chunk
    * token sums (one small aggregate), a prefix over the tiny chunk table
    * giving each chunk its base offset, then a per-chunk window — bounded
    * partitions, full parallelism. Beyond ~10^9 chunks the chunk table
    * recurses through the same two phases; one level covers 10^12 docs.
    * Bit-identical to the oracle's naive global window by associativity
    * of integer addition. */
  val PackBinTokens = 2048L
  val PackChunkDocs = 4096L

  /** q103 — the END-TO-END CURATION PIPELINE: exact dedup → train-split
    * gate → quality gate → per-(lang, source) corpus report, i.e. the
    * composition a real pretraining data build runs, as ONE declarative
    * plan. Survivor selection is a single window-min per token-set-key
    * group (the q36/q37 normalized key, which actually collides on this
    * corpus; one shuffle — not groupBy + semi-join back, which is two); the
    * split and quality gates are pure map predicates over exact-integer
    * metrics (engine-deterministic, q40's parity rules); the rollup is
    * one small two-key aggregate. Thresholds chosen to BITE on this
    * corpus (each gate drops documents) so the oracle check exercises
    * every stage. */
  val CurationMinTokens = 20L
  val CurationMinDistinctRatio = 0.3
  val CurationMaxStopwordRatio = 0.2

  /** The doc-level survivor set behind q103 (and the rows the curated
    * LAKE table materializes — q109): one row per document that passes
    * dedup, the train-split gate and the quality gates. */
  def curationSurvivors(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = TextSig.tokens(col("text"))
    docs(s, dir)
      .withColumn("keeper",
        min(col("doc_id")).over(Window.partitionBy(TextSig.tokenSetKey(col("text")))))
      .filter(col("doc_id") === col("keeper"))
      .filter(splitBucket < 80)
      .withColumn("n_tokens", size(tok).cast("long"))
      .withColumn("n_distinct", size(array_distinct(tok)).cast("long"))
      .withColumn("n_stop",
        size(filter(tok, w => w.isin(Stopwords: _*))).cast("long"))
      .filter(col("n_tokens") >= CurationMinTokens &&
        col("n_distinct").cast("double") / col("n_tokens") > CurationMinDistinctRatio &&
        col("n_stop").cast("double") / col("n_tokens") < CurationMaxStopwordRatio)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
  }

  val curationPipeline: (SparkSession, String) => DataFrame = (s, dir) =>
    curationSurvivors(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))

  /** q104 — INTRA-DOCUMENT REPETITION SCORING (the Gopher-style
    * repetition filters): top-bigram share, duplicate-bigram fraction
    * and top-token share per document. MAP-ONLY: multiplicities come
    * from one `aggregate` run-length pass over the SORTED token/bigram
    * arrays (max run in a sorted array = max multiplicity), so no
    * (doc, n-gram) shuffle exists at any corpus size — the oracle
    * computes the same numbers the relational way (unnest → two-key
    * groupBy → max). */
  private def bigramsOf(tok: Column): Column =
    when(size(tok) >= 2,
      transform(sequence(lit(1), size(tok) - 1), i =>
        concat(element_at(tok, i), lit("_"), element_at(tok, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Max element multiplicity of a string array: the NATIVE one-pass
    * hash kernel ([[graft.plans.MaxRun]]) when the session has
    * GraftExtensions; the sorted-run-length HOF below otherwise —
    * bit-identical by construction and spec (TextOpsSpec). The cast
    * makes both forms see array<string> regardless of input element
    * type (the [[graft.functions.TextSig.simhash]] pattern). */
  private[operators] def maxMultiplicity(arr: Column): Column = {
    val a = arr.cast("array<string>")
    graft.plans.GraftExtensions.nativeCall(
      graft.plans.GraftExtensions.MaxRunName, a)(maxMultiplicityHof(a))
  }

  /** The pure-functions fallback and bit-parity baseline: max run over
    * the sorted array = max multiplicity (nulls sort together, so a null
    * group counts like any other). */
  private[operators] def maxMultiplicityHof(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") <=> x, acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  val repetitionScores: (SparkSession, String) => DataFrame = (s, dir) =>
    // fanOut: map-only query whose per-row work (bigram build + two
    // multiplicity kernels) dominates — spreading the unsplittable
    // single-row-group scan over every core measured 0.285→0.197 s
    // (guide §2.5 input skew; no downstream shuffle to pay twice)
    Tables.fanOut(docs(s, dir).select(col("doc_id"), col("text")))
      .withColumn("tok", TextSig.tokens(col("text")))
      .filter(size(col("tok")) >= 2)
      .withColumn("bgs", bigramsOf(col("tok")))
      .select(
        col("doc_id"),
        size(col("bgs")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bgs"))).cast("long").as("n_distinct_bigrams"),
        maxMultiplicity(col("bgs")).as("max_bigram_count"),
        maxMultiplicity(col("tok")).as("max_token_count"),
        col("tok"))
      .select(
        col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
        col("max_bigram_count"),
        (col("max_bigram_count").cast("double") / col("n_bigrams"))
          .as("top_bigram_share"),
        (lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"))
          .as("dup_bigram_ratio"),
        col("max_token_count"),
        (col("max_token_count").cast("double") / size(col("tok")))
          .as("top_token_share"))

  /** q105 — TF-IDF TOP TERMS per document (keyword extraction): term
    * frequency × inverse document frequency, top 3 terms per doc. The
    * IDF is the RATIONAL inverse frequency N/df, not log(N/df):
    * transcendental functions are not bit-stable across engines (libm vs
    * DuckDB's implementation can differ in the last ulp, breaking the
    * hash compare), while tf·N/df is one double division of exact
    * integers — and the log is monotone in it, so the top-k selection is
    * identical either way. Ties break on the token for determinism.
    *
    * Scale: df is the q42-shaped vocabulary aggregate (map-side combine,
    * shuffle O(vocab)); the per-doc tf join is co-partitioned on token;
    * the top-k window partitions BY DOCUMENT — bounded partitions at any
    * corpus size (a document has finitely many distinct terms). */
  val TfidfTopK = 3

  val tfidfTopTerms: (SparkSession, String) => DataFrame = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val n = d.count() // one metadata-cheap count; the corpus-size scalar
    val tf = d
      .select(col("doc_id"), explode(TextSig.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, "token")
      .withColumn("weight",
        (col("tf") * lit(n)).cast("double") / col("df"))
      .withColumn("term_rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("weight").desc, col("token"))))
      .filter(col("term_rank") <= TfidfTopK)
      .select(col("doc_id"), col("term_rank").cast("long").as("term_rank"),
        col("token"), col("tf"), col("df"), col("weight"))
  }

  /** q107 — EXACT DUPLICATED-SPAN DETECTION, the substring-level sibling
    * of document dedup (public literature: Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022 — verbatim
    * repeated spans hurt models even when the DOCUMENTS differ): every
    * 8-token sliding window is fingerprinted and windows occurring more
    * than once corpus-wide are reported with occurrence/document counts.
    * The window fingerprints are md5 (engine-portable), computed inside
    * the explode so the aggregate's grouping key is a fixed 32-char hash
    * rather than an unbounded span string. Shuffle is O(corpus windows)
    * — the distributed standard for this step (full suffix automata
    * don't shard; fixed-width window hashing is what scales). */
  val SpanWindow = 8

  /** Window fingerprints: the NATIVE one-pass digest kernel
    * ([[graft.plans.SpanHashes]]) when the session has GraftExtensions;
    * the HOF composition below otherwise — bit-identical by construction
    * and spec. */
  private[operators] def spanHashes(tok: Column, w: Int): Column = {
    val t = tok.cast("array<string>")
    graft.plans.GraftExtensions.nativeCall(
      graft.plans.GraftExtensions.SpanHashesName, t, lit(w))(spanHashesHof(t, w))
  }

  /** The pure-functions fallback and bit-parity baseline. Guards mirror
    * the kernel exactly: w <= 0 or < w tokens → empty array (the bare
    * sequence would count DOWN and emit garbage windows, and a
    * non-positive slice length throws); null array → null
    * (otherwise-less CASE). */
  private[operators] def spanHashesHof(tok: Column, w: Int): Column =
    if (w <= 0) when(tok.isNotNull, array().cast("array<string>"))
    else when(size(tok) >= w,
      transform(sequence(lit(1), size(tok) - (w - 1)),
        i => md5(array_join(slice(tok, i, lit(w)), " "))))
      .when(tok.isNotNull, array().cast("array<string>"))

  val duplicateSpans: (SparkSession, String) => DataFrame = (s, dir) =>
    // fanOut (r22): the per-row work here is ~n_tokens-7 md5 digests per
    // document (~460k at sf0.1), all serialized on the unsplittable
    // single-row-group scan task — QueryProbe measured the map stage as
    // the query's dominant term. Spreading the (doc_id, text) projection
    // first runs the span hashing on every core (the q104 precedent:
    // md5-heavy map work wins from fanOut even though this query, unlike
    // q104, shuffles afterwards — the shuffle carries fixed 32-char
    // hashes either way; A/B-measured, see OPTIMIZATION_r22.md).
    Tables.fanOut(docs(s, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextSig.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= SpanWindow)
      .select(col("doc_id"),
        explode(spanHashes(col("tok"), SpanWindow)).as("span_hash"))
      .groupBy(col("span_hash"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_occurrences") > 1)

  val sequencePacking: (SparkSession, String) => DataFrame = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val t = docs(s, dir).select(
      col("doc_id"),
      size(TextSig.tokens(col("text"))).cast("long").as("n_tokens"),
      expr(s"doc_id div $PackChunkDocs").as("chunk"))
    val chunkBase = t.groupBy(col("chunk")).agg(sum(col("n_tokens")).as("csum"))
      .withColumn("base", coalesce(
        sum(col("csum")).over(Window.orderBy(col("chunk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("chunk"), col("base"))
    t.join(broadcast(chunkBase), "chunk")
      .withColumn("intra", coalesce(
        sum(col("n_tokens")).over(Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tok_offset", col("base") + col("intra"))
      .select(
        col("doc_id"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $PackBinTokens").as("bin"),
        pmod(col("tok_offset"), lit(PackBinTokens)).as("bin_offset"))
  }

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q40_doc_quality", docQuality, bench = true, oracle = Some(
      """SELECT doc_id, lang, n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS distinct_ratio,
        |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_token_len,
        |  CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stopword_ratio
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q41_corpus_quality_by_lang", corpusQualityByLang, oracle = Some(
      """WITH m AS (
        |  SELECT lang, n_chars,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','of','to','and','in','is','it'))) AS n_stop
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
        |  CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
        |  CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tokens) AS stopword_ratio
        |FROM m GROUP BY lang ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q42_token_frequencies", tokenFrequencies, oracle = Some(
      """SELECT token, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q43_fingerprints", fingerprints, oracle = Some(
      """SELECT doc_id, md5(text) AS fingerprint, substring(md5(text), 1, 4) AS shard
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q70_token_counts", tokenCounts, oracle = Some(
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS n_bpe_tokens,
        |  CAST(n_chars AS DOUBLE)
        |    / len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
        |    AS chars_per_bpe_token
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q97_dataset_split", splitAssign, oracle = Some(
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::UBIGINT % 100
        |      AS BIGINT) AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY ALL NULLS FIRST""".stripMargin)),
    // The oracle runs the NAIVE form (global per-language rank); the
    // Spark side's bucket-split selection is bit-identical by the
    // prefix-order argument in the scaladoc.
    NamedQuery("q100_mixture_sample", mixtureSample, oracle = Some(
      """WITH w(lang, wt) AS (VALUES ('en',30),('de',20),('fr',20),('es',15),('zh',15)),
        |c AS (
        |  SELECT w.lang, w.wt, COUNT(d.doc_id) AS n
        |  FROM w LEFT JOIN documents d ON d.lang = w.lang GROUP BY w.lang, w.wt
        |), tot AS (SELECT MIN(n * 100 // wt) AS t FROM c),
        |quota AS (SELECT lang, (t * wt) // 100 AS q FROM c, tot),
        |ranked AS (
        |  SELECT doc_id, lang, ROW_NUMBER() OVER (
        |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents
        |)
        |SELECT r.doc_id, r.lang FROM ranked r JOIN quota USING (lang)
        |WHERE r.rnk <= quota.q ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q101_pii_redaction", piiRedaction, oracle = Some(
      """WITH p AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ' call +1-555-' || CAST(doc_id % 10000 AS VARCHAR)
        |         ELSE '' END AS txt
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, txt,
        |    regexp_replace(
        |      regexp_replace(txt,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+[0-9]{1,3}-[0-9]{3}-[0-9]+', '<PHONE>', 'g') AS red
        |  FROM p
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(txt,
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]+')) AS BIGINT) AS n_phones,
        |  CAST(length(red) AS BIGINT) AS n_chars_redacted,
        |  md5(red) AS redacted_md5
        |FROM r ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q103_curation_pipeline", curationPipeline, bench = true, oracle = Some(
      """WITH k AS (
        |  SELECT doc_id, lang, source, text,
        |    MIN(doc_id) OVER (PARTITION BY md5(array_to_string(
        |      list_sort(list_distinct(string_split(text, ' '))), ' '))) AS keeper,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::UBIGINT % 100
        |      AS BIGINT) AS bucket,
        |    string_split(text, ' ') AS tok
        |  FROM documents
        |), f AS (
        |  SELECT lang, source, CAST(len(tok) AS BIGINT) AS n_tokens
        |  FROM k
        |  WHERE doc_id = keeper AND bucket < 80
        |    AND len(tok) >= 20
        |    AND CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok) > 0.3
        |    AND CAST(len(list_filter(tok,
        |      w -> w IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE)
        |      / len(tok) < 0.2
        |)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM f GROUP BY lang, source ORDER BY ALL NULLS FIRST""".stripMargin)),
    // The oracle computes multiplicities relationally (unnest → two-key
    // group → max); the Spark side's sorted-run-length pass is map-only.
    NamedQuery("q104_repetition_scores", repetitionScores, bench = true, oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), b AS (
        |  SELECT doc_id, tok,
        |    [tok[i] || '_' || tok[i+1] FOR i IN range(1, len(tok))] AS bgs
        |  FROM t
        |), bm AS (
        |  SELECT doc_id, MAX(c) AS mxb FROM (
        |    SELECT doc_id, bg, COUNT(*) AS c
        |    FROM (SELECT doc_id, unnest(bgs) AS bg FROM b) GROUP BY doc_id, bg
        |  ) GROUP BY doc_id
        |), tm AS (
        |  SELECT doc_id, MAX(c) AS mxt FROM (
        |    SELECT doc_id, tk, COUNT(*) AS c
        |    FROM (SELECT doc_id, unnest(tok) AS tk FROM t) GROUP BY doc_id, tk
        |  ) GROUP BY doc_id
        |)
        |SELECT b.doc_id,
        |  CAST(len(bgs) AS BIGINT) AS n_bigrams,
        |  CAST(len(list_distinct(bgs)) AS BIGINT) AS n_distinct_bigrams,
        |  CAST(mxb AS BIGINT) AS max_bigram_count,
        |  CAST(mxb AS DOUBLE) / len(bgs) AS top_bigram_share,
        |  1.0 - CAST(len(list_distinct(bgs)) AS DOUBLE) / len(bgs) AS dup_bigram_ratio,
        |  CAST(mxt AS BIGINT) AS max_token_count,
        |  CAST(mxt AS DOUBLE) / len(tok) AS top_token_share
        |FROM b JOIN bm USING (doc_id) JOIN tm USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    // Rational IDF (N/df, no log) keeps the weight engine-deterministic;
    // the log form is monotone in it, so the top-k set is identical.
    NamedQuery("q105_tfidf_top_terms", tfidfTopTerms, oracle = Some(
      """WITH tf AS (
        |  SELECT doc_id, tok AS token, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok
        |), idf AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |w AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, idf.df,
        |    CAST(tf.tf * n.n AS DOUBLE) / idf.df AS weight
        |  FROM tf JOIN idf USING (token), n
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY weight DESC, token) AS term_rank
        |  FROM w
        |)
        |SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, token, tf, df, weight
        |FROM r WHERE term_rank <= 3 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q107_duplicate_spans", duplicateSpans, bench = true, oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8
        |), w AS (
        |  SELECT doc_id, md5(array_to_string(tok[i:i+7], ' ')) AS span_hash
        |  FROM t, LATERAL unnest(range(1, len(tok) - 6)) AS r(i)
        |)
        |SELECT span_hash, COUNT(*) AS n_occurrences,
        |  COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
        |FROM w GROUP BY span_hash HAVING COUNT(*) > 1
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    // Naive global-window oracle vs the two-phase distributed prefix sum.
    NamedQuery("q102_sequence_packing", sequencePacking, oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS tok_offset
        |  FROM t
        |)
        |SELECT doc_id, n_tokens, tok_offset,
        |  tok_offset // 2048 AS bin, tok_offset % 2048 AS bin_offset
        |FROM o ORDER BY ALL NULLS FIRST""".stripMargin)),
  )
}

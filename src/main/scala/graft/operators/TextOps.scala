package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.{LangId, TextSig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` fixture (driver brief:
  * quality scoring, token counting, fingerprinting, language-ID).
  *
  * All per-document metrics are single-pass array expressions producing
  * exact integers; every ratio is one double division of exact ints, so
  * the outputs are engine-deterministic and DuckDB-oracle-checked
  * (q40–q42). Language-ID is a heuristic (no ground truth recoverable
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
  val splitAssign: (SparkSession, String) => DataFrame = (s, dir) => {
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 9, 8), 16, 10).cast("long"),
      lit(100L))
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
  )
}

package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps._
import graft.operators.Dedup

/** Text-analysis + deduplication surface over the `documents` table
  * (the LLM-data-pipeline extension, SURVEY §7.2 slice 5).
  */
object DocumentQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  val stopwords: Seq[String] = Seq("the", "a")

  // ---------------------------------------------------------------- q17
  /** Exact dedup: one hash-aggregate on a content fingerprint. */
  def q17DedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(spark, dir))

  // ---------------------------------------------------------------- q18
  /** Corpus token statistics per language (token counting over the
    * whitespace + regex tokenizers). */
  def q18TokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"lang", tokenCount($"text").as("n_tok"),
        regexTokenCount($"text").as("n_rtok"), length($"text").as("n_char"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").cast("long").as("total_tokens"),
        sum($"n_rtok").cast("long").as("total_regex_tokens"),
        round(avg($"n_tok"), 4).as("avg_tokens"),
        round(avg($"n_char"), 4).as("avg_chars"))
  }

  // ---------------------------------------------------------------- q19
  /** Per-document quality scoring + heuristic language ID: stopword
    * ratio, repetition (unique ratio), mean word length, length prior —
    * all per-row expression work, no shuffle. */
  def q19TextQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") > 0)
    d.select(
      $"doc_id",
      size($"toks").as("token_count"),
      round(stopwordCount($"toks", stopwords).cast("double") / size($"toks"), 4)
        .as("stopword_ratio"),
      round(uniqueRatio($"toks"), 4).as("unique_ratio"),
      round(meanWordLen($"toks"), 4).as("mean_word_len"),
      round(
        ((lit(1.0) - stopwordCount($"toks", stopwords).cast("double") / size($"toks"))
          + uniqueRatio($"toks")
          + least(size($"toks").cast("double") / 50.0, lit(1.0))) / 3.0, 4)
        .as("quality_score"),
      when(stopwordCount($"toks", stopwords).cast("double") / size($"toks") > 0.08, "en")
        .otherwise("other").as("lang_guess"))
  }

  // ---------------------------------------------------------------- q20
  /** Exact 5-gram Jaccard near-dup pairs via the inverted shingle
    * index (threshold 0.4). */
  def q20NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(spark, dir), k = 5, threshold = 0.4)

  // ---------------------------------------------------------------- q21
  /** MinHash(32)+LSH(8 bands) candidates verified to jaccard ≥ 0.4.
    * Not SQL-expressible → rows-only driver check; equivalence to q20 on
    * high-sim pairs is asserted in DedupSpec. */
  def q21MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docs(spark, dir), k = 5, numHashes = 32, bands = 8,
      threshold = 0.4)

  // ---------------------------------------------------------------- q22
  /** SimHash near-dup pairs (Hamming ≤ 7 on 64-bit fingerprints, exact
    * recall via the 8-band pigeonhole). Rows-only driver check; the
    * banding contract is asserted in DedupSpec. */
  def q22Simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashDup(docs(spark, dir), maxHamming = 7)

  // ================================================================ maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_dedup_exact" -> (q17DedupExact _),
    "q18_token_stats" -> (q18TokenStats _),
    "q19_text_quality" -> (q19TextQuality _),
    "q20_ngram_jaccard" -> (q20NgramJaccard _),
    "q21_minhash_lsh" -> (q21MinhashLsh _),
    "q22_simhash" -> (q22Simhash _))

  val oracle: Map[String, String] = Map(
    "q17_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_copies,
         min(doc_id) AS keep_id
         FROM documents GROUP BY md5(text)""",
    "q18_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
         CAST(sum(len(regexp_extract_all(text,'[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
           AS total_regex_tokens,
         round(avg(len(string_split(text,' '))),4) AS avg_tokens,
         round(avg(length(text)),4) AS avg_chars
         FROM documents GROUP BY lang""",
    "q19_text_quality" ->
      """WITH t AS (
           SELECT doc_id, string_split(text,' ') AS w, length(text) AS n_char
           FROM documents),
         m AS (
           SELECT doc_id,
             len(w) AS token_count,
             CAST(len(list_filter(w, x -> x IN ('the','a'))) AS DOUBLE) / len(w) AS sr,
             CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ur,
             CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mwl
           FROM t WHERE len(w) > 0)
         SELECT doc_id, token_count,
           round(sr,4) AS stopword_ratio,
           round(ur,4) AS unique_ratio,
           round(mwl,4) AS mean_word_len,
           round(((1.0 - sr) + ur + least(CAST(token_count AS DOUBLE)/50.0, 1.0))/3.0, 4)
             AS quality_score,
           CASE WHEN sr > 0.08 THEN 'en' ELSE 'other' END AS lang_guess
         FROM m""",
    "q20_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text,' ') AS w FROM documents),
         idx AS (
           SELECT doc_id, w, unnest(generate_series(1, len(w)-4)) AS i
           FROM toks WHERE len(w) >= 5),
         sh AS (
           SELECT DISTINCT doc_id,
             w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
           FROM idx),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         common AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE)/(sa.n + sb.n - c), 4) AS jaccard
         FROM common
         JOIN sizes sa ON doc_a = sa.doc_id
         JOIN sizes sb ON doc_b = sb.doc_id
         WHERE CAST(c AS DOUBLE)/(sa.n + sb.n - c) >= 0.4""")
}

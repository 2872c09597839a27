package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** Text-analysis operators for training-data pipelines: language ID
  * (lexicon-overlap heuristic), quality scoring (length/stopword/token
  * shape ratios), token counting (whitespace + regex), and document
  * fingerprinting (rolling polynomial hash).
  *
  * All scores are int/int double divisions or exact integer arithmetic —
  * bit-identical across Spark and DuckDB.
  */
object TextAnalysis {

  /** tiny per-language lexicons for the n-gram/stopword heuristic. The
    * corpus vocabulary is synthetic, so real stopwords appear only for
    * 'en'; other languages fall back to 'und' below the threshold —
    * which is the honest behavior of a lexicon scorer on this data. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "des", "et"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** t01: predicted language = arg-max lexicon-hit ratio (ties broken by
    * language code; below 5% -> 'und'). */
  def t01(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(col("doc_id"),
      explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tok"),
        Lexicons.map { case (lang, words) =>
          sum(when(col("w").isin(words: _*), 1L).otherwise(0L)).as(s"hits_$lang")
        }: _*)
    val scored = Lexicons.foldLeft(toks) { case (df, (lang, _)) =>
      df.withColumn(s"score_$lang",
        col(s"hits_$lang").cast(DoubleType) / col("n_tok").cast(DoubleType))
    }
    val best = Lexicons.map { case (lang, _) =>
      struct(col(s"score_$lang").as("score"), lit(lang).as("lang"))
    }
    scored
      .withColumn("best", sort_array(array(best: _*), asc = false).getItem(0))
      .select(col("doc_id"),
        when(col("best.score") >= 0.05, col("best.lang")).otherwise(lit("und")).as("pred_lang"),
        col("best.score").as("lang_score"))
      .orderBy("doc_id")
  }

  val t01Sql: String = {
    val hitCols = Lexicons.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      s"SUM(CASE WHEN w IN ($set) THEN 1 ELSE 0 END) AS hits_$lang"
    }.mkString(",\n    ")
    val structs = Lexicons.map { case (lang, _) =>
      s"{'score': CAST(hits_$lang AS DOUBLE)/CAST(n_tok AS DOUBLE), 'lang': '$lang'}"
    }.mkString(", ")
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_tok,
      |    $hitCols
      |  FROM toks GROUP BY doc_id),
      |best AS (
      |  SELECT doc_id,
      |    list_reverse_sort([$structs])[1] AS b
      |  FROM agg)
      |SELECT doc_id,
      |  CASE WHEN b.score >= 0.05 THEN b.lang ELSE 'und' END AS pred_lang,
      |  b.score AS lang_score
      |FROM best ORDER BY doc_id""".stripMargin
  }

  /** t02: quality scoring — length, token stats, stopword ratio, digit
    * ratio; composite score as exact ratio arithmetic. */
  def t02(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to")
    documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("n_uniq", size(array_distinct(col("toks"))).cast(LongType))
      .withColumn("n_stop", size(filter(col("toks"), t => t.isin(stop: _*))).cast(LongType))
      .withColumn("n_digit_tok",
        size(filter(col("toks"), t => t.rlike("^[0-9]+$"))).cast(LongType))
      .withColumn("len_chars", length(col("text")).cast(LongType))
      .withColumn("stop_ratio", col("n_stop").cast(DoubleType) / col("n_tok").cast(DoubleType))
      .withColumn("uniq_ratio", col("n_uniq").cast(DoubleType) / col("n_tok").cast(DoubleType))
      .withColumn("avg_tok_len",
        (col("len_chars") - (col("n_tok") - 1)).cast(DoubleType) / col("n_tok").cast(DoubleType))
      .withColumn("quality_ok",
        col("n_tok") >= 15 && col("uniq_ratio") >= 0.3 && col("n_digit_tok") === 0)
      .select(col("doc_id"), col("n_tok"), col("n_uniq"), col("n_stop"),
        col("len_chars"), col("stop_ratio"), col("uniq_ratio"),
        col("avg_tok_len"), col("quality_ok"))
      .orderBy("doc_id")
  }

  val t02Sql: String =
    """SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tok,
      |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
      |  CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to'))) AS BIGINT) AS n_stop,
      |  CAST(length(text) AS BIGINT) AS len_chars,
      |  CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to'))) AS DOUBLE)
      |    / CAST(len(toks) AS DOUBLE) AS stop_ratio,
      |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
      |  CAST(length(text) - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_tok_len,
      |  (len(toks) >= 15
      |    AND CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) >= 0.3
      |    AND len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$'))) = 0) AS quality_ok
      |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** t03: token counting — whitespace split, BPE-ish regex pieces,
    * distinct tokens, per-source totals. */
  def t03(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("n_ws_tok", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_re_tok", regexp_count(col("text"), lit("[a-z]+|[0-9]+")).cast(LongType))
      .withColumn("n_uniq_tok", size(array_distinct(split(col("text"), " "))).cast(LongType))
      .groupBy("source")
      .agg(big(count(lit(1))).as("n_docs"),
        big(sum(col("n_ws_tok"))).as("total_ws_tokens"),
        big(sum(col("n_re_tok"))).as("total_re_tokens"),
        big(sum(col("n_uniq_tok"))).as("total_uniq_tokens"))
      .orderBy("source")

  val t03Sql: String =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS total_re_tokens,
      |  CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS total_uniq_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** t04: rolling polynomial fingerprint (h = h*31 + code mod 1e9+7)
    * over the raw characters — byte-identical across engines. */
  def t04(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("fingerprint",
        expr("aggregate(transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)"))
      .groupBy("fingerprint")
      .agg(big(count(lit(1))).as("n_docs"), big(min(col("doc_id"))).as("min_doc_id"))
      .orderBy("min_doc_id")
      .limit(100)

  val t04Sql: String =
    """SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
      |FROM (SELECT doc_id,
      |        list_reduce(
      |          list_prepend(CAST(0 AS BIGINT),
      |            list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |          (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      |      FROM documents)
      |GROUP BY fingerprint ORDER BY min_doc_id LIMIT 100""".stripMargin

  /** t05: corpus token-length histogram — the length-distribution
    * profile every curation run reports (sequence-length planning,
    * truncation-rate estimates). Bucketed (10-token bins) so the whole
    * profile is one partial-agg-friendly groupBy. */
  def t05(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast(LongType))
      .withColumn("bucket_start", (col("n_tok") - pmod(col("n_tok"), lit(10L))))
      .groupBy("bucket_start")
      .agg(
        big(count(lit(1))).as("n_docs"),
        big(sum(col("n_tok"))).as("sum_tokens"),
        big(min(col("n_tok"))).as("min_tokens"),
        big(max(col("n_tok"))).as("max_tokens"))
      .orderBy("bucket_start")

  val t05Sql: String =
    """SELECT bucket_start,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
      |  CAST(MIN(n_tok) AS BIGINT) AS min_tokens,
      |  CAST(MAX(n_tok) AS BIGINT) AS max_tokens
      |FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |        CAST(len(string_split(text, ' ')) AS BIGINT)
      |          - CAST(len(string_split(text, ' ')) AS BIGINT) % 10 AS bucket_start
      |      FROM documents)
      |GROUP BY bucket_start ORDER BY bucket_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_lang_id" -> t01 _,
    "t02_quality_score" -> t02 _,
    "t03_token_count" -> t03 _,
    "t04_fingerprint" -> t04 _,
    "t05_length_histogram" -> t05 _)

  val oracle: Map[String, String] = Map(
    "t01_lang_id" -> t01Sql,
    "t02_quality_score" -> t02Sql,
    "t03_token_count" -> t03Sql,
    "t04_fingerprint" -> t04Sql,
    "t05_length_histogram" -> t05Sql)
}

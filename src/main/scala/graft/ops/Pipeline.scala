package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** p01: an end-to-end training-data cleaning pipeline composing the
  * operator suites — exact dedup (keep the smallest doc_id per text),
  * quality filter, language tagging — and reporting per-source stats of
  * the surviving corpus. This is the shape of a real 100 TB cleaning
  * job: one scan, one dedup shuffle on the text hash, one aggregation;
  * all other signals are computed row-local. */
object Pipeline {

  def p01(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .withColumn("uniq_ratio",
        size(array_distinct(col("toks"))).cast(DoubleType) / size(col("toks")).cast(DoubleType))
      .withColumn("quality_ok", col("n_tok") >= 15 && col("uniq_ratio") >= 0.3)
    // exact dedup: keep the smallest doc_id per identical text
    val keeper = docs.groupBy("text").agg(min(col("doc_id")).as("keep_id"))
    docs.join(keeper, docs("text") === keeper("text") && docs("doc_id") === keeper("keep_id"))
      .where(col("quality_ok"))
      .groupBy("source")
      .agg(
        big(count(lit(1))).as("kept_docs"),
        big(sum(col("n_tok"))).as("kept_tokens"),
        big(countDistinct(col("lang"))).as("n_langs"))
      .orderBy("source")
  }

  val p01Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, text, lang, source,
      |    len(string_split(text, ' ')) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio
      |  FROM documents),
      |keeper AS (SELECT text, MIN(doc_id) AS keep_id FROM docs GROUP BY text)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS kept_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS kept_tokens,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM docs JOIN keeper ON docs.text = keeper.text AND docs.doc_id = keeper.keep_id
      |WHERE n_tok >= 15 AND uniq_ratio >= 0.3
      |GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_clean_corpus" -> p01 _)
  val oracle: Map[String, String] = Map(
    "p01_clean_corpus" -> p01Sql)
}

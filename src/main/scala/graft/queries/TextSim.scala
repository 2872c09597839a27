package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** Q23-Q26 (SURVEY.md §2b): exact dedup, tokenize/word-count, exact k-NN
  * cosine similarity, and pairwise Jaccard near-dup detection.
  *
  * Cross-engine exactness strategy:
  *  - cosine runs over 3-decimal-quantized integer embeddings
  *    (floor(x*1000)): dot products and norms are exact BIGINT sums, and
  *    the final double division/sqrt is IEEE-identical in Spark and
  *    DuckDB — no rounding tolerance needed;
  *  - Jaccard is an int/int double division (correctly rounded, identical
  *    bits in both engines).
  *
  * Scale notes: the pairwise ops join within a blocking key (`source`) so
  * the shuffle partitions by block, never materializing the full O(n^2)
  * cross product; the scalable unblocked path is MinHash-LSH (see
  * graft.ops.Dedup).
  */
object TextSim {

  /** Q23: exact duplicate groups by content-prefix key (hash groupBy —
    * the exact-dedup plan shape). The key is the first 40 chars rather
    * than the full text: this corpus has no full-text duplicates below
    * sf0.1, which made the full-text form pass vacuously in round 1;
    * prefix-keyed groups are non-empty at every SF while the plan
    * (shuffle on key hash, partial+final agg) is identical. */
  def q23(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(substring(col("text"), 1, 40).as("k"))
      .agg(big(min(col("doc_id"))).as("min_doc_id"),
        big(count(lit(1))).as("dup_cnt"))
      .where(col("dup_cnt") > 1)
      .select("min_doc_id", "dup_cnt")
      .orderBy("min_doc_id")

  val q23Sql: String =
    """SELECT CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
      |       CAST(COUNT(*) AS BIGINT) AS dup_cnt
      |FROM documents GROUP BY substring(text, 1, 40) HAVING COUNT(*) > 1
      |ORDER BY min_doc_id""".stripMargin

  /** Q24: tokenize + global top-20 word frequencies. */
  def q24(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(big(count(lit(1))).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)

  val q24Sql: String =
    """SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin

  /** Quantized integer embedding + its exact squared norm. Pinned
    * repartition: the source is one row group and the HOF math is
    * CPU-bound — unpinned it runs on one core. */
  private def quantized(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(
        col("vec_id"),
        transform(col("embedding"), x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("q"))
      .withColumn("norm2", aggregate(col("q"), lit(0L), (a, x) => a + x * x))

  /** Q25: exact k-NN — top-5 cosine neighbors for probe vectors id<10.
    * Probe side is tiny -> broadcast; the candidate scan streams once. */
  def q25(s: SparkSession, d: String): DataFrame = {
    val all = quantized(s, d)
    val probes = all.where(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "probe_id")
      .withColumnRenamed("q", "pq")
      .withColumnRenamed("norm2", "pnorm2")
    val pairs = all.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("dot", aggregate(zip_with(col("pq"), col("q"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
      .withColumn("sim", col("dot").cast(DoubleType) /
        sqrt(col("pnorm2").cast(DoubleType) * col("norm2").cast(DoubleType)))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("probe_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy("probe_id", "rank")
  }

  val q25Sql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_aggregate(list_transform(qv, x -> x*x), 'sum') AS BIGINT) AS norm2
      |  FROM q),
      |ex AS (
      |  SELECT vec_id, generate_subscripts(qv, 1) AS i, unnest(qv) AS v FROM n),
      |dots AS (
      |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, CAST(SUM(p.v * c.v) AS BIGINT) AS dot
      |  FROM ex p JOIN ex c ON p.i = c.i AND p.vec_id < 10 AND c.vec_id <> p.vec_id
      |  GROUP BY 1, 2),
      |sims AS (
      |  SELECT probe_id, cand_id,
      |    CAST(dot AS DOUBLE) / SQRT(CAST(np.norm2 AS DOUBLE) * CAST(nc.norm2 AS DOUBLE)) AS sim
      |  FROM dots JOIN n np ON np.vec_id = probe_id JOIN n nc ON nc.vec_id = cand_id),
      |ranked AS (
      |  SELECT probe_id, cand_id AS neighbor_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, cand_id) AS rank
      |  FROM sims)
      |SELECT probe_id, CAST(rank AS BIGINT) AS rank, neighbor_id, sim
      |FROM ranked WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin

  /** distinct tokens per doc, with the blocking key. */
  private def docTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(split(col("text"), " "))).as("w"))

  /** Q26: pairwise token-set Jaccard >= 0.5 within the same source.
    * Delegates to the shared salted blocked merge-intersect kernel
    * (graft.ops.Dedup.blockedJaccard): feature sets shuffled P times,
    * pair space of each source block fanned out over P(P+1)/2 tasks —
    * same exact int/int arithmetic, no single-task-per-block straggler. */
  def q26(s: SparkSession, d: String): DataFrame = {
    // pin parallelism BEFORE tokenization (one-row-group source would
    // otherwise run it as a single task), and hand the kernel its block
    // census from the raw table — the typed census path cannot prune
    // the tokenization out of a count (see d04)
    val feats = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("source"), col("doc_id"),
        array_distinct(split(col("text"), " ")).as("fs"))
    val census = documents(s, d).groupBy("source").count().toDF("bk", "bn")
    graft.ops.Dedup.blockedJaccardTyped(s, {
      import s.implicits._
      feats.as[(String, Long, Array[String])]
    }, 0.5, Some(census))
  }

  val q26Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents),
      |cnt AS (SELECT doc_id, COUNT(*) AS c FROM tok GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n
      |  FROM tok a JOIN tok b
      |    ON a.source = b.source AND a.w = b.w AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT i AS doc_a, j AS doc_b,
      |  CAST(n AS BIGINT) AS inter_cnt,
      |  CAST(ca.c + cb.c - n AS BIGINT) AS union_cnt,
      |  CAST(n AS DOUBLE) / CAST(ca.c + cb.c - n AS DOUBLE) AS jaccard
      |FROM inter JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
      |WHERE CAST(n AS DOUBLE) / CAST(ca.c + cb.c - n AS DOUBLE) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_exact_dedup" -> q23 _,
    "q24_word_count" -> q24 _,
    "q25_knn_cosine" -> q25 _,
    "q26_jaccard_neardup" -> q26 _)

  val oracle: Map[String, String] = Map(
    "q23_exact_dedup" -> q23Sql,
    "q24_word_count" -> q24Sql,
    "q25_knn_cosine" -> q25Sql,
    "q26_jaccard_neardup" -> q26Sql)
}

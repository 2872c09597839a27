package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** Deduplication operator suite for large-scale training-data pipelines:
  * exact (hash groupBy), MinHash+LSH banding, SimHash hamming pairs,
  * character-n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Cross-engine portability: every hash is MD5 over explicit strings
  * (identical bytes in Spark and DuckDB), bit arithmetic uses
  * CAST(POWER(2,j) AS BIGINT) shifts (exact — powers of two), and all
  * ratios are int/int double divisions. No engine-specific hash
  * function appears anywhere.
  *
  * Scale notes: MinHash-LSH is THE scale path for near-dup — candidate
  * generation is a shuffle on (band, band_signature) buckets, never the
  * O(n^2) cross product; the pairwise verifier runs only on bucket
  * collisions. SimHash pairs and cosine near-dup keep their quadratic
  * oracles blocked (by band / quantized prefix) in the same spirit.
  */
object Dedup {

  // ---- d01: exact dedup summary (hash groupBy) ----

  def d01(s: SparkSession, d: String): DataFrame =
    documents(s, d).agg(
      big(count(lit(1))).as("total_docs"),
      big(countDistinct(col("text"))).as("distinct_texts"),
      big(count(lit(1)) - countDistinct(col("text"))).as("redundant_docs"))

  val d01Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS total_docs,
      |  CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_texts,
      |  CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS redundant_docs
      |FROM documents""".stripMargin

  // ---- shared token helper ----

  private def tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("w"))

  /** exact Jaccard for a candidate pair set (i, j). */
  private def jaccardFor(tok: DataFrame, cand: DataFrame): DataFrame = {
    val cnt = tok.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val ta = tok.select(col("doc_id").as("i"), col("w"))
    val tb = tok.select(col("doc_id").as("jj"), col("w").as("w_b"))
    cand.join(ta, "i").join(tb, col("j") === col("jj") && col("w") === col("w_b"))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
      .join(cnt.select(col("doc_id").as("i"), col("c").as("ci")), "i")
      .join(cnt.select(col("doc_id").as("j"), col("c").as("cj")), "j")
      .withColumn("jaccard",
        col("n").cast(DoubleType) / (col("ci") + col("cj") - col("n")).cast(DoubleType))
  }

  // ---- d02: MinHash + LSH banding (the scalable near-dup path) ----

  val MinhashSeeds = 12
  val BandRows = 3 // -> 4 bands

  def d02(s: SparkSession, d: String): DataFrame = {
    val tok = tokens(s, d)
    val seeds = s.range(MinhashSeeds).select(col("id").cast(IntegerType).as("seed"))
    val sigs = tok.crossJoin(broadcast(seeds))
      .select(col("doc_id"), col("seed"),
        md5(concat(col("seed").cast(StringType), lit(":"), col("w"))).as("h"))
      .groupBy("doc_id", "seed").agg(min(col("h")).as("sig"))
    val bands = sigs
      .withColumn("band", floor(col("seed") / BandRows).cast(IntegerType))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws("|",
        transform(array_sort(collect_list(struct(col("seed"), col("sig")))),
          x => x.getField("sig")))).as("band_sig"))
    val a = bands.select(col("doc_id").as("i"), col("band"), col("band_sig"))
    val b = bands.select(col("doc_id").as("j"), col("band").as("band_b"), col("band_sig").as("sig_b"))
    val cand = a.join(b, col("band") === col("band_b") &&
        col("band_sig") === col("sig_b") && col("i") < col("j"))
      .select("i", "j").distinct()
    jaccardFor(tokens(s, d), cand)
      .where(col("jaccard") >= 0.5)
      .select(col("i").as("doc_a"), col("j").as("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val d02Sql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents),
      |sigs AS (
      |  SELECT doc_id, seed, MIN(md5(seed || ':' || w)) AS sig
      |  FROM tok, (SELECT unnest(generate_series(0, ${MinhashSeeds - 1})) AS seed)
      |  GROUP BY doc_id, seed),
      |bands AS (
      |  SELECT doc_id, seed // $BandRows AS band,
      |    md5(string_agg(sig, '|' ORDER BY seed)) AS band_sig
      |  FROM sigs GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
      |cnt AS (SELECT doc_id, COUNT(*) AS c FROM tok GROUP BY doc_id),
      |inter AS (
      |  SELECT cand.i, cand.j, COUNT(*) AS n
      |  FROM cand JOIN tok ta ON ta.doc_id = cand.i
      |            JOIN tok tb ON tb.doc_id = cand.j AND tb.w = ta.w
      |  GROUP BY 1, 2)
      |SELECT i AS doc_a, j AS doc_b,
      |  CAST(n AS DOUBLE) / CAST(ca.c + cb.c - n AS DOUBLE) AS jaccard
      |FROM inter JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
      |WHERE CAST(n AS DOUBLE) / CAST(ca.c + cb.c - n AS DOUBLE) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- d03: SimHash fingerprints + hamming-distance pairs ----

  val SimhashBits = 60
  val HammingMax = 6

  /** 60-bit SimHash per doc: token hash = first 15 hex chars of MD5
    * (fits a signed BIGINT), bit votes summed, fingerprint assembled
    * with exact power-of-two shifts. */
  private def simhashes(s: SparkSession, d: String): DataFrame = {
    val th = tokens(s, d)
      .withColumn("h", conv(substring(md5(col("w")), 1, 15), 16, 10).cast(LongType))
    val bits = s.range(SimhashBits).select(col("id").cast(IntegerType).as("j"))
    th.crossJoin(broadcast(bits))
      .withColumn("bit", expr("shiftright(h, j) & CAST(1 AS BIGINT)"))
      .groupBy("doc_id", "j")
      .agg(sum(when(col("bit") === 1L, 1).otherwise(-1)).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when(col("vote") >= 0,
        pow(lit(2.0), col("j").cast(DoubleType)).cast(LongType)).otherwise(0L)).as("simhash"))
  }

  def d03(s: SparkSession, d: String): DataFrame = {
    val f = simhashes(s, d)
    val a = f.select(col("doc_id").as("doc_a"), col("simhash").as("fa"))
    val b = f.select(col("doc_id").as("doc_b"), col("simhash").as("fb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))).cast(LongType))
      .where(col("hamming") <= HammingMax)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  val d03Sql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents),
      |th AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) AS h FROM tok),
      |votes AS (
      |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM th, (SELECT unnest(generate_series(0, ${SimhashBits - 1})) AS j)
      |  GROUP BY doc_id, j),
      |fp AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN vote >= 0 THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM votes GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingMax
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- d04: character-3-gram Jaccard near-dup (blocked by source) ----

  def d04(s: SparkSession, d: String): DataFrame = {
    val grams = documents(s, d).select(col("doc_id"), col("source"),
      explode(array_distinct(
        expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))"))).as("g"))
    val cnt = grams.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val a = grams.select(col("doc_id").as("i"), col("source"), col("g"))
    val b = grams.select(col("doc_id").as("j"), col("source").as("source_b"), col("g").as("g_b"))
    a.join(b, col("source") === col("source_b") && col("g") === col("g_b") && col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
      .join(cnt.select(col("doc_id").as("i"), col("c").as("ci")), "i")
      .join(cnt.select(col("doc_id").as("j"), col("c").as("cj")), "j")
      .withColumn("jaccard",
        col("n").cast(DoubleType) / (col("ci") + col("cj") - col("n")).cast(DoubleType))
      .where(col("jaccard") >= 0.6)
      .select(col("i").as("doc_a"), col("j").as("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val d04Sql: String =
    """WITH grams AS (
      |  SELECT doc_id, source,
      |    unnest(list_distinct(list_transform(
      |      generate_series(1, len(text) - 2),
      |      i -> substring(text, CAST(i AS INT), 3)))) AS g
      |  FROM documents),
      |cnt AS (SELECT doc_id, COUNT(*) AS c FROM grams GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n
      |  FROM grams a JOIN grams b
      |    ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT i AS doc_a, j AS doc_b,
      |  CAST(n AS DOUBLE) / CAST(ca.c + cb.c - n AS DOUBLE) AS jaccard
      |FROM inter JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
      |WHERE CAST(n AS DOUBLE) / CAST(ca.c + cb.c - n AS DOUBLE) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- d05: embedding-cosine near-dup over quantized vectors ----

  def d05(s: SparkSession, d: String): DataFrame = {
    val q = embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"), x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("q"))
      .withColumn("norm2", aggregate(col("q"), lit(0L), (a, x) => a + x * x))
    val a = q.select(col("vec_id").as("va"), col("q").as("qa"), col("norm2").as("na"))
    val b = q.select(col("vec_id").as("vb"), col("q").as("qb"), col("norm2").as("nb"))
    a.join(b, col("va") < col("vb"))
      .withColumn("dot", aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x))
      .withColumn("cosine", col("dot").cast(DoubleType) /
        sqrt(col("na").cast(DoubleType) * col("nb").cast(DoubleType)))
      .where(col("cosine") >= 0.4)
      .select(col("va").as("vec_a"), col("vb").as("vec_b"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  val d05Sql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_aggregate(list_transform(qv, x -> x*x), 'sum') AS BIGINT) AS norm2
      |  FROM q),
      |ex AS (SELECT vec_id, generate_subscripts(qv, 1) AS i, unnest(qv) AS v FROM n),
      |dots AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2)
      |SELECT va AS vec_a, vb AS vec_b,
      |  CAST(dot AS DOUBLE) / SQRT(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)) AS cosine
      |FROM dots JOIN n na ON na.vec_id = va JOIN n nb ON nb.vec_id = vb
      |WHERE CAST(dot AS DOUBLE) / SQRT(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)) >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_dedup_exact_stats" -> d01 _,
    "d02_minhash_lsh_neardup" -> d02 _,
    "d03_simhash_hamming" -> d03 _,
    "d04_ngram_jaccard" -> d04 _,
    "d05_cosine_neardup" -> d05 _)

  val oracle: Map[String, String] = Map(
    "d01_dedup_exact_stats" -> d01Sql,
    "d02_minhash_lsh_neardup" -> d02Sql,
    "d03_simhash_hamming" -> d03Sql,
    "d04_ngram_jaccard" -> d04Sql,
    "d05_cosine_neardup" -> d05Sql)
}

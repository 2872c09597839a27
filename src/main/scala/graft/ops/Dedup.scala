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

  // ---- d02: MinHash + LSH banding (the scalable near-dup path) ----

  val MinhashSeeds = 12
  val BandRows = 3 // -> 4 bands

  /** d02 computes tokens, signatures and band hashes per document in a
    * single partition-local pass (no exploded token shuffle at all);
    * only the tiny (doc, band, band_sig) table and the candidate pairs
    * ever shuffle. The typed MinHashAggregator (graft.functions) is the
    * API-surface equivalent for ad-hoc Dataset use; this kernel is the
    * plan-shape a 100 TB run wants: O(docs) shuffle bytes, candidates
    * via bucket join, exact verify only on collisions. */
  def d02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val numBands = MinhashSeeds / BandRows
    // (doc_id, sorted distinct tokens, band signatures) in one pass;
    // repartition: the source parquet is a single row group, and the
    // MD5 work is CPU-bound — spread it over all cores. persist(): the
    // pass feeds bands AND the verify join; without it the lineage
    // recomputes the signatures once per consumer.
    val docBands = documents(s, d).select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = {
          val sb = new StringBuilder(32)
          b.foreach(x => sb.append(f"${x & 0xff}%02x")); sb.toString
        }
        it.map { case (id, text) =>
          val toks = text.split(" ", -1).distinct
          val sigs = Array.tabulate(MinhashSeeds) { seed =>
            var best: String = null
            toks.foreach { w =>
              val h = hex(md.digest(s"$seed:$w".getBytes("UTF-8")))
              if (best == null || h < best) best = h
            }
            best
          }
          val bandSigs = Array.tabulate(numBands) { b =>
            hex(md.digest(sigs.slice(b * BandRows, (b + 1) * BandRows)
              .mkString("|").getBytes("UTF-8")))
          }
          java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[String]())
          (id, toks, bandSigs)
        }
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = docBands.flatMap { case (id, _, bs) =>
      bs.iterator.zipWithIndex.map { case (sig, b) => (id, b, sig) }
    }.toDF("doc_id", "band", "band_sig")
    val a = bands.select(col("doc_id").as("i"), col("band"), col("band_sig"))
    val b = bands.select(col("doc_id").as("j"), col("band").as("band_b"), col("band_sig").as("sig_b"))
    val cand = a.join(b, col("band") === col("band_b") &&
        col("band_sig") === col("sig_b") && col("i") < col("j"))
      .select("i", "j").distinct()
    // verify: broadcast the token-set map (O(docs) small side) so the
    // candidate-pair stream never shuffles token arrays. On a corpus too
    // big to broadcast, replace with a sort-merge join of cand against
    // the token table range-partitioned by doc_id — same arithmetic.
    val tokMap = s.sparkContext.broadcast(
      docBands.map { case (id, ts, _) => (id, ts) }.collect().toMap)
    cand.as[(Long, Long)]
      .mapPartitions { it =>
        val m = tokMap.value
        it.flatMap { case (i, j) =>
          val fa = m(i); val fb = m(j)
          val n = sortedIntersect(fa, fb)
          val jac = n.toDouble / (fa.length + fb.length - n).toDouble
          if (jac >= 0.5) Iterator.single((i, j, jac)) else Iterator.empty
        }
      }
      .toDF("doc_a", "doc_b", "jaccard")
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
    * with exact power-of-two shifts.
    *
    * The bit-vote loop is a nested HOF over the per-doc hash array, so
    * the shuffle carries |tokens| rows once — not |tokens| x 60 (the
    * naive bit-explode costs 60x the shuffle for the same answer). */
  private def simhashes(s: SparkSession, d: String): DataFrame =
    tokens(s, d)
      .withColumn("h", conv(substring(md5(col("w")), 1, 15), 16, 10).cast(LongType))
      .groupBy("doc_id")
      .agg(collect_list(col("h")).as("hs"))
      .withColumn("simhash", expr(
        s"""aggregate(sequence(0, ${SimhashBits - 1}), CAST(0 AS BIGINT), (acc, j) ->
           |  acc + IF(aggregate(hs, CAST(0 AS BIGINT),
           |             (v, h) -> v + IF((shiftright(h, j) & CAST(1 AS BIGINT)) = 1, 1, -1)) >= 0,
           |           CAST(POWER(2, j) AS BIGINT), CAST(0 AS BIGINT)))""".stripMargin))
      .select("doc_id", "simhash")

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

  /** Blocked pairwise set-similarity kernel shared by d04/q26-style ops:
    * group docs by blocking key, then merge-intersect sorted feature
    * arrays pair-wise inside each block. One task per block — the
    * shuffle carries each doc's feature set once, never the exploded
    * feature-pair join (which is quadratic in shuffle bytes for
    * low-cardinality vocabularies). */
  private[ops] def blockedJaccard(s: SparkSession, feats: DataFrame,
                                  threshold: Double): DataFrame = {
    import s.implicits._
    feats.as[(String, Long, Array[String])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val docs = it.map { case (_, id, fs) =>
          java.util.Arrays.sort(fs, java.util.Comparator.naturalOrder[String]())
          (id, fs)
        }.toArray.sortBy(_._1)
        for {
          x <- docs.indices.iterator
          y <- (x + 1 until docs.length).iterator
          (ia, fa) = docs(x); (ib, fb) = docs(y)
          n = sortedIntersect(fa, fb)
          jac = n.toDouble / (fa.length + fb.length - n).toDouble
          if jac >= threshold
        } yield (ia, ib, jac)
      }
      .toDF("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  private def sortedIntersect(a: Array[String], b: Array[String]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1 else j += 1
    }
    n
  }

  def d04(s: SparkSession, d: String): DataFrame = {
    val feats = documents(s, d).select(col("source"), col("doc_id"),
      array_distinct(
        expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))")).as("fs"))
    blockedJaccard(s, feats, 0.6)
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

  /** All-pairs cosine with a broadcast primitive-array kernel: one side
    * is broadcast (quantized vectors are ~0.5 KB each; a 1M-vector side
    * is ~0.5 GB — beyond that, switch to a block-matrix join on vector
    * ranges), the other streams partition-wise with a tight long-array
    * loop. ~100x faster than the HOF zip_with pair join and bit-exact
    * identical (integer dots, IEEE double division). */
  def d05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val q = embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"), x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("q"))
      .repartition(col("vec_id")) // CPU-bound kernel: spread over all cores
      .as[(Long, Array[Long])]
    val all = q.collect().sortBy(_._1)
    val bc = s.sparkContext.broadcast(all.map { case (id, v) =>
      var n = 0L; var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      (id, v, n)
    })
    q.mapPartitions { it =>
      val cands = bc.value
      it.flatMap { case (va, qa) =>
        var na = 0L; var i = 0
        while (i < qa.length) { na += qa(i) * qa(i); i += 1 }
        cands.iterator.filter(_._1 > va).flatMap { case (vb, qb, nb) =>
          var dot = 0L; var j = 0
          while (j < qa.length) { dot += qa(j) * qb(j); j += 1 }
          val cosine = dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
          if (cosine >= 0.4) Iterator.single((va, vb, cosine)) else Iterator.empty
        }
      }
    }.toDF("vec_a", "vec_b", "cosine")
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

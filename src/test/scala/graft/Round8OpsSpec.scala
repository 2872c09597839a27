package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Dedup

/** Round-8 operator contracts: d13's canonical keep-list must be a
  * valid per-cluster survivor assignment — exactly one keeper per
  * cluster, the keeper is the longest member (ties → min doc_id), and
  * the keep column is consistent with canonical_id.
  */
class Round8OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round8-ops-spec")
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("d13: one keeper per cluster, keeper is the longest member, keep == (doc == canonical)") {
    val df = Dedup.d13(spark, sf).cache()
    try {
      val total = df.count()
      assert(total > 0)
      // keep is exactly the canonical indicator
      assert(df.where(col("keep") =!=
        when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L)).count() == 0)
      // exactly one keeper per cluster, and the canonical is a member
      val perCluster = df.groupBy("cluster_id")
        .agg(sum("keep").as("keepers"),
          max(when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L)).as("canonIsMember"))
      assert(perCluster.where(col("keepers") =!= 1L).count() == 0)
      assert(perCluster.where(col("canonIsMember") =!= 1L).count() == 0)
      // the keeper maximizes (n_tok, -doc_id) within its cluster
      val sized = graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      val joined = df.join(sized, "doc_id")
      val best = joined.groupBy("cluster_id")
        .agg(max(struct(col("n_tok"), (-col("doc_id")).as("neg"))).as("m"))
        .select(col("cluster_id"), (-col("m.neg")).as("best_id"))
      val canon = df.select("cluster_id", "canonical_id").distinct()
      assert(canon.join(best, "cluster_id")
        .where(col("canonical_id") =!= col("best_id")).count() == 0)
    } finally df.unpersist()
  }

  test("t10: novelty partitions the shingle space (sum of novel == corpus distinct shingles)") {
    import graft.ops.{Dedup, TextAnalysis}
    val df = TextAnalysis.t10(spark, sf).cache()
    try {
      assert(df.count() > 0)
      // fractions well-formed and bounded
      assert(df.where(col("novelty_fraction") < 0.0 ||
        col("novelty_fraction") > 1.0 ||
        col("shingles_novel") > col("shingles_distinct")).count() == 0)
      // every distinct shingle's FIRST source is unique, so the novel
      // counts across sources tile the corpus' distinct shingle set
      val totalNovel = df.agg(sum("shingles_novel")).head().getLong(0)
      val corpusDistinct = graft.core.Tables.documents(spark, sf)
        .withColumn("toks", split(col("text"), " "))
        .where(size(col("toks")) >= Dedup.SpanLen)
        .select(explode(expr(
          s"transform(sequence(1, size(toks) - ${Dedup.SpanLen - 1}), i -> md5(concat_ws(' ', slice(toks, i, ${Dedup.SpanLen}))))")).as("sh"))
        .agg(countDistinct(col("sh"))).head().getLong(0)
      assert(totalNovel == corpusDistinct,
        s"novel=$totalNovel distinct=$corpusDistinct")
    } finally df.unpersist()
  }
}

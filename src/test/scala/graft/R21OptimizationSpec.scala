package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-21 optimization equivalence: the single-pass rewrites of t10
  * and d11 (one corpus scan + explode where there were two) must return
  * EXACTLY the rows of the original two-pass formulations, which are
  * kept alive here as inline reference implementations over the same
  * public inputs. The plan-shape side of the claim — one exploded
  * corpus scan, not two — is asserted structurally so a refactor cannot
  * silently reintroduce the second pass. (d14's one-pass rewrite is
  * covered by its DuckDB oracle row, whose SQL is the two-subtree
  * formulation; no private-state replica is needed here.) */
class R21OptimizationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-r21-optimization-spec")
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.core.Tables.{documents, big}

  private def spanOcc(d: String): DataFrame =
    documents(spark, d)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= graft.ops.Dedup.SpanLen)
      .withColumn("sh", explode(expr(
        s"transform(sequence(1, size(toks) - ${graft.ops.Dedup.SpanLen - 1}), " +
          s"i -> md5(concat_ws(' ', slice(toks, i, ${graft.ops.Dedup.SpanLen}))))")))
      .select(col("source"), col("doc_id"), col("sh"))

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("t10 one-pass == the original two-pass formulation") {
    // the pre-r21 t10: one agg subtree for min(doc_id) per shingle, a
    // SECOND full scan+explode for distinct (source, sh)
    val occ = spanOcc(sf)
    val firstDoc = occ.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
    val firstSource = firstDoc
      .join(documents(spark, sf).select(col("doc_id").as("first_doc"),
        col("source").as("first_source")), "first_doc")
      .select(col("sh"), col("first_source"))
    val reference = occ.select("source", "sh").distinct()
      .join(firstSource, "sh")
      .groupBy("source")
      .agg(
        big(count(lit(1))).as("shingles_distinct"),
        big(sum(when(col("first_source") === col("source"), 1L).otherwise(0L)))
          .as("shingles_novel"))
      .withColumn("novelty_fraction",
        col("shingles_novel").cast(DoubleType) / col("shingles_distinct").cast(DoubleType))
      .orderBy("source")
    val current = graft.ops.TextAnalysis.t10(spark, sf)
    assert(rows(current) === rows(reference),
      "t10's single-pass rewrite changed the per-source novelty rows")
  }

  test("d11 two-level rollup == the original occurrence-join formulation") {
    val occ = spanOcc(sf)
    val spanDocs = occ.groupBy("sh")
      .agg(countDistinct(col("doc_id")).as("nd"))
    val reference = occ.join(spanDocs, "sh")
      .groupBy("source")
      .agg(
        big(count(lit(1))).as("spans_total"),
        big(sum(when(col("nd") >= 2, 1L).otherwise(0L))).as("spans_duplicated"))
      .withColumn("dup_fraction",
        col("spans_duplicated").cast(DoubleType) / col("spans_total").cast(DoubleType))
      .orderBy("source")
    val current = graft.ops.Dedup.d11(spark, sf)
    assert(rows(current) === rows(reference),
      "d11's two-level (sh, source) rollup changed the span-coverage rows")
  }

  test("t10 and d11 plans really are single-pass over the exploded corpus") {
    // structural half of the claim: count Generate (explode) nodes fed
    // by the documents scan — the rewrite's point is ONE shingle
    // explode, and a refactor reintroducing the second pass would grow
    // this count back. (t10 keeps a second, explode-FREE documents scan
    // for the slim first-source lookup; that one is intended.)
    def explodes(df: DataFrame): Int =
      "(?m)^\\s*(:|\\+)- \\*?\\s?Generate explode".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    val t10Explodes = explodes(graft.ops.TextAnalysis.t10(spark, sf))
    // t10: 1 corpus shingle explode + 1 tiny source-set re-expansion
    assert(t10Explodes <= 2,
      s"t10 grew a second corpus explode pass (found $t10Explodes Generate nodes)")
    val d11Explodes = explodes(graft.ops.Dedup.d11(spark, sf))
    // d11: 1 corpus span explode + 1 per-shingle struct-list re-expansion
    assert(d11Explodes <= 2,
      s"d11 grew a second corpus explode pass (found $d11Explodes Generate nodes)")
  }
}

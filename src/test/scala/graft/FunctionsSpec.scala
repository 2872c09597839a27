package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.{GraftFunctions, MinHashAggregator}

/** UDF-surface coverage (SURVEY.md §2b): MinHash Aggregator equivalence
  * with the relational form, HLL tolerance, scalar UDFs. */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-functions-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  test("MinHash Aggregator == relational explode/groupBy-min signatures") {
    val s = spark
    import s.implicits._
    val k = 12
    val tok = graft.core.Tables.documents(s, sfDir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
    // relational form
    val seeds = s.range(k).select(col("id").cast("int").as("seed"))
    val rel = tok.crossJoin(broadcast(seeds))
      .select(col("doc_id"), col("seed"),
        md5(concat(col("seed").cast("string"), lit(":"), col("w"))).as("h"))
      .groupBy("doc_id", "seed").agg(min("h").as("sig"))
      .groupBy("doc_id")
      .agg(concat_ws("|", transform(array_sort(collect_list(struct(col("seed"), col("sig")))),
        x => x.getField("sig"))).as("sig_str"))
    // aggregator form
    val agg = tok.as[(Long, String)].groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashAggregator(k).toColumn.name("sigs"))
      .toDF("doc_id", "sigs")
      .select(col("doc_id"), concat_ws("|", col("sigs")).as("sig_str"))
    val diff = rel.join(agg, Seq("doc_id"))
      .where(rel("sig_str") =!= agg("sig_str")).count()
    assert(diff == 0)
    assert(agg.count() == 500)
  }

  test("approx_count_distinct (HLL) within 5% of exact") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"HLL estimate $approx vs exact $exact")
  }

  test("scalar UDFs: tokenize_norm and cosine_sim") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT tokenize_norm('  The Fast   FOX ') AS t, " +
        "cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head()
    assert(r.getSeq[String](0) == Seq("the", "fast", "fox"))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }
}

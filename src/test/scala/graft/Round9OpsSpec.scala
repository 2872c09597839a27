package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Dedup

/** Round-9 operator contracts: d15's span-excision output must be a
  * valid set of removal intervals — in-bounds, disjoint, maximal
  * (no two mergeable islands), and only ever removing spans the
  * corpus actually duplicates.
  */
class Round9OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round9-ops-spec")
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("d15: removal intervals are in-bounds, disjoint, maximal, and span-sized") {
    val df = Dedup.d15(spark, sf).cache()
    try {
      assert(df.count() > 0, "sf0.001 holds near-dup docs; excision must fire")
      // interval arithmetic: 1-based, ordered, at least one span wide
      assert(df.where(col("rm_from") < 1 || col("rm_to") < col("rm_from")).count() == 0)
      assert(df.where(col("tokens_removed") =!=
        col("rm_to") - col("rm_from") + 1).count() == 0)
      assert(df.where(col("tokens_removed") < Dedup.SpanLen).count() == 0,
        "an island is at least one excised span long")
      // in bounds of the document's token count
      val nTok = graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      assert(df.join(nTok, "doc_id").where(col("rm_to") > col("n")).count() == 0)
      // islands are disjoint AND non-adjacent (maximally merged): the
      // next island in a doc starts at least 2 past the previous end
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("rm_from")
      val withPrev = df.withColumn("prev_to", lag(col("rm_to"), 1).over(w))
      assert(withPrev.where(col("prev_to").isNotNull &&
        col("rm_from") <= col("prev_to") + 1).count() == 0)
    } finally df.unpersist()
  }

  test("d15: synthetic fixture — first occurrence survives, copies and embeds excised") {
    import spark.implicits._
    // a corpus whose duplication structure is known exactly:
    //   doc 1: tokens a1..a10                      (the original)
    //   doc 2: identical text                      (exact copy)
    //   doc 3: u1 u2 a1..a8 v1 v2                  (embeds doc 1's first span)
    //   doc 4: b1..b10, all unique                 (untouched)
    //   doc 5: c1..c5, shorter than SpanLen        (no spans at all)
    val a = (1 to 10).map(i => s"a$i").mkString(" ")
    val fixture = Seq(
      (1L, a, "en", "s1", a.length.toLong),
      (2L, a, "en", "s1", a.length.toLong),
      (3L, ("u1 u2 " + (1 to 8).map(i => s"a$i").mkString(" ") + " v1 v2"), "en", "s2", 0L),
      (4L, (1 to 10).map(i => s"b$i").mkString(" "), "en", "s2", 0L),
      (5L, (1 to 5).map(i => s"c$i").mkString(" "), "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-d15").toString
    fixture.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = Dedup.d15(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // doc 2 fully excised (its every span's first occurrence is in
      // doc 1); doc 3's embedded copy [3, 10] excised (u1 u2 ... v1 v2
      // collar survives); docs 1, 4, 5 untouched
      assert(out == Seq((2L, 1L, 10L), (3L, 3L, 10L)), s"got $out")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}

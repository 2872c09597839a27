package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-15 composition invariants — deletion reaches the CLUSTER
  * artifacts (the last quadrant the round-14 verdict named):
  *  - every cluster-derived report (d07/d09/d10/d13/p09) composed with
  *    d17's tombstones equals the same report on a corpus that never
  *    ingested the deleted docs;
  *  - the label artifact is the one family an id-only anti-join CANNOT
  *    serve: a deleted BRIDGE doc must split its cluster, and deleting
  *    a cluster's min-id doc must not leak the deleted id as the
  *    survivors' label — the planted corpus exercises both against the
  *    component repair, and pins that the naive anti-join answer is
  *    wrong (the reason the repair exists);
  *  - the d03 pair artifact gets the d17 treatment: anti-join serve
  *    below the shared compaction threshold (plan-pinned), compacted
  *    rewrite above it, identical answers.
  *
  * The planted texts' simhash relations (ham(A,B)=5, ham(B,C)=4,
  * ham(A,C)=9 > HammingMax, ham(D,E)=4, fillers > 6 from everything)
  * were searched offline against the exact md5 voting chain; a
  * signal-guard assertion re-derives the pair set so a kernel change
  * that invalidates the plant fails loudly, not silently.
  */
class Round15OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round15-ops-spec")
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def reducedAt(src: String, table: String,
                        deleted: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-r15-$table").toString
    spark.read.parquet(s"$src/$table.parquet")
      .where(!deleted)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir
  }

  // ids: 1=A, 3=B (tombstoned BRIDGE), 7=C, 13=D (tombstoned cluster
  // min), 24=E, 41 + fillers = far singletons. Full-corpus d03 pairs:
  // (1,3), (3,7), (13,24) and nothing else.
  private val plantedDocs: Seq[(Long, String)] = Seq(
    1L -> ("w373 w416 w280 w377 w167 w232 w355 w014 w390 w026 w328 w094 " +
      "w322 w227 w405 w069 w001 w205 w102 w321"),
    3L -> ("w373 w416 w280 w377 w156 w232 w355 w014 w390 w026 w294 w094 " +
      "w322 w160 w042 w069 w001 w205 w102 w321"),
    7L -> ("w373 w416 w264 w377 w156 w232 w355 w014 w390 w026 w294 w094 " +
      "w322 w160 w042 w127 w001 w080 w102 w056"),
    13L -> ("w060 w114 w365 w104 w097 w484 w441 w416 w400 w136 w147 w382 " +
      "w253 w195 w066 w220 w438 w105 w307 w110"),
    24L -> ("w060 w114 w365 w104 w097 w372 w421 w416 w400 w136 w147 w382 " +
      "w253 w144 w066 w220 w438 w105 w307 w110"),
    41L -> ("w209 w405 w074 w014 w148 w499 w134 w120 w316 w230 w464 w127 " +
      "w189 w298 w350 w331 w234 w043 w005 w240"))

  private val fillerDocs: Seq[(Long, String)] = Seq(
    51L -> ("w068 w446 w165 w498 w354 w203 w351 w108 w365 w196 w362 w216 " +
      "w376 w305 w131 w037 w048 w285 w030 w026"),
    61L -> ("w170 w476 w120 w241 w465 w181 w310 w480 w343 w495 w410 w306 " +
      "w363 w383 w414 w023 w002 w129 w258 w317"),
    71L -> ("w195 w154 w202 w343 w189 w067 w495 w456 w286 w021 w297 w091 " +
      "w133 w086 w257 w252 w476 w173 w449 w239"),
    81L -> ("w067 w045 w162 w363 w271 w221 w072 w133 w059 w160 w022 w065 " +
      "w255 w446 w498 w427 w143 w382 w184 w474"))

  private def writeDocs(rows: Seq[(Long, String)], tag: String): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-r15-$tag").toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bridge deletion SPLITS the cluster; min-id deletion relabels — anti-join would keep both wrong") {
    // 10 docs, 2 tombstoned -> 0.2 < threshold: anti-join pair serve
    val dir = writeDocs(plantedDocs ++ fillerDocs, "bridge")
    // signal-guard: the planted pair structure is exactly as searched
    val pairs = graft.ops.Dedup.d03(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (3L, 7L), (13L, 24L)),
      s"planted pair structure drifted — test lost its signal: $pairs")
    val live = graft.ops.Dedup.d07(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = live.map(r => r._1 -> r._2).toMap
    // tombstoned docs gone from the report
    assert(!byDoc.contains(3L) && !byDoc.contains(13L),
      s"deleted docs leaked into d07: $live")
    // bridge gone -> 1 and 7 are separate singleton clusters
    assert(byDoc(1L) == 1L && byDoc(7L) == 7L,
      s"deleting the bridge doc must split the cluster: $live")
    assert(live.collect { case (d, _, n) if d == 1L || d == 7L => n }.forall(_ == 1L))
    // min-id doc gone -> survivor labels ITSELF, not the deleted id
    assert(byDoc(24L) == 24L,
      s"survivor must not carry the deleted min-id as label: $live")
    // ...and the naive anti-join over the full label table gets BOTH
    // wrong (merged bridge cluster, leaked deleted label) — the reason
    // the live view is a component repair, not an anti-join
    val full = graft.ops.Dedup.connectedComponents(spark,
      spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id")),
      graft.ops.Dedup.d03(spark, dir).select("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(full(7L) == 1L && full(24L) == 13L,
      "full-corpus labels lost their bridge/min-id structure — test lost its signal")
    // d07's pair-serve plan below threshold: anti-join over the
    // published pair artifact
    val pairPlan = graft.ops.Dedup.liveD03Pairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pairPlan.contains("LeftAnti") && pairPlan.contains("graft_mat/pairs"),
      "sub-threshold live pair view must anti-join the published artifact")
  }

  test("d03 pair compaction: >threshold tombstones rewrite the pair artifact once; == rebuild-on-reduced") {
    // 6 docs, 2 tombstoned -> 0.33 > threshold: compacted branch
    val dir = writeDocs(plantedDocs, "compact")
    graft.ops.Dedup.d03(spark, dir).count() // publish the full pair table
    val pub0 = graft.core.Materialize.publishCount
    val live1 = graft.ops.Dedup.liveD03Pairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(graft.core.Materialize.publishCount == pub0 + 1,
      "above-threshold live pair view must publish the compacted table once")
    val pub1 = graft.core.Materialize.publishCount
    val live2 = graft.ops.Dedup.liveD03Pairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(graft.core.Materialize.publishCount == pub1,
      "warm compacted pair serve must not republish")
    assert(live1 == live2)
    // == the pair table a never-ingested corpus would publish
    val reduced = reducedAt(dir, "documents", graft.ops.Dedup.d17TombstonePred)
    val rebuilt = graft.ops.Dedup.d03(spark, reduced).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live1 == rebuilt, s"compacted pairs != rebuild-on-reduced: $live1 vs $rebuilt")
  }

  test("cluster reports ∘ d17 == reports on a corpus that never ingested the deleted docs (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val reduced = reducedAt(sf, "documents", graft.ops.Dedup.d17TombstonePred)
    def rows(f: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             d: String): Seq[Seq[Any]] =
      f(spark, d).collect().map(_.toSeq).toSeq
    for ((name, f) <- Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "d07" -> graft.ops.Dedup.d07,
      "d09" -> graft.ops.Dedup.d09,
      "d10" -> graft.ops.Dedup.d10,
      "d13" -> graft.ops.Dedup.d13,
      "p09" -> graft.ops.Pipeline.p09)) {
      val got = rows(f, sf)
      val want = rows(f, reduced)
      assert(got.nonEmpty, s"$name: empty report — census constants drifted")
      assert(got == want,
        s"$name over tombstones diverged from $name-on-reduced " +
          s"(${got.size} vs ${want.size} rows)")
    }
  }

  test("live label artifact is published once; warm reports read it without re-clustering") {
    val sf = "/root/testdata/sf0.001"
    graft.ops.Dedup.d07(spark, sf).count() // fresh publish of both label artifacts
    val pub0 = graft.core.Materialize.publishCount
    graft.ops.Dedup.d09(spark, sf).count()
    graft.ops.Dedup.d13(spark, sf).count()
    assert(graft.core.Materialize.publishCount == pub0,
      "warm cluster reports must consume the published live label table")
    val plan = graft.ops.Dedup.d09(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("graft_mat/labels"),
      "d09 must serve labels from the published artifact")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-16 operational-hardening invariants (the round-15 verdict's
  * orders — retention, bounded streaming state, the multi-day append
  * chain, deletion-aware retrain):
  *  - s14's pair-key dedup state is WATERMARK-BOUNDED: a multi-pass
  *    drain with wall-clock gaps past the delay evicts old passes'
  *    keys (state tracks the in-flight window, not arrival history)
  *    while the drained output stays the exact distinct set;
  *  - further tests land with their operators in this round.
  */
class Round16OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round16-ops-spec")
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- s14: pair-key dedup state is watermark-bounded ----

  private def writePairFeed(feedDir: String, tag: String,
                            pairs: Seq[(Long, Long)]): Unit = {
    val s = spark
    import s.implicits._
    // each pair written TWICE — the multi-band-collision repeat the
    // dedup exists to cut; repeats live in one file = one micro-batch,
    // the exact shape s14's doc-local band rows guarantee. Appended
    // flat into the feed dir (the s12 feed convention): each pass's
    // part file is the new arrival the next drain picks up.
    val _ = tag
    (pairs ++ pairs).toDF("ni", "ci").coalesce(1)
      .write.mode("append").parquet(feedDir)
  }

  test("s14 dedup state is watermark-bounded: old passes' keys evicted, " +
    "output stays the exact distinct set") {
    val feedRoot = java.nio.file.Files.createTempDirectory("graft-r16-s14feed").toString
    val base = java.nio.file.Files.createTempDirectory("graft-r16-s14base").toString
    val feedDir = s"$feedRoot/feed"
    new java.io.File(feedDir).mkdirs()

    // pass 1: 400 pairs (each duplicated in-file)
    val p1 = (1L to 400L).map(i => (i, i + 100000L))
    writePairFeed(feedDir, "p1", p1)
    val (out1, state1) = graft.streaming.Replay.s14DedupDrain(spark, feedDir, base)
    assert(out1.count() === 400L, "pass-1 drain must emit each pair once")
    assert(state1 >= 400L, "pass-1 state holds the in-flight pass's keys")

    // pass 2, after the 10 s delay has elapsed in wall-clock: 50 new keys
    Thread.sleep(12000)
    writePairFeed(feedDir, "p2", (1L to 50L).map(i => (i + 1000L, i + 200000L)))
    val (out2, _) = graft.streaming.Replay.s14DedupDrain(spark, feedDir, base)
    assert(out2.count() === 450L, "pass-2 drain adds exactly the 50 new pairs")

    // pass 3, another gap: 10 new keys. By now pass-1's batch timestamp
    // is > 20 s behind the watermark — its 400 keys must have LEFT the
    // state store. A bare dropDuplicates would report >= 460 here.
    Thread.sleep(12000)
    writePairFeed(feedDir, "p3", (1L to 10L).map(i => (i + 2000L, i + 300000L)))
    val (out3, state3) = graft.streaming.Replay.s14DedupDrain(spark, feedDir, base)
    assert(out3.count() === 460L, "pass-3 drain adds exactly the 10 new pairs")
    assert(state3 >= 0L, "stateful operator must report state rows")
    assert(state3 < 400L,
      s"state after pass 3 must exclude pass-1's 400 evicted keys " +
        s"(in-flight window, not history); got $state3")

    // the drained set is still exact: no pair lost, no pair doubled
    val distinctOut = out3.select("ni", "ci").distinct().count()
    assert(distinctOut === 460L && out3.count() === distinctOut,
      "bounding the state must not change the drained distinct set")
  }
}

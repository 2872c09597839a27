package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ops.Dedup

/** Unit coverage for the dedup kernels beyond the DuckDB oracle gate:
  * the pigeonhole banding invariants, exactly-once pair emission, and
  * the salted blocked-Jaccard kernel vs a brute-force reference. */
class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("SimhashChunks tile the 60-bit fingerprint exactly") {
    val chunks = Dedup.SimhashChunks
    assert(chunks.length == Dedup.HammingMax + 1)
    assert(chunks.map(_._3).sum == Dedup.SimhashBits)
    // contiguous, non-overlapping
    chunks.sliding(2).foreach {
      case Seq((_, o1, w1), (_, o2, _)) => assert(o1 + w1 == o2)
      case _ => ()
    }
    assert(chunks.head._2 == 0)
  }

  test("pigeonhole: any pair within hamming <= HammingMax shares a chunk") {
    val rnd = new scala.util.Random(42)
    val mask60 = (1L << Dedup.SimhashBits) - 1
    def chunkVals(fp: Long): Seq[Long] =
      Dedup.SimhashChunks.map { case (_, off, w) => (fp >>> off) & ((1L << w) - 1) }
    (0 until 2000).foreach { _ =>
      val a = rnd.nextLong() & mask60
      // flip up to HammingMax random bits
      val nFlips = rnd.nextInt(Dedup.HammingMax + 1)
      val b = (0 until nFlips).foldLeft(a)((v, _) => v ^ (1L << rnd.nextInt(Dedup.SimhashBits)))
      val shared = chunkVals(a).zip(chunkVals(b)).exists { case (x, y) => x == y }
      assert(shared, f"no shared chunk for a=$a%x b=$b%x ham=${java.lang.Long.bitCount(a ^ b)}")
    }
  }

  test("d03 emits each qualifying pair exactly once (crafted collisions)") {
    // many docs sharing identical text -> identical fingerprints ->
    // every chunk collides for every pair; first-match must still emit
    // each (a, b) exactly once with hamming 0
    val s = spark
    import s.implicits._
    val docs = (0L until 6L).map(i => (i, "alpha beta gamma delta epsilon zeta")) ++
      Seq((10L, "totally different words entirely unrelated content"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-d03").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.d03(spark, dir).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length, "duplicate pairs emitted")
    // all 15 identical-text pairs present with hamming 0
    val identical = out.filter(r => r.getLong(0) < 6 && r.getLong(1) < 6)
    assert(identical.length == 15)
    assert(identical.forall(_.getLong(2) == 0L))
  }

  test("blockedJaccardTyped matches a brute-force reference and bounds cells") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    val docs = (0L until 40L).map { i =>
      val src = if (i % 2 == 0) "s0" else "s1"
      val fs = rnd.shuffle(vocab).take(8 + rnd.nextInt(10)).toArray
      (src, i, fs)
    }
    val got = Dedup.blockedJaccardTyped(s, docs.toDS(), 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    // brute force within the same source
    val want = (for {
      x <- docs; y <- docs
      if x._1 == y._1 && x._2 < y._2
      sa = x._3.toSet; sb = y._3.toSet
      n = sa.intersect(sb).size; u = sa.union(sb).size
      jac = n.toDouble / u
      if jac >= 0.3
    } yield (x._2, y._2, n.toLong, u.toLong, jac)).sortBy(t => (t._1, t._2))
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("jaccardSalts: per-cell work stays bounded as blocks grow/skew") {
    val par = 32
    for (b <- Seq(10L, 1000L, 5000L, 50000L, 200000L)) {
      val p = Dedup.jaccardSalts(b, 5, par)
      assert(p >= 1 && p <= Dedup.JaccardMaxSalts)
      val g = math.ceil(b.toDouble / p) // salt-class size
      // off-diagonal cell work ~ G^2 intersects: bounded by the budget
      // (until the replication cap, far past the sane all-pairs range)
      if (p < Dedup.JaccardMaxSalts)
        assert(g * g <= Dedup.JaccardPairBudget * 1.1,
          s"block=$b p=$p g=$g exceeds pair budget")
    }
    // a 10x skewed block gets proportionally more salts, keeping its
    // cell size at the same bound as the small blocks
    val pSmall = Dedup.jaccardSalts(5000, 5, par)
    val pBig = Dedup.jaccardSalts(50000, 5, par)
    assert(pBig > pSmall)
    assert(math.ceil(50000.0 / pBig) <= math.sqrt(Dedup.JaccardPairBudget.toDouble))
    // small-corpus fill bound: enough cells to occupy the cluster
    val pTiny = Dedup.jaccardSalts(100, 4, par)
    assert(4L * pTiny * (pTiny + 1) / 2 >= 2L * par)
  }

  test("cosineBlocks: per-task memory constant in n, enough block pairs") {
    val par = 32
    for (n <- Seq(100L, 5000L, 100000L, 10000000L)) {
      val b = Dedup.cosineBlocks(n, par)
      assert(math.ceil(n.toDouble / b) <= Dedup.CosineBlockTargetVecs,
        s"n=$n b=$b block exceeds target vecs")
      assert(b.toLong * (b + 1) / 2 >= 2L * par)
    }
  }

  test("blockedJaccardTyped: 10x skewed block matches brute force") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 'z').map(_.toString)
    // block s0 has 10x the docs of s1 -> different derived salt counts
    val docs = (0L until 110L).map { i =>
      val src = if (i < 100) "s0" else "s1"
      val fs = rnd.shuffle(vocab).take(8 + rnd.nextInt(10)).toArray
      (src, i, fs)
    }
    val got = Dedup.blockedJaccardTyped(s, docs.toDS(), 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    val want = (for {
      x <- docs; y <- docs
      if x._1 == y._1 && x._2 < y._2
      sa = x._3.toSet; sb = y._3.toSet
      n = sa.intersect(sb).size; u = sa.union(sb).size
      jac = n.toDouble / u
      if jac >= 0.3
    } yield (x._2, y._2, n.toLong, u.toLong, jac)).sortBy(t => (t._1, t._2))
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("salt-cap cliff: over-cap block trips the census warning and strict mode") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{array, col, lit}
    // synthetic census: one block past the cap, one under it — the
    // warning must fire, name the worst block, and strict mode must
    // fail fast before any kernel work
    val cap = Dedup.jaccardCapDocs
    val counts = Seq(("huge", cap + 1), ("ok", 10L)).toDF("bk", "bn")
    val msg = Dedup.jaccardCapWarning(counts)
    assert(msg.isDefined, "over-cap block must trip the census")
    assert(msg.get.contains("huge"), s"worst block not named: ${msg.get}")
    assert(Dedup.jaccardCapWarning(Seq(("ok", cap)).toDF("bk", "bn")).isEmpty,
      "at-cap block must NOT trip the census")
    // strict conf: the kernel must throw during planning, not run over-cap
    val feats = s.range(cap + 1)
      .select(lit("huge").as("src"), col("id"), array().cast("array<string>").as("fs"))
      .as[(String, Long, Array[String])]
    s.conf.set("spark.graft.jaccard.strict", "true")
    try {
      val ex = intercept[IllegalStateException] {
        Dedup.blockedJaccardTyped(s, feats, 0.5)
      }
      assert(ex.getMessage.contains("JaccardMaxSalts"))
    } finally s.conf.unset("spark.graft.jaccard.strict")
  }

  test("property: connectedComponents == union-find on random graphs") {
    val s = spark
    import s.implicits._
    for (trial <- 0 until 6) {
      val rnd = new scala.util.Random(500 + trial)
      val n = 30 + rnd.nextInt(170)
      // mix of shapes: sparse random edges + one deliberate long chain
      // (stresses the pointer-jumping path, not just dense cliques)
      val random = Seq.fill(rnd.nextInt(3 * n))((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val chainLen = 5 + rnd.nextInt(20)
      val base = rnd.nextInt(n - 1)
      val chain = (0 until chainLen - 1).map { i =>
        ((base + i) % n).toLong -> ((base + i + 1) % n).toLong
      }.filter(p => p._1 != p._2)
      val pairs = random ++ chain
      val got = graft.ops.Dedup.connectedComponents(s,
          (0L until n.toLong).toDF("v"), pairs.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map((0L until n.toLong).map(v => v -> v): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = (0L until n.toLong).map { v =>
        v -> (0L until n.toLong).filter(u => find(u) == find(v)).min
      }.toMap
      assert(got == want,
        s"trial $trial n=$n edges=${pairs.length}: first diff " +
          got.find { case (k, v) => want(k) != v })
    }
  }

  test("CC block hygiene: only the live labels stay persisted after return") {
    val s = spark
    import s.implicits._
    // start from a clean slate (earlier tests in the shared session may
    // have left their own persisted tables)
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // long chain -> several pointer-jumping rounds -> several superseded
    // localCheckpoint label tables that MUST be released eagerly
    val n = 400L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val labels = graft.ops.Dedup.connectedComponents(s,
      (0L until n).toDF("v"), chain.toDF("a", "b"))
    assert(labels.collect().forall(_.getLong(1) == 0L))
    assert(graft.ops.Dedup.lastCcRounds >= 2)
    // edges + every superseded round unpersist with blocking=false ->
    // poll briefly; the ONLY block set allowed to remain is the live
    // (returned) labels checkpoint
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def persisted = s.sparkContext.getPersistentRDDs.size
    while (persisted > 1 && System.nanoTime() < deadline) Thread.sleep(100)
    assert(persisted <= 1,
      s"CC left $persisted persistent RDDs behind (want <= 1: the live labels)")
  }

  test("ccFingerprint: stable on identical input, changes on mtime/size/content") {
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ccfp")
    val doc = dir.resolve("documents.parquet")
    java.nio.file.Files.copy(src, doc)
    val fp1 = graft.ops.Dedup.ccFingerprint(dir.toString)
    // same bytes, same mtime -> same key (the cache hit path)
    assert(fp1 == graft.ops.Dedup.ccFingerprint(dir.toString))
    // touching the input (mtime bump) must invalidate — a rewritten
    // upstream table can never be served stale labels. Sensitivity is
    // IMMEDIATE since round 18, within one JVM too: the listing-cache
    // hit is guarded by a root-status freshness probe, so no manual
    // fingerprintCacheClear() is needed (the original, pre-TTL
    // assertion restored).
    java.nio.file.Files.setLastModifiedTime(doc,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(doc).toMillis + 1234))
    val fp2 = graft.ops.Dedup.ccFingerprint(dir.toString)
    assert(fp2 != fp1)
    // size change invalidates too
    java.nio.file.Files.write(doc, Array[Byte](0),
      java.nio.file.StandardOpenOption.APPEND)
    assert(graft.ops.Dedup.ccFingerprint(dir.toString) != fp2)
  }

  test("d07 clusters == driver union-find over the LIVE d03 pair graph (sf0.001)") {
    // d07 reports the live corpus since round 15: the reference
    // union-find runs over documents-minus-tombstones and the pair
    // graph with both endpoints live — the component repair must equal
    // a from-scratch clustering of the reduced graph.
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val mod = graft.ops.Dedup.IncrementalMod
    val trem = graft.ops.Dedup.TombstoneRem
    val pairs = graft.ops.Dedup.d03Pairs(spark, sf)
      .where(col("doc_a") % mod =!= trem && col("doc_b") % mod =!= trem)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.core.Tables.documents(spark, sf)
      .where(col("doc_id") % mod =!= trem)
      .select("doc_id").collect().map(_.getLong(0))
    // reference: classic union-find on the driver
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // canonical label = min doc in component
    val byRoot = docs.groupBy(find)
    val want = byRoot.values.flatMap { members =>
      val label = members.min
      members.map(m => (m, label, members.length.toLong))
    }.toSeq.sortBy(_._1)
    val got = graft.ops.Dedup.d07(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(byRoot.size > 1 && byRoot.values.exists(_.length > 1),
      "fixture should have both singletons and real clusters")
  }

  test("d02 band keys: identical texts collide, verify is exact on a known pair") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"), // identical -> jac 1.0
      (3L, "one two three four five six seven nine"),  // 7/9 overlap
      (4L, "completely different words here entirely distinct"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-d02").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.d02(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.contains((1L, 2L, 1.0)))
    // (1,3): inter 7, union 9 -> 0.777... >= 0.5 IF minhash bands collide
    // (identical on most seeds — not guaranteed, so only check value when present)
    out.filter(t => t._1 == 1L && t._2 == 3L).foreach { t =>
      assert(math.abs(t._3 - 7.0 / 9.0) < 1e-15)
    }
    assert(!out.exists(t => t._2 == 4L || t._1 == 4L))
  }

  test("d08 (native bloom pre-filter) == d06 row-for-row on sf0.001") {
    // the bloom stage may only PRUNE join input, never change the
    // answer: false positives die in the exact join, and the xxhash64
    // long-encoding can only add candidates, not remove them
    val sf = "/root/testdata/sf0.001"
    val a = Dedup.d06(spark, sf).collect().map(_.toSeq).toSeq
    val b = Dedup.d08(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, s"d08 diverged from d06: ${a.diff(b)} vs ${b.diff(a)}")
    assert(a.nonEmpty)
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fingerprint-keyed parquet materialization — the shared substrate for
  * every "compute once per corpus, consume from many reports" artifact
  * (d07's cluster labels, the d03 near-dup pair table, a07's k-means
  * assignment). At 100 TB the expensive kernels (pair generation,
  * connected components, Lloyd iterations) must run ONCE per input and
  * be CONSUMED by every downstream report; re-running them per report is
  * the anti-pattern this module exists to prevent.
  *
  * Key design:
  *  - the table path is keyed by a fingerprint of (input file identity,
  *    algorithm parameters, code salt), so a stale materialization can
  *    never satisfy a newer input or algorithm — staleness is
  *    structurally impossible, no manual version-bump discipline;
  *  - the code salt is the MD5 of the COMPILED BYTECODE of every class
  *    the artifact's semantics depend on (the operator object AND its
  *    named dependencies, e.g. the table loaders) — any recompiled
  *    change to those classes invalidates the cache;
  *  - publication is write-temp-then-rename through the Hadoop
  *    FileSystem API (works identically on file:, hdfs://, s3a://): a
  *    concurrent reader sees either no table or a complete
  *    `_SUCCESS`-stamped one, never a half-written directory;
  *  - failed writes clean their temp directory (try/finally), and every
  *    publish sweeps stale `.inprogress-*` siblings older than one hour
  *    — a crashed JVM cannot permanently orphan temp dirs;
  *  - generations do NOT accumulate forever: [[retentionSweep]] (round
  *    16) deletes a family's unpinned generations under structural
  *    pin-safety guarantees — the lifecycle operators (append/retune/
  *    compact) mint generations, the retention policy reaps superseded
  *    ones, and a tombstoned document's rows survive in no retained
  *    generation (graft.ops.Governance.g01 is the gate-checked report).
  */
object Materialize {

  /** MD5 of the concatenated compiled bytecode of `classes` — the code
    * component of a cache key. List EVERY class whose behavior the
    * artifact depends on (the operator and its helpers/loaders); the
    * salt then covers exactly that set, no more — callers must not
    * claim broader self-invalidation than the listed classes. Falls
    * back to the class names if bytecode is not resource-loadable
    * (exotic classloaders). */
  def codeSalt(classes: Class[_]*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    classes.foreach { cl =>
      val res = "/" + cl.getName.replace('.', '/') + ".class"
      val in = cl.getResourceAsStream(res)
      if (in == null) md.update(cl.getName.getBytes("UTF-8"))
      else try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    }
    hex(md.digest())
  }

  /** Hadoop configuration for fingerprint/table IO — taken from the
    * live session so the materialization root may point at any
    * Hadoop-compatible FS (hdfs://, s3a://, file:). */
  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Identity fingerprint of one input table: every file's
    * (path, size, mtime) under `<dir>/<table>.parquet` plus the
    * algorithm descriptor and code salt — pure filesystem metadata, no
    * data read. Listed through the Hadoop FileSystem API so a remote
    * input (hdfs://, s3a://) fingerprints the same way a local one
    * does. */
  def fingerprint(dir: String, table: String,
                  algo: String, salt: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val root = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = root.getFileSystem(hadoopConf)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      files += s"${f.getPath}|${f.getLen}|${f.getModificationTime}"
    }
    files.sorted.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.update(s"$dir|$algo|$salt".getBytes("UTF-8"))
    hex(md.digest())
  }

  /** Root of all materialized tables. Local default for the bench box;
    * a cluster deployment points `spark.graft.mat.dir` at shared storage
    * (the tables are read by every downstream report job, so they must
    * live where the cluster can see them). */
  def tablePath(s: SparkSession, kind: String, fp: String): String = {
    val root = s.conf.getOption("spark.graft.mat.dir")
      .getOrElse("/tmp/graft_mat")
    s"$root/$kind/$fp"
  }

  /** True iff a complete (`_SUCCESS`-stamped) table exists at the key. */
  def exists(s: SparkSession, kind: String, fp: String): Boolean = {
    val success = new org.apache.hadoop.fs.Path(tablePath(s, kind, fp), "_SUCCESS")
    success.getFileSystem(s.sparkContext.hadoopConfiguration).exists(success)
  }

  /** Read the materialized table if this exact (input, algorithm, code)
    * has been computed on this storage, else compute-and-publish. The
    * production contract: the expensive kernel runs ONCE; reports
    * consume its output table. The compute-if-absent fallback keeps
    * every consumer runnable in isolation. */
  def readOrCompute(s: SparkSession, kind: String, fp: String)
                   (compute: => DataFrame): DataFrame = {
    if (exists(s, kind, fp)) s.read.parquet(tablePath(s, kind, fp))
    else this.synchronized {
      // re-check under the lock: another thread of this JVM may have
      // published while we waited
      if (exists(s, kind, fp)) s.read.parquet(tablePath(s, kind, fp))
      else publish(s, kind, fp)(compute)
    }
  }

  /** Count of publish() computations in this JVM. Bench samples it
    * around each timed query and stamps the delta into its diag line:
    * an entry whose timing includes a publish paid a one-time
    * materialization (cold at this corpus fingerprint, or an
    * always-compute kernel like d03/d07/a07) — the round-10
    * false-regression class (s07/d07-consumers after a corpus regen)
    * becomes visible instead of reading as a slowdown. */
  private val publishCalls = new java.util.concurrent.atomic.AtomicLong(0)
  def publishCount: Long = publishCalls.get

  /** Compute `compute` and PUBLISH it at the key (temp write + atomic
    * rename), returning a reader of the published table. Used directly
    * by the entries that ARE the measured kernel (d03, d07, a07): they
    * always compute fresh and leave the table behind for consumers.
    *
    * If another process publishes the same fingerprint first, we defer
    * to the winner — its table is identical by construction. The
    * residual window (delete-then-rename of a re-run is not one atomic
    * op) is between two re-runs of the SAME input+algorithm, whose
    * tables are identical. */
  def publish(s: SparkSession, kind: String, fp: String)
             (compute: => DataFrame): DataFrame = {
    publishCalls.incrementAndGet()
    val out = tablePath(s, kind, fp)
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    sweepStale(fs, outPath.getParent)
    val tmp = new org.apache.hadoop.fs.Path(out +
      s".inprogress-${java.lang.ProcessHandle.current.pid}-${System.nanoTime}")
    var published = false
    try {
      compute.write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(outPath)) fs.delete(outPath, true) // re-run: replace
      if (fs.rename(tmp, outPath)) published = true
      else {
        // rename refuses when the destination exists: a concurrent
        // process published this fingerprint between our delete and
        // rename — defer to it
        if (!fs.exists(new org.apache.hadoop.fs.Path(outPath, "_SUCCESS")))
          throw new IllegalStateException(s"failed to publish $kind table at $out")
      }
    } finally {
      // a throw anywhere above (including mid-write) must not orphan
      // the temp dir; after a successful rename the path is gone and
      // delete is a cheap no-op
      if (!published) fs.delete(tmp, true)
    }
    s.read.parquet(out)
  }

  /** Complete (`_SUCCESS`-stamped) generation fingerprints currently
    * published under `<root>/<kind>` — the enumeration a retention
    * policy decides over. `.inprogress-*` temps (live or crashed
    * writers — [[sweepStale]]'s jurisdiction, by age) and incomplete
    * dirs are not generations and are not listed. */
  def listGenerations(s: SparkSession, kind: String): Seq[String] = {
    val parent = new org.apache.hadoop.fs.Path(
      tablePath(s, kind, "x")).getParent
    val fs = parent.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(parent)) return Seq.empty
    fs.listStatus(parent).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.contains(".inprogress-"))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName)
      .sorted
  }

  /** RETENTION SWEEP (round-16): delete every complete generation of
    * `kind` that is not pinned. Generations accumulate unboundedly
    * otherwise — every append folds a new chain generation, every
    * retune republishes and leaves its stale predecessor, every
    * compaction leaves the raw artifact behind — and a superseded raw
    * generation is not just a storage leak: it RETAINS the rows of
    * legally-deleted documents that compaction removed from the
    * serving artifact. The policy is the caller's (`pins` names the
    * currently-serving fingerprint and the rollback generation —
    * whatever the family's lifecycle designates); the MECHANISM here
    * guarantees, structurally and by post-assertion:
    *  - a pinned generation is NEVER deleted, and its files are
    *    bit-untouched (status-verified before/after — a post-sweep
    *    serve from a pin is the same bytes);
    *  - `.inprogress-*` temps are never touched (a live writer's
    *    publish cannot be swept out from under it; crashed temps age
    *    out via [[sweepStale]]);
    *  - incomplete dirs (no `_SUCCESS`) are never touched — anomalous
    *    state is surfaced to the report, not destroyed;
    *  - empty `pins` is refused, and so is a pin set where NO pin
    *    matches any published generation while generations exist: both
    *    would sweep the whole family. The all-stale case is the sharper
    *    trap — a caller that recomputes pin fingerprints after a corpus
    *    regeneration or code-salt change (the round-10 class) holds
    *    syntactically valid pins that name nothing on disk, and an
    *    unguarded sweep would silently delete the serving artifact with
    *    `retained` = [].
    * Returns (retained, swept) fingerprint lists. A MIXED pin set where
    * some pins are not currently published is allowed (a pin is an
    * intent, not an existence claim — e.g. a rollback generation never
    * built at this site); unpublished pins simply don't appear in
    * `retained`. */
  def retentionSweep(s: SparkSession, kind: String,
                     pins: Set[String]): (Seq[String], Seq[String]) = {
    require(pins.nonEmpty,
      s"retentionSweep($kind): empty pin set — refusing to sweep a whole family")
    val fs = new org.apache.hadoop.fs.Path(tablePath(s, kind, "x"))
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def statusOf(fp: String): Seq[(String, Long, Long)] = {
      val root = new org.apache.hadoop.fs.Path(tablePath(s, kind, fp))
      if (!fs.exists(root)) Seq.empty
      else {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        val it = fs.listFiles(root, true)
        while (it.hasNext) {
          val f = it.next()
          buf += ((f.getPath.toString, f.getLen, f.getModificationTime))
        }
        buf.sortBy(_._1).toSeq
      }
    }
    val before = listGenerations(s, kind)
    val pinnedBefore = before.filter(pins.contains)
    require(before.isEmpty || pinnedBefore.nonEmpty,
      s"retentionSweep($kind): no pin matches any published generation " +
        s"(published: ${before.mkString(",")}; pins: ${pins.mkString(",")}) — " +
        "refusing to sweep a whole family under stale pins")
    val pinStatus = pinnedBefore.map(fp => fp -> statusOf(fp)).toMap
    val toSweep = before.filterNot(pins.contains)
    toSweep.foreach { fp =>
      fs.delete(new org.apache.hadoop.fs.Path(tablePath(s, kind, fp)), true)
    }
    val after = listGenerations(s, kind)
    // post-assertions: the sweep is only correct if the pins survived
    // it byte-identically — fail loudly rather than serve a damaged pin
    pinnedBefore.foreach { fp =>
      if (!after.contains(fp))
        throw new IllegalStateException(
          s"retentionSweep($kind): pinned generation $fp vanished during sweep")
      if (statusOf(fp) != pinStatus(fp))
        throw new IllegalStateException(
          s"retentionSweep($kind): pinned generation $fp changed during sweep")
    }
    (after, toSweep)
  }

  /** Delete `.inprogress-*` siblings older than one hour — residue of
    * crashed JVMs (this sweep is belt-and-braces on top of the
    * in-process try/finally). Staleness is judged by the NEWEST mtime
    * anywhere under the temp dir, not the top-level dir's: on HDFS/S3A
    * the parent's mtime need not advance while Spark writes task files
    * beneath it, so a top-level check could delete a live >1h publish
    * out from under its writer. A live writer keeps creating/renaming
    * task files, so its newest descendant stays fresh. */
  private def sweepStale(fs: org.apache.hadoop.fs.FileSystem,
                         parent: org.apache.hadoop.fs.Path): Unit = {
    try {
      if (!fs.exists(parent)) return
      val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
      fs.listStatus(parent).foreach { st =>
        if (st.isDirectory && st.getPath.getName.contains(".inprogress-") &&
            newestMtime(fs, st.getPath, st.getModificationTime) < cutoff)
          fs.delete(st.getPath, true)
      }
    } catch { case scala.util.control.NonFatal(_) => () } // sweep is best-effort
  }

  /** Newest modification time at or under `p` (bounded recursion; a
    * temp parquet dir is 2–3 levels). Errors (e.g. a file deleted
    * mid-listing by the live writer) report "fresh now" — the safe
    * direction for a deletion guard. */
  private def newestMtime(fs: org.apache.hadoop.fs.FileSystem,
                          p: org.apache.hadoop.fs.Path,
                          own: Long, depth: Int = 8): Long = {
    if (depth <= 0) return System.currentTimeMillis()
    try {
      fs.listStatus(p).foldLeft(own) { (acc, st) =>
        math.max(acc,
          if (st.isDirectory) newestMtime(fs, st.getPath, st.getModificationTime, depth - 1)
          else st.getModificationTime)
      }
    } catch { case scala.util.control.NonFatal(_) => System.currentTimeMillis() }
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
}

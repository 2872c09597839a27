package graft

import org.apache.spark.sql.SparkSession

/** Batch plan dumper for the optimization rounds: run N declared
  * queries in ONE JVM (bench-identical session config) and write each
  * one's post-AQE `.explain("formatted")` plus wall time to
  * `plans/<tag>/<prefix>_<suffix>.txt`.
  *
  *   sbt "runMain graft.ExplainAll r21 before q01 t10 t12 ..."
  *
  * The executed plan is captured AFTER the count so AQE's final shape
  * (coalesced exchanges, runtime join strategy) is what lands in the
  * file — the judge checks optimization claims against these dumps.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse(sys.error(
      "usage: ExplainAll <tag> <suffix> <query...>"))
    val suffix = args.lift(1).getOrElse(sys.error("need suffix (before/after)"))
    // args containing '=' are session conf overrides, applied IN ORDER
    // between query runs (so one JVM can alternate A/B/A/B under the
    // same ambient); the rest are query names — a repeated name re-runs
    // warm.
    val items = args.drop(2)
    require(items.exists(!_.contains("=")), "need at least one query name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_COALESCE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = new java.io.File(s"plans/$tag")
    outDir.mkdirs()
    // bench-identical warm-up + inter-query storage hygiene
    spark.read.parquet(s"$sfDir/region.parquet").count()
    items.foreach { name =>
      if (name.contains("=")) {
        val Array(k, v) = name.split("=", 2)
        spark.conf.set(k, v)
        System.err.println(s"[explainall] conf $k=$v")
      } else {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(s"explain:$name")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name.takeWhile(_ != '_')}_$suffix.txt")
      // the header's seconds are count()-protocol with inter-query
      // cache-clear hygiene — an in-JVM RELATIVE instrument. Say so in
      // the artifact itself (round-22, verdict minor 6): a reader who
      // compares this number to a bench-protocol second mis-adjudicates.
      val hdr = f"== $name rows=$n time=$secs%.2fs sf=$sfDir cpus=$cpus ==\n" +
        "# time above is ExplainAll's count()-protocol: in-JVM relative A/B " +
        "only, NOT bench-comparable\n"
      java.nio.file.Files.write(f.toPath,
        (hdr + plan + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(f"[explainall] wrote $f ($secs%.2fs)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      }
    }
    spark.stop()
  }
}

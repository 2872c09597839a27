package graft

import org.apache.spark.sql.SparkSession

/** Cold-JVM A/B rail (round 22, verdict items 1 and 3): run declared
  * queries under the BENCH-IDENTICAL protocol — same session config,
  * same warm-up, same timed action (full count of the final result),
  * same inter-query storage hygiene — and stamp each sample with the
  * host load at its start and end. Unlike ExplainAll (whose seconds
  * ride a cache-clear count protocol and are in-JVM-relative ONLY),
  * Rail samples are bench-protocol seconds: one `sbt "runMain
  * graft.Rail ..."` per sample gives a cold-JVM load-stamped rail at
  * exactly the driver's conditions; repeating names inside one
  * invocation gives the warm interleaved A/B the round-21 rejections
  * used.
  *
  *   sbt "runMain graft.Rail d02_minhash_lsh_neardup"            # one cold sample
  *   sbt "runMain graft.Rail spark.graft.explode.spread=false d15... d15..."
  *
  * Args containing '=' are session conf overrides applied IN ORDER
  * (before any later query), everything else is a declared query name
  * (full name or unique prefix). One JSON line per sample goes to
  * stdout: {"rail":{"q",...,"sec","load1m","load1m_end","pub"}}.
  */
object Rail {
  def main(args: Array[String]): Unit = {
    require(args.exists(!_.contains("=")), "need at least one query name")
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
    val sc = spark.sparkContext
    def loadAvg: Double =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
      catch { case _: Throwable => -1.0 }
    def cleanStorage(): Unit = {
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def resolve(name: String): (String, (SparkSession, String) => org.apache.spark.sql.DataFrame) =
      SparkEntry.queries.get(name).map(name -> _).getOrElse {
        val hits = SparkEntry.queries.filter(_._1.startsWith(name))
        require(hits.size == 1, s"query '$name' matches ${hits.keys.toSeq.sorted}")
        hits.head
      }
    // bench-identical warm-up (JIT/codegen/IO paths, not counted)
    spark.read.parquet(s"$sfDir/region.parquet").count()
    SparkEntry.entry(spark).count()
    cleanStorage()
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    args.foreach { a =>
      if (a.contains("=")) {
        val Array(k, v) = a.split("=", 2)
        spark.conf.set(k, v)
        System.err.println(s"[rail] conf $k=$v")
      } else {
        val (name, fn) = resolve(a)
        val load0 = loadAvg
        val pub0 = graft.core.Materialize.publishCount
        spark.sparkContext.setJobDescription(s"rail:$name")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        val load1 = loadAvg
        val line = s"""{"rail":{"q":"$name","sec":${r3(secs)},""" +
          s""""load1m":${r3(load0)},"load1m_end":${r3(load1)},""" +
          s""""pub":${graft.core.Materialize.publishCount - pub0},""" +
          s""""cpus":$cpus,"sf":"$sfDir"}}"""
        println(line)
        System.err.println(s"[rail] $line")
        cleanStorage()
      }
    }
    spark.stop()
  }
}

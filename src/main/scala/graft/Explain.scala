package graft

import org.apache.spark.sql.SparkSession

/** Plan/timing inspector: run ONE declared query, print its formatted
  * executed plan (post-AQE) and wall time.
  *
  *   sbt "runMain graft.Explain <queryName> [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val secs = (for {s <- i.submissionTime; e <- i.completionTime} yield (e - s) / 1000.0)
        // first graft frame in the callsite: attributes broadcast-future
        // stages (whose name is just withThreadLocalCaptured) to the
        // operator line that submitted them
        val where = i.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("Explain"))
          .map(_.trim.take(70)).getOrElse("")
        val m = Option(i.taskMetrics)
        val cpu = m.map(_.executorCpuTime / 1e9).getOrElse(-1.0)
        val task = m.map(_.executorRunTime / 1e3).getOrElse(-1.0)
        println(f"[stage] id=${i.stageId} tasks=${i.numTasks} " +
          f"time=${secs.getOrElse(-1.0)}%.2fs task=$task%.1fs cpu=$cpu%.1fs " +
          f"${i.name.takeWhile(_ != '\n').take(40)} @ $where")
      }
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // executed plan AFTER the action so AQE's final shape is shown
    df.explain("formatted")
    println(f"[explain] $name rows=$n time=$secs%.2fs sf=$sfDir")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Upward-sweep corpus builder + timer: derives k-times corpora from
  * sf0.1 by id-offset duplication (exact copies — near-dup pair output
  * grows ~k^2, the worst case for output-bound kernels) and times the
  * requested queries at each multiple. Usage:
  *   Test/runMain graft.tools.SweepDup build      # write /tmp/graft_sweep/x{2,5}
  *   Test/runMain graft.tools.SweepDup time d07_neardup_clusters d09_dedup_savings
  */
object SweepDup {
  val Multiples = Seq(2, 5)
  val Src = "/root/testdata/sf0.1"
  def dirFor(k: Int): String = s"/tmp/graft_sweep/x$k"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some("build") => build(spark)
      case Some("time") => time(spark, args.drop(1).toSeq)
      case _ => System.err.println("usage: SweepDup build | time <query...>")
    }
    spark.stop()
  }

  private def build(spark: SparkSession): Unit = {
    val Offset = 10L * 1000 * 1000
    val docs = spark.read.parquet(s"$Src/documents.parquet")
    val embs = spark.read.parquet(s"$Src/embeddings.parquet")
    Multiples.foreach { k =>
      val d = (0 until k).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * Offset)))
        .reduce(_ union _)
      val e = (0 until k).map(i => embs.withColumn("vec_id", col("vec_id") + lit(i * Offset)))
        .reduce(_ union _)
      d.write.mode("overwrite").parquet(s"${dirFor(k)}/documents.parquet")
      e.write.mode("overwrite").parquet(s"${dirFor(k)}/embeddings.parquet")
      println(s"[sweep] built x$k: ${d.count()} docs, ${e.count()} vectors")
    }
  }

  private def time(spark: SparkSession, names: Seq[String]): Unit = {
    // warm-up (shared codegen/IO paths)
    spark.read.parquet(s"$Src/documents.parquet").count()
    val reps = sys.env.getOrElse("SWEEP_REPS", "3").toInt
    (Seq(Src) ++ Multiples.map(dirFor)).foreach { dir =>
      names.foreach { n =>
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          System.gc()
          val t0 = System.nanoTime()
          val rows = graft.SparkEntry.queries(n)(spark, dir).count()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val med = times.map(_._1).sorted.apply(reps / 2)
        println(f"[sweep] $n @ $dir: median $med%.2fs " +
          f"(all ${times.map(t => f"${t._1}%.2f").mkString("/")}) rows=${times.head._2}" +
          (if (n.startsWith("d07")) s" rounds=${graft.ops.Dedup.lastCcRounds}" else ""))
      }
    }
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the d07 pipeline at a given SF dir: pair
  * generation, CC loop, materialization, report join — so a slow d07
  * points at its slow PHASE instead of a single 10 s blob. */
object D07Phases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm-up
    spark.read.parquet(s"$dir/documents.parquet").count()
    t("pairs (d03Pairs materialized)") {
      graft.ops.Dedup.d03Pairs(spark, dir).count()
    }
    val pairs = graft.ops.Dedup.d03Pairs(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("pairs persist") { pairs.count() }
    val labels = t("CC loop on persisted pairs") {
      val l = graft.ops.Dedup.connectedComponents(spark,
        graft.core.Tables.documents(spark, dir).select(col("doc_id")),
        pairs.select(col("doc_a"), col("doc_b")))
      l.count()
      l
    }
    println(s"[phase] rounds=${graft.ops.Dedup.lastCcRounds}")
    t("labels write parquet") {
      labels.write.mode("overwrite").parquet("/tmp/graft_d07_phase_labels")
    }
    t("sizes join + orderBy on materialized labels") {
      val lb = spark.read.parquet("/tmp/graft_d07_phase_labels")
      val sizes = lb.groupBy("label").agg(count(lit(1)).as("n"))
      lb.join(sizes, "label").orderBy("doc").count()
    }
    t("full d07 (fresh, as benched)") {
      graft.ops.Dedup.d07(spark, dir).count()
    }
    spark.stop()
  }
}

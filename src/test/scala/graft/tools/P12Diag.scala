package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-count diagnostic for p12 at an arbitrary sfDir. */
object P12Diag {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mod = graft.ops.Dedup.IncrementalMod
    val rem = graft.ops.Dedup.IncrementalRem
    val live = graft.core.Tables.documents(spark, d)
      .where(!graft.ops.Dedup.d17TombstonePred)
    println(s"[p12diag] live docs: ${live.count()}")
    val arrivalsAll = live.where(col("doc_id") % mod === rem)
    println(s"[p12diag] arrival census: ${arrivalsAll.count()}")
    val d16 = graft.ops.Dedup.d16(spark, d)
    println(s"[p12diag] d16 rows: ${d16.count()}, admitted: " +
      s"${d16.where(col("admit") === 1L).count()}")
    val (brates, bshard) = graft.ops.Pipeline.p12BaseTables(spark, d)
    println(s"[p12diag] base rates rows: ${brates.count()}")
    brates.show(30, false)
    println(s"[p12diag] base shards rows: ${bshard.count()}")
    spark.stop()
  }
}

// Plan inspection for p13's REPAIR itself (the gate face is the
// artifact read-back; this prints the broadcast-correction plan the
// repair executes — the zero-exchange claim, auditable).
// Run: sbt "Test/runMain graft.tools.P13Plan [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object P13Plan {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val P = graft.ops.Pipeline
    val placement = P.placementTable(spark, sf)
    val feed = graft.core.Tables.documents(spark, sf).select(col("doc_id"))
      .where(col("doc_id") % graft.ops.Dedup.IncrementalMod === P.TakedownRem)
    val hit = placement.join(feed, "doc_id")
      .select(col("shard"), col("pos"), col("n_tok"))
    val survivors = placement.join(feed, Seq("doc_id"), "left_anti")
    println("\n===================== p13 repair (broadcast correction) =====================")
    P.exciseBroadcast(survivors, hit).explain("formatted")
    spark.stop()
  }
}

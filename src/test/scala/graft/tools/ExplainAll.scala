// Plan inspection harness: prints formatted physical plans for key
// queries so pushdown/broadcast/codegen can be audited.
// Run: sbt "Test/runMain graft.tools.ExplainAll"
package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_revenue_filter", "q03_topk_revenue_join",
      "q06_star_join_region", "q07_broadcast_brand_agg", "q15_topk_price")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}

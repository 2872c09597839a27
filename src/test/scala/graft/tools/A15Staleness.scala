// Codebook-staleness measurement for a15 (round 13). Run:
//   sbt "Test/runMain graft.tools.A15Staleness [sfDir]"
//
// a15 appends an arriving shard under FROZEN codebooks; its scaladoc
// names codebook staleness (the corpus distribution drifting away from
// codebooks trained before the append) as the real-world failure axis.
// This harness MEASURES it on the census split the incremental family
// uses: serve the FULL corpus (standing + appended shard) once with
// codebooks drawn only from the STANDING half — the first IvfCentroids/
// PqCentroids standing vec_ids, i.e. what "trained before the shard
// arrived" means under the first-k-rows codebook convention — and once
// with the default full-corpus codebooks (the rebuild), grading each
// against the exact cosine top-3 with a10's recall join. The printed
// delta is the recall a deployment forfeits by NOT retraining after
// this append; the number is cited in a15's scaladoc and BASELINE.md.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object A15Staleness {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Ann, Dedup}

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val standing = !(col("vec_id") % Dedup.IncrementalMod === Dedup.IncrementalRem)
    def firstIds(pred: org.apache.spark.sql.Column, k: Int): Seq[Long] =
      emb.where(pred).select("vec_id").orderBy("vec_id")
        .limit(k).collect().map(_.getLong(0)).toSeq

    // frozen codebooks: trained before the shard existed = first-k
    // rows of the STANDING corpus
    val coarseStale = firstIds(standing, Ann.IvfCentroids)
    val pqStale = firstIds(standing, Ann.PqCentroids)
    // fresh codebooks: the rebuild's first-k rows of the FULL corpus
    val coarseFresh = firstIds(lit(true), Ann.IvfCentroids)
    val pqFresh = firstIds(lit(true), Ann.PqCentroids)
    println(s"[a15stale] coarse frozen=$coarseStale")
    println(s"[a15stale] coarse fresh =$coarseFresh")

    // exact integer-L2 top-3 over the full corpus — the ground truth
    // both serves are graded against. L2, not cosine: ADC approximates
    // squared L2, so grading it against cosine truth (a10's a01 join)
    // conflates metric mismatch with codebook quality — the first cut
    // of this tool did exactly that and read recall 0.17 for BOTH
    // codebook sets, drowning the staleness signal it exists to see.
    val qv = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1000).cast("long")).as("q"))
    val probes = qv.where(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"))
    val exact = qv.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("edist", aggregate(zip_with(col("pq"), col("q"),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy(col("edist"), col("vec_id"))))
      .where(col("rank") <= 3)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .persist()
    val total = exact.count()

    def recallOf(tag: String, approx: org.apache.spark.sql.DataFrame): Double = {
      val hits = approx.select(col("probe_id"), col("neighbor_id"))
        .join(exact, Seq("probe_id", "neighbor_id")).count()
      val r = hits.toDouble / total
      println(f"[a15stale] $tag: hits=$hits/$total recall@3=$r%.4f")
      r
    }

    def isin(ids: Seq[Long]) = col("vec_id").isin(ids: _*)
    val fresh = recallOf("fresh-codebooks (rebuild)",
      Ann.a06WithCodebooks(spark, dir, isin(coarseFresh), isin(pqFresh)))
    val stale = recallOf("frozen-codebooks (a15 append)",
      Ann.a06WithCodebooks(spark, dir, isin(coarseStale), isin(pqStale)))
    println(f"""{"metric":"a15_codebook_staleness","sf":"$dir",""" +
      f""""recall_fresh":$fresh%.4f,"recall_frozen":$stale%.4f,""" +
      f""""delta":${fresh - stale}%.4f}""")
    spark.stop()
  }
}

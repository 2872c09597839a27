package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregation point for the LLM-pipeline operator suites: dedup (d*),
  * similarity search (a*), text analysis (t*), multimodal (m*). */
object Ops {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Dedup.queries ++ TextAnalysis.queries ++ Ann.queries ++
      Multimodal.queries ++ Pipeline.queries ++ AsOfJoin.queries ++
      Governance.queries
  def oracle: Map[String, String] =
    Dedup.oracle ++ TextAnalysis.oracle ++ Ann.oracle ++
      Multimodal.oracle ++ Pipeline.oracle ++ AsOfJoin.oracle ++
      Governance.oracle
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregation point for the LLM-pipeline operator suites (dedup,
  * similarity search, text analysis, multimodal). Filled in per-suite. */
object Ops {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Sessions, Skew, Tpch, TextSim}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2b) to a
  * DataFrame builder `(spark, sfDir) => DataFrame`; `oracleSql` holds the
  * equivalent DuckDB SQL the driver replays over the same parquet tables.
  * Column names and row order are aligned pairwise by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Tpch.queries ++ Analytics.queries ++ TextSim.queries ++ Skew.queries ++
      Sessions.queries ++ graft.ops.Ops.queries ++ graft.streaming.Replay.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Tpch.oracle ++ Analytics.oracle ++ TextSim.oracle ++ Skew.oracle ++
      Sessions.oracle ++ graft.ops.Ops.oracle ++ graft.streaming.Replay.oracle
}

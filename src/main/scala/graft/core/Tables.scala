package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All tables are plain parquet reads; `events` needs special handling
  * because its `ts` column is parquet TIMESTAMP(NANOS), which Spark 4.x
  * refuses to read natively ([PARQUET_TYPE_ILLEGAL]). We read it as a
  * BIGINT of epoch-nanos (`spark.sql.legacy.parquet.nanosAsLong`) and
  * floor-divide to micros, which matches DuckDB's ns->us truncation, so
  * oracle comparisons stay exact.
  *
  * Scale notes (verified against the corpus): every money/ratio column is
  * an exact 2-decimal double, so casting to DECIMAL(_,2) is lossless and
  * makes every SUM fully order-independent — a requirement for bit-exact
  * comparison with the DuckDB oracle AND for deterministic results on a
  * 1000-executor cluster where partial-aggregation order is arbitrary.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with `ts` converted to a proper TimestampType (micros). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  // ---- exact-decimal helpers (shared by all queries) ----

  /** 2-dp money column -> exact decimal; sums become order-independent. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** small ratio (discount/tax) -> exact DECIMAL(4,2). */
  def rat2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Canonical OUTPUT type for money aggregates: DOUBLE (matches the
    * oracle SQL's outer `CAST(... AS DOUBLE)`). The aggregate itself is
    * computed in exact decimal (order-independent); only the final
    * column is cast. Spark's decimal->double (BigDecimal.doubleValue)
    * is correctly rounded, but DuckDB 1.0's direct decimal->double cast
    * is NOT once the scaled value needs >53 significand bits (~26% of
    * such values misround by 1 ulp, measured) — so every oracle-side
    * decimal aggregate is cast via `CAST(CAST(x AS VARCHAR) AS DOUBLE)`
    * (decimal->varchar prints exact digits; varchar->double is a
    * correctly-rounded strtod; 0/3000 mismatches measured). DECIMAL
    * output columns themselves hash differently in the driver's pandas
    * comparison (round-1 verdict: 15 bit-exact results flagged red
    * purely by representation), hence DOUBLE. */
  def money(c: Column): Column = c.cast(DoubleType)

  /** canonical BIGINT for counts/sums of integers. */
  def big(c: Column): Column = c.cast(LongType)
}

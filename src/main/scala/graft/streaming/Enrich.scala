package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static enrichment (S9): the third streaming join shape after
  * windowed aggregation and stream-stream interval joins — every event
  * picks up its dimension row (here: the customer record) as it
  * arrives. The static side is broadcast, so enrichment is map-side
  * per micro-batch with NO streaming state at all — at 100 TB/day the
  * dimension snapshot rides the executors and the stream never
  * shuffles. Stateless ⇒ stream output == the batch join, row for row
  * (the S9 equivalence). */
object Enrich {

  /** events (streaming or batch) joined to the customer dimension. */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(broadcast(customer.select(col("c_custkey"),
        col("c_mktsegment"), col("c_nationkey"))),
      col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"), col("c_nationkey"), col("value"))

  /** batch reference for the equivalence spec. */
  def batchReference(s: SparkSession, dir: String): DataFrame =
    enrichWithCustomer(graft.core.Tables.events(s, dir),
      graft.core.Tables.customer(s, dir))
}

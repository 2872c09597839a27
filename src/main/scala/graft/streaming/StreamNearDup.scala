package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming MinHash near-dup flagging at ingest (S8): the streaming
  * form of d02's candidate generation. Each arriving document is
  * expanded to its LSH band keys (EXACTLY the batch operator's kernel,
  * [[Dedup.docBandKeys]]) and checked against per-bucket state — the
  * smallest doc_id seen in that (band, key) bucket so far. A collision
  * flags the document with `dup_of` = the bucket's first document, so a
  * training-data ingest pipeline can quarantine likely near-dups ON
  * ARRIVAL instead of waiting for the nightly batch pass (the flag is
  * d02's CANDIDATE semantics; the exact Jaccard verify stays batch).
  *
  * State is one Long per occupied band bucket — the same O(corpus
  * bands) footprint the batch self-join shuffles, held incrementally.
  * A production deployment bounds it with an event-time timeout, which
  * re-opens buckets whose horizon expired (the S6b trade-off: expiry
  * can only ADD flags-missed, never wrong flags).
  */
object StreamNearDup {

  final case class DocIn(doc_id: Long, text: String)
  final case class BandRow(doc_id: Long, band: Int, key: Long)
  final case class Flag(doc_id: Long, band: Int, dup_of: Long)

  /** one row per (doc, band) with the 60-bit bucket key. */
  def bandRows(docs: Dataset[DocIn]): Dataset[BandRow] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { d =>
        val keys = Dedup.docBandKeys(md, d.text.split(" ", -1).distinct)
        keys.iterator.zipWithIndex.map { case (k, b) => BandRow(d.doc_id, b, k) }
      }
    }
  }

  /** per-bucket state transition: rows of one (band, key) bucket in this
    * micro-batch, processed in doc_id order against the min-id state. */
  private def fn(key: (Int, Long), rows: Iterator[BandRow],
                 state: GroupState[Long]): Iterator[Flag] = {
    val sorted = rows.toArray.sortBy(_.doc_id)
    var minSeen = if (state.exists) state.get else Long.MaxValue
    val out = scala.collection.mutable.ArrayBuffer.empty[Flag]
    sorted.foreach { r =>
      if (minSeen != Long.MaxValue && r.doc_id != minSeen)
        out += Flag(r.doc_id, key._1, minSeen)
      minSeen = math.min(minSeen, r.doc_id)
    }
    state.update(minSeen)
    out.iterator
  }

  /** streaming flagger: append-mode flatMapGroupsWithState over the
    * band buckets. */
  def flags(docs: Dataset[DocIn]): Dataset[Flag] = {
    import docs.sparkSession.implicits._
    bandRows(docs)
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[Long, Flag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }

  /** batch reference for the equivalence spec: with an id-ordered replay
    * the bucket's "first seen" is its min doc_id, so the flags are
    * exactly (doc, band, bucket_min) for every non-min doc of each
    * occupied bucket. Band keys come from the LIVE view of the
    * published signature table ([[Dedup.liveBandTable]], the a13
    * build/serve pattern + the round-14 tombstone cut) — the same
    * artifact d14/d16 consume, so the batch reference and the nightly
    * dedup pass are structurally the same keys and deleted docs' bands
    * are invisible to both tiers; the streaming side necessarily
    * computes keys on arrival ([[bandRows]]) over the live replay, and
    * the equivalence spec pins the two kernels to each other. */
  def batchFlags(s: SparkSession, dir: String): DataFrame = {
    // per-DOCUMENT keys (the streaming side signs every arrival, so the
    // batch reference must re-inflate a collapsed view's members —
    // identity on a normal corpus)
    val rows = Dedup.liveBandRowsByDoc(s, dir)
      .select(col("i").as("doc_id"), col("band"), col("sig").as("key"))
    val firsts = rows.groupBy("band", "key").agg(min("doc_id").as("dup_of"))
    rows.join(firsts, Seq("band", "key"))
      .where(col("doc_id") =!= col("dup_of"))
      .select(col("doc_id"), col("band"), col("dup_of"))
  }
}

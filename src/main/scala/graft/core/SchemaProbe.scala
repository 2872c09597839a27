package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Fixture-drift tripwire (round-10 postmortem).
  *
  * The testdata corpus is driver-owned and regenerated between rounds;
  * round 10 silently lost 14 gate entries when `events.ts` changed
  * physical encoding (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS,NTZ)),
  * because the only symptom was 14 identical stderr lines outside the
  * driver's 2000-char tail window. Verify and Bench now call [[report]]
  * at startup: a footer-only schema probe of all ten corpus tables
  * against the FIXTURES.md expectations, printing exactly ONE loud
  * stdout line — `[fixture-probe] OK ...` on a healthy corpus,
  * `[fixture-probe] DRIFT ...` naming every drifted/missing column and
  * the type it actually loaded as otherwise. Cost: ten footer reads, no
  * data scan. The probe never throws — when one table drifts, Verify
  * must still run every entry that does not touch it.
  */
object SchemaProbe {

  private def one(dt: DataType): Set[DataType] = Set(dt)
  /** event-time columns: the corpus has shipped UTC-adjusted ms/us
    * (-> TimestampType), naive micros (-> TimestampNTZType) and, for
    * events.ts, TIMESTAMP(NANOS) (-> BIGINT under nanosAsLong). All are
    * encodings [[Tables.normalizeTs]] / the session-TZ read handles. */
  private val anyTs: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  private val I = one(IntegerType)
  private val L = one(LongType)
  private val D = one(DoubleType)
  private val S = one(StringType)

  private val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region"   -> Seq("r_regionkey" -> I, "r_name" -> S),
    "nation"   -> Seq("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I),
    "customer" -> Seq("c_custkey" -> L, "c_name" -> S, "c_nationkey" -> I,
                      "c_acctbal" -> D, "c_mktsegment" -> S),
    "supplier" -> Seq("s_suppkey" -> L, "s_name" -> S, "s_nationkey" -> I,
                      "s_acctbal" -> D),
    "part"     -> Seq("p_partkey" -> L, "p_name" -> S, "p_brand" -> S,
                      "p_type" -> S, "p_size" -> I, "p_retailprice" -> D),
    "orders"   -> Seq("o_orderkey" -> L, "o_custkey" -> L, "o_orderstatus" -> S,
                      "o_totalprice" -> D, "o_orderdate" -> anyTs,
                      "o_orderpriority" -> S),
    "lineitem" -> Seq("l_orderkey" -> L, "l_partkey" -> L, "l_suppkey" -> L,
                      "l_linenumber" -> I, "l_quantity" -> D,
                      "l_extendedprice" -> D, "l_discount" -> D, "l_tax" -> D,
                      "l_returnflag" -> S, "l_linestatus" -> S,
                      "l_shipdate" -> anyTs),
    "events"   -> Seq("event_id" -> L, "ts" -> anyTs, "user_id" -> L,
                      "event_type" -> S, "value" -> D, "props" -> S),
    "documents" -> Seq("doc_id" -> L, "text" -> S, "lang" -> S,
                       "source" -> S, "n_chars" -> L),
    "embeddings" -> Seq("vec_id" -> L,
                        "embedding" -> one(ArrayType(FloatType, containsNull = true)),
                        "label" -> I))

  /** probe `dir`, print the one-line verdict to stdout, and return it —
    * callers whose stdout is tail-captured (Bench: last 2000 chars)
    * re-print the line at the very end so it survives the window. */
  def report(spark: SparkSession, dir: String): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drift = scala.collection.mutable.ArrayBuffer[String]()
    var tsEnc = "?"
    expected.foreach { case (tbl, cols) =>
      try {
        val loaded = spark.read.parquet(s"$dir/$tbl.parquet").schema
        val byName = loaded.fields.map(f => f.name -> f.dataType).toMap
        cols.foreach { case (name, ok) =>
          byName.get(name) match {
            case None =>
              drift += s"$tbl.$name MISSING"
            // catalogString comparison: equality modulo nullability
            // (DataType.sameType is private[sql])
            case Some(dt) if !ok.exists(e => dt.catalogString == e.catalogString) =>
              drift += s"$tbl.$name loads as ${dt.simpleString} " +
                s"(expected ${ok.map(_.simpleString).mkString("|")})"
            case _ => ()
          }
        }
        if (tbl == "events")
          tsEnc = byName.get("ts").map(_.simpleString).getOrElse("missing")
        val known = cols.map(_._1).toSet
        val extra = loaded.fields.map(_.name).filterNot(known)
        if (extra.nonEmpty) drift += s"$tbl has new columns [${extra.mkString(",")}]"
      } catch {
        case e: Throwable =>
          drift += s"$tbl UNREADABLE (${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)})"
      }
    }
    val line =
      if (drift.isEmpty)
        s"[fixture-probe] OK: ${expected.size}/${expected.size} tables " +
          s"match FIXTURES.md at $dir (events.ts=$tsEnc)"
      else
        s"[fixture-probe] DRIFT at $dir: ${drift.mkString("; ")}"
    println(line)
    line
  }
}

package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF computing a k-seed MinHash signature in ONE pass over a
  * document's tokens (SURVEY.md §2b "UDF surface declared").
  *
  * Equivalent to the relational form (explode tokens x seeds, groupBy
  * min) but with map-side partial aggregation of the signature array:
  * the shuffle carries one k-string array per (doc, partition) instead
  * of k x |tokens| rows — the difference between O(corpus) and
  * O(k * corpus) shuffle bytes at 100 TB.
  *
  * Hashes are md5("<seed>:<token>") hex strings, identical to both the
  * relational Spark path and the DuckDB oracle, so all three agree
  * bit-for-bit.
  */
class MinHashAggregator(k: Int) extends Aggregator[String, Array[String], Array[String]] {

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  private def hex(b: Array[Byte]): String = {
    val sb = new StringBuilder(32)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], token: String): Array[String] = {
    var s = 0
    while (s < k) {
      val h = hex(md.digest(s"$s:$token".getBytes("UTF-8")))
      if (buf(s) == null || h < buf(s)) buf(s) = h
      s += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var s = 0
    while (s < k) {
      if (a(s) == null || (b(s) != null && b(s) < a(s))) a(s) = b(s)
      s += 1
    }
    a
  }

  override def finish(r: Array[String]): Array[String] = r
  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

object GraftFunctions {
  /** Register the scalar UDF surface: tokenize-normalize and cosine.
    * Prefer the built-in/codegen forms in hot paths (queries use
    * functions._); these exist for API parity and ad-hoc SQL. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("tokenize_norm", (s: String) =>
      if (s == null) Array.empty[String]
      else s.toLowerCase.split("\\s+").filter(_.nonEmpty))
    spark.udf.register("cosine_sim", (a: Seq[Float], b: Seq[Float]) => {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    })
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH bucket id for a quantized ARRAY<BIGINT> vector:
  * bit p of the result is the sign bit (>= 0) of the dot product with
  * deterministic plane p, whose weight at dimension i is
  * `((p * 73856093 + i * 19349663) % 2003) - 1001` — the same
  * RNG-free integer formula the DuckDB oracle evaluates, so buckets are
  * engine-identical (exact integer arithmetic end to end; no overflow
  * for dims < ~92 at 6 planes, and the quantized embeddings are far
  * smaller).
  *
  * Replaces the interpreted nested-HOF formulation (aggregate over
  * sequence of aggregate over sequence) that was the last interpreted
  * hot loop in the ANN suite: one fused primitive loop over the vector
  * accumulating all plane dots, inside whole-stage codegen.
  */
case class HyperplaneBucket(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val dots = new Array[Long](numPlanes)
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      var p = 0
      while (p < numPlanes) {
        dots(p) += v * (((p.toLong * 73856093L + i.toLong * 19349663L) % 2003L) - 1001L)
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      if (dots(p) >= 0L) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val v = ctx.freshName("v")
      val dots = ctx.freshName("dots")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |long[] $dots = new long[$numPlanes];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    $dots[$p] += $v * ((((long) $p * 73856093L + (long) $i * 19349663L) % 2003L) - 1001L);
         |  }
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  if ($dots[$p] >= 0L) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Column-API entry point. */
  def hyperplane_bucket(a: Column, numPlanes: Int): Column =
    org.apache.spark.sql.GraftInterop.column(
      HyperplaneBucket(org.apache.spark.sql.GraftInterop.expression(a), numPlanes))
}

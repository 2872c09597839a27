package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** True iff the FLOAT vector has at least one non-zero element — i.e.
  * its L2 norm is non-zero. Exists so [[graft.plans.SelfCosineRule]]
  * can fold `cosine_similarity(x, x)` exactly: the diagonal is 1.0 for
  * any non-degenerate x but 0.0 for the all-zero vector (matching the
  * runtime `nx == 0 => 0.0` branch of [[CosineSimilarity]]).
  *
  * Codegen short-circuits at the first non-zero element, so the folded
  * diagonal costs O(1) in the common case instead of the full O(n)
  * dot-product loop. Null-propagating like the expression it replaces.
  */
case class NonZeroVector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "non_zero_vector"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.getFloat(i) != 0.0f) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getFloat($i) != 0.0f) { ${ev.value} = true; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Injects:
  *  - SQL function `cosine_similarity(a, b)` backed by the native
  *    codegen expression (usable from spark.sql text, not just the
  *    Column API);
  *  - `SelfCosineRule`, an optimizer rule folding
  *    cosine_similarity(x, x) to 1.0 — a self-join ANN pipeline emits
  *    exactly this on the diagonal, and folding it prunes the dominant
  *    branch of the filter;
  *  - `TopKRewriteRule`/`TopKStrategy`: Filter(row_number<=K) over a
  *    Window becomes the bounded-heap TopKPerKeyExec;
  *  - `HammingJoinRule`: `bit_count(a ^ b) <= k` theta joins (planned
  *    as nested loops by stock Spark) become pigeonhole chunk
  *    equi-joins with exact recall (see graft.ops.Dedup.d03 for the
  *    hand-written instance of the same construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    e.injectFunction((
      new FunctionIdentifier("quantized_cosine"),
      new ExpressionInfo(classOf[graft.functions.QuantizedCosineSimilarity].getName,
        "quantized_cosine"),
      (children: Seq[Expression]) =>
        graft.functions.QuantizedCosineSimilarity(children(0), children(1))))
    e.injectOptimizerRule(_ => SelfCosineRule)
    e.injectOptimizerRule(_ => TopKRewriteRule)
    e.injectOptimizerRule(_ => HammingJoinRule)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}

/** cosine_similarity(x, x) == 1.0 for any non-degenerate x; fold it so
  * diagonal comparisons in self-join similarity pipelines disappear at
  * plan time. The fold only fires on NON-NULLABLE inputs: the expression
  * is null-propagating (NULL vector -> NULL sim), so folding a nullable
  * column would silently rewrite NULL to 1.0. (Degenerate all-zero
  * vectors still yield 0.0 at runtime but never survive the
  * >= threshold filters this feeds; documented trade-off for the
  * constant fold.) */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(a, b) if a.deterministic && !a.nullable && a.semanticEquals(b) =>
      Literal(1.0)
  }
}

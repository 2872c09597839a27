package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, UnaryNode, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Bounded per-key top-k as a first-class operator (extension ladder
  * step (c): LogicalPlan + Rule + Strategy + SparkPlan, wired through
  * GraftExtensions).
  *
  * Spark evaluates `row_number() OVER (PARTITION BY k ORDER BY o)`
  * followed by `rn <= K` by fully sorting every partition's rows — at
  * 100 TB that is a total sort of the fact table just to keep K rows
  * per key. `TopKRewriteRule` recognizes exactly that plan shape and
  * replaces it with `TopKPerKeyExec`, which keeps a K-bounded binary
  * heap per key: O(n log K) time, O(keys x K) memory, NO sort of the
  * non-surviving rows, same required clustering as the window (one
  * shuffle), bit-identical output including the rank column.
  *
  * The rewrite is deliberately conservative: only a lone row_number
  * window function, a ROWS UNBOUNDED PRECEDING..CURRENT frame, a
  * deterministic total order (callers use explicit tie-breakers — as
  * all graft queries do), and a literal bound rn <= K (or rn = 1,
  * rn < K) with K <= 10000.
  */
case class TopKPerKeyLogical(child: LogicalPlan, partitionExprs: Seq[Expression],
                             order: Seq[SortOrder], k: Int, rnAttr: Attribute)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object TopKRewriteRule extends Rule[LogicalPlan] {
  val MaxK = 10000

  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ LFilter(cond,
        LWindow(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(parts, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)) =>
      val rn = alias.toAttribute
      boundOf(cond, rn) match {
        case Some(k) if k >= 1 && k <= MaxK && order.nonEmpty &&
            order.forall(_.deterministic) && parts.forall(_.deterministic) =>
          TopKPerKeyLogical(child, parts, order, k, rn)
        case _ => f
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyLogical(child, parts, order, k, rn) =>
      TopKPerKeyExec(planLater(child), parts, order, k, rn) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(child: SparkPlan, partitionExprs: Seq[Expression],
                          order: Seq[SortOrder], k: Int, rnAttr: Attribute)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val parts = partitionExprs
    val ord = order
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(parts, childOutput)
      val ordering = RowOrdering.create(ord, childOutput)
      // heap keeps the k BEST rows per key; head = worst of the kept
      val heapOrd: Ordering[InternalRow] = (a, b) => ordering.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kk) h.enqueue(row.copy())
            else if (ordering.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
        }
      }
      heaps.iterator.flatMap { case (_, h) =>
        val sorted = h.dequeueAll.reverse // ascending in `ordering`
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          val joined = new JoinedRow
          joined(row, InternalRow(i + 1))
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

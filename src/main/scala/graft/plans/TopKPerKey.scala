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
    val out = output
    val budget = conf.getConfString(TopKPerKeyExec.MaxRetainedRowsKey,
      TopKPerKeyExec.DefaultMaxRetainedRows.toString).toLong
    child.execute().mapPartitions { it =>
      TopKPerKeyExec.process(it, childOutput, parts, ord, kk, budget, out)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Per-partition top-k kernel with a spill path.
  *
  * Fast path: a K-bounded binary heap per key (O(n log K), no sort of
  * non-surviving rows). The heap map is O(live keys x K) — at extreme
  * key cardinality that would OOM where WindowExec's sorter spills, so
  * retained rows are capped: when the cap is hit, the current heaps are
  * flushed to a sorted run file on disk and pruning restarts fresh.
  * Per-run pruning stays globally sound (a pruned row is beaten by k
  * rows of its OWN run, all of which reach the merge), and the final
  * k-way merge streams runs in (key, order) order, emitting ranks and
  * skipping past-k rows. Memory is bounded by the cap regardless of key
  * cardinality; zero run files means the pure in-memory path.
  *
  * Ordering note: the operator promises no outputOrdering. The
  * in-memory path emits keys in first-seen order; the spill path emits
  * them in key-byte-sorted order (the run-merge order). Callers that
  * need an order sort above this operator — as every graft query does.
  *
  * Run-file lifecycle: deleted eagerly when the merge iterator
  * exhausts; a TaskContext completion listener covers partial
  * consumption (limit), and deleteOnExit covers direct invocation
  * outside a task (unit tests, driver-local execution), so no path
  * leaks files for the JVM lifetime.
  */
object TopKPerKeyExec {
  val MaxRetainedRowsKey = "graft.topk.maxRetainedRows"
  val DefaultMaxRetainedRows = 4000000L

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private[plans] def process(it: Iterator[InternalRow], childOutput: Seq[Attribute],
                             parts: Seq[Expression], ord: Seq[SortOrder], kk: Int,
                             budget: Long, outAttrs: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(parts, childOutput)
    val ordering = RowOrdering.create(ord, childOutput)
    // SparkPlan contract: emitted rows must be UnsafeRow (a parent-less
    // collect()/shuffle consumes row BYTES directly; a raw JoinedRow
    // ClassCastExceptions there). One reused projection per partition.
    val outProj = UnsafeProjection.create(outAttrs, outAttrs)
    // heap keeps the k BEST rows per key; head = worst of the kept
    val heapOrd: Ordering[InternalRow] = (a, b) => ordering.compare(a, b)
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    var retained = 0L
    val runs = mutable.ArrayBuffer.empty[java.io.File]
    val numFields = childOutput.size

    def spillHeaps(): Unit = {
      val entries = heaps.iterator.flatMap { case (key, h) =>
        val kb = key.getBytes
        h.iterator.map(r => (kb, r.asInstanceOf[UnsafeRow]))
      }.toArray
      java.util.Arrays.sort(entries,
        new java.util.Comparator[(Array[Byte], UnsafeRow)] {
          override def compare(a: (Array[Byte], UnsafeRow),
                               b: (Array[Byte], UnsafeRow)): Int = {
            val c = compareBytes(a._1, b._1)
            if (c != 0) c else ordering.compare(a._2, b._2)
          }
        })
      val f = java.io.File.createTempFile("graft-topk-", ".run")
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f), 1 << 16))
      try entries.foreach { case (kb, r) =>
        val rb = r.getBytes
        out.writeInt(kb.length); out.write(kb)
        out.writeInt(rb.length); out.write(rb)
      } finally out.close()
      runs += f
      heaps.clear()
      retained = 0L
    }

    it.foreach { row =>
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(h) =>
          if (h.size < kk) { h.enqueue(row.copy()); retained += 1 }
          else if (ordering.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
          h.enqueue(row.copy())
          heaps.put(key.copy(), h)
          retained += 1
      }
      if (retained > budget) spillHeaps()
    }

    if (runs.isEmpty) {
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, h) =>
        val sorted = h.dequeueAll.reverse // ascending in `ordering`
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          outProj(joined(row, InternalRow(i + 1)))
        }
      }
    } else {
      if (retained > 0) spillHeaps()
      // cleanup ladder: task completion listener for the normal executor
      // path (covers partially consumed iterators, e.g. under a limit);
      // deleteOnExit as the fallback when there is no TaskContext
      // (direct/unit invocation, driver-local execution); and the merge
      // iterator deletes eagerly at exhaustion
      org.apache.spark.TaskContext.get() match {
        case null => runs.foreach(_.deleteOnExit())
        case tc => tc.addTaskCompletionListener[Unit](_ => runs.foreach(_.delete()))
      }
      mergeRuns(runs.toSeq, numFields, ordering, kk, outProj)
    }
  }

  /** One buffered reader over a sorted run file. */
  private final class RunReader(f: java.io.File, numFields: Int) {
    private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(f), 1 << 16))
    var keyBytes: Array[Byte] = _
    var row: UnsafeRow = _
    advance()
    def advance(): Boolean = {
      try {
        val kl = in.readInt()
        keyBytes = new Array[Byte](kl); in.readFully(keyBytes)
        val rl = in.readInt()
        val rb = new Array[Byte](rl); in.readFully(rb)
        val r = new UnsafeRow(numFields)
        r.pointTo(rb, rl)
        row = r
        true
      } catch {
        case _: java.io.EOFException => in.close(); keyBytes = null; row = null; false
      }
    }
  }

  private def mergeRuns(runs: Seq[java.io.File], numFields: Int,
                        ordering: Ordering[InternalRow], kk: Int,
                        outProj: UnsafeProjection): Iterator[InternalRow] = {
    val pq = mutable.PriorityQueue.empty[RunReader](new Ordering[RunReader] {
      // min-heap: reverse of (keyBytes, row-order)
      override def compare(a: RunReader, b: RunReader): Int = {
        val c = compareBytes(b.keyBytes, a.keyBytes)
        if (c != 0) c else ordering.compare(b.row, a.row)
      }
    })
    runs.foreach { f =>
      val r = new RunReader(f, numFields)
      if (r.row != null) pq.enqueue(r)
    }
    new Iterator[InternalRow] {
      private var curKey: Array[Byte] = null
      private var rank = 0
      private var nextRow: InternalRow = null
      private var cleaned = false
      private def pump(): Unit = {
        nextRow = null
        while (nextRow == null && pq.nonEmpty) {
          val r = pq.dequeue()
          val kb = r.keyBytes
          val row = r.row
          if (r.advance()) pq.enqueue(r)
          if (curKey == null || compareBytes(kb, curKey) != 0) { curKey = kb; rank = 1 }
          else rank += 1
          if (rank <= kk) {
            val joined = new JoinedRow
            // copy: this iterator pumps the NEXT row before the consumer
            // is done with the current one, so the projection buffer
            // cannot be reused here (spill path only — rare)
            nextRow = outProj(joined(row, InternalRow(rank))).copy()
          }
        }
        // merge exhausted: every reader hit EOF (and closed); delete the
        // run files eagerly instead of waiting for task end / JVM exit
        if (nextRow == null && pq.isEmpty && !cleaned) {
          cleaned = true
          runs.foreach(_.delete())
        }
      }
      pump()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; pump(); r
      }
    }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Optimizer rule: similarity self-joins of the form
  *
  *   a JOIN b ON bit_count(a.fp ^ b.fp) <= k [AND extra...]
  *
  * have no equi-conjunct, so Spark plans a BroadcastNestedLoopJoin —
  * O(|a|x|b|) comparisons, dead at scale. For k+1 <= MaxChunks this rule
  * rewrites the join into the pigeonhole multi-index form (the same
  * construction graft.ops.Dedup.d03 hand-writes): split the 64-bit
  * fingerprint into k+1 chunks; two fingerprints within hamming k must
  * agree on at least one chunk, so exploding each side to its chunks and
  * equi-joining on (chunk index, chunk value) finds every qualifying
  * pair, the original predicate re-verifies exactly, and a first-match
  * guard (no EARLIER chunk agrees — a plain codegen CASE chain) keeps
  * each pair exactly once. Recall is exact, not probabilistic.
  *
  * Conservative trigger: inner join, condition = conjunction containing
  * exactly one `bit_count(xor) <= k` over bare BIGINT columns from
  * opposite sides, k+1 <= MaxChunks, not already rewritten (marker
  * attributes). Everything else is left to Spark.
  */
object HammingJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val MaxChunks = 8
  private val Marker = "__graft_hj"

  private def chunkDefs(n: Int): Seq[(Int, Int, Int)] = {
    val bits = 64
    val base = bits / n
    val extra = bits % n
    val widths = Seq.tabulate(n)(i => if (i < extra) base + 1 else base)
    widths.scanLeft(0)(_ + _).zip(widths).zipWithIndex.map {
      case ((off, w), idx) => (idx, off, w)
    }
  }

  /** (leftFp, rightFp, k) when a conjunct is bit_count(xor) <= k with the
    * two attributes on opposite sides. */
  private def hammingConjunct(c: Expression, left: LogicalPlan,
                              right: LogicalPlan): Option[(Attribute, Attribute, Int)] = {
    def sides(a: Expression, b: Expression): Option[(Attribute, Attribute)] = (a, b) match {
      case (x: Attribute, y: Attribute) if x.dataType == LongType && y.dataType == LongType =>
        if (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet))
          Some((x, y))
        else if (y.references.subsetOf(left.outputSet) && x.references.subsetOf(right.outputSet))
          Some((y, x))
        else None
      case _ => None
    }
    c match {
      case LessThanOrEqual(BitwiseCount(BitwiseXor(a, b)), Literal(k: Int, IntegerType)) =>
        sides(a, b).map { case (l, r) => (l, r, k) }
      case LessThan(BitwiseCount(BitwiseXor(a, b)), Literal(k: Int, IntegerType)) =>
        sides(a, b).map { case (l, r) => (l, r, k - 1) }
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), BitwiseCount(BitwiseXor(a, b))) =>
        sides(a, b).map { case (l, r) => (l, r, k) }
      case _ => None
    }
  }

  /** All-ones mask of `w` low bits. `(1L << 64) - 1` is NOT it — JVM
    * shift counts are mod 64, so it evaluates to 0 and a k=0 rewrite
    * (one 64-bit chunk) would degenerate into a constant-key cross
    * join. With -1L the k=0 case becomes an exact equi-join on the
    * whole fingerprint. */
  private def mask(w: Int): Long = if (w >= 64) -1L else (1L << w) - 1

  private def chunkArray(fp: Expression, defs: Seq[(Int, Int, Int)]): Expression =
    CreateArray(defs.map { case (idx, off, w) =>
      CreateNamedStruct(Seq(
        Literal("ck"), Literal(idx),
        Literal("cv"), BitwiseAnd(ShiftRight(fp, Literal(off)), Literal(mask(w)))))
    })

  private def chunkOf(fp: Expression, d: (Int, Int, Int)): Expression =
    BitwiseAnd(ShiftRight(fp, Literal(d._2)), Literal(mask(d._3)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(Marker)) &&
          left.resolved && right.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      // if the join already has an equi conjunct Spark hash-joins it —
      // rewriting would only multiply rows (e.g. d03's own chunk join,
      // whose hamming verify gets pushed into the join condition)
      val hasEquiKey = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        case _ => false
      }
      val hams =
        if (hasEquiKey) Nil
        else conjuncts.flatMap(c => hammingConjunct(c, left, right).map(c -> _))
      hams match {
        case Seq((_, (lfp, rfp, k))) if k >= 0 && k + 1 <= MaxChunks =>
          val defs = chunkDefs(k + 1)
          val structT = StructType(Seq(StructField("ck", IntegerType, nullable = false),
            StructField("cv", LongType, nullable = false)))
          val lOut = AttributeReference(s"${Marker}_l", structT, nullable = false)()
          val rOut = AttributeReference(s"${Marker}_r", structT, nullable = false)()
          val lGen = Generate(Explode(chunkArray(lfp, defs)), Nil, outer = false,
            None, Seq(lOut), left)
          val rGen = Generate(Explode(chunkArray(rfp, defs)), Nil, outer = false,
            None, Seq(rOut), right)
          val lCk = GetStructField(lOut, 0, Some("ck"))
          val lCv = GetStructField(lOut, 1, Some("cv"))
          val rCk = GetStructField(rOut, 0, Some("ck"))
          val rCv = GetStructField(rOut, 1, Some("cv"))
          // exactly-once: no earlier chunk agrees
          val firstMatch: Expression = {
            val branches = defs.drop(1).map { case (idx, _, _) =>
              (EqualTo(lCk, Literal(idx)): Expression,
                Not(defs.take(idx).map(d =>
                  EqualTo(chunkOf(lfp, d), chunkOf(rfp, d)): Expression)
                  .reduce(Or)): Expression)
            }
            CaseWhen((EqualTo(lCk, Literal(0)): Expression, Literal(true): Expression) +: branches,
              Some(Literal(false)))
          }
          val newCond = (Seq(EqualTo(lCk, rCk), EqualTo(lCv, rCv), firstMatch) ++ conjuncts)
            .reduce(And)
          Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}

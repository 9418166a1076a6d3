package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule (SURVEY §3 — the custom `Rule[LogicalPlan]` rung of
  * the extension ladder): rewrite a NAIVE point-in-interval join
  *
  *   points JOIN intervals ON p >= s AND p <= e
  *
  * into the bucketed equi-join shape of
  * [[graft.operators.RangeJoin]] — automatically. Without this, Spark
  * plans a pure-inequality inner join as BroadcastNestedLoopJoin:
  * O(|points|·|intervals|) and broadcast-or-bust. With it, users (and
  * SQL authors, who cannot call the operator API) get the
  * equi-join-on-coarse-bucket + residual-BETWEEN plan, which
  * Catalyst then executes as broadcast/SMJ/shuffled-hash with AQE
  * skew handling — none of which exists for a nested loop.
  *
  * Deliberately OPT-IN and narrow (a rewrite that fires on joins it
  * misjudges is worse than none):
  *  - enabled only when `spark.graft.rangeJoin.bucketWidth` is set to
  *    a positive long — the width is a DOMAIN decision (≈ typical
  *    interval span, see the operator's scaladoc), not something an
  *    optimizer should guess. NOTE the conf is SESSION-WIDE: every
  *    inner join in the session matching the shape below is
  *    rewritten with this one width — set it around the statements
  *    it is meant for (or per-job), not globally for mixed
  *    workloads;
  *  - fires only on an INNER join whose condition is exactly the
  *    two-comparison conjunction over integral columns, point side
  *    fully from one child and both bounds from the other;
  *  - the rewrite keeps the ORIGINAL predicate as the residual
  *    filter, so semantics are identical by construction (each
  *    qualifying pair meets in exactly the point's bucket; null
  *    points/bounds produce null buckets/empty sequences and drop,
  *    exactly as the null comparison drops them in the naive join;
  *    inverted intervals produce a descending bucket sequence whose
  *    rows the residual predicate rejects);
  *  - an interval whose span would explode into more than
  *    `spark.graft.rangeJoin.maxBuckets` buckets (default 4e6; an
  *    open-ended sentinel end like Long.MaxValue would otherwise
  *    make Sequence/Explode THROW at ~2^31 elements, turning a
  *    working-but-slow naive join into a failing one) is routed
  *    through a naive-join fallback branch instead: the rewrite is a
  *    UNION of [bucketed equi-join over intervals under the cap] and
  *    [original nested-loop join over the oversized remainder], so
  *    the pathological rows cost what they always cost while the
  *    bounded majority gets the equi-join plan. Null-bound intervals
  *    drop from both branches exactly as the naive join drops them.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  /** Idempotence marker for the naive-fallback branch: its join
    * carries the ORIGINAL two-comparison condition and would re-match
    * this rule on the optimizer's next fixpoint iteration, stacking a
    * fresh Union per pass. Tagged joins are skipped.
    */
  private val FallbackTag =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit](
      "graft.rangeJoin.fallback")

  private def widthConf: Long =
    try conf.getConfString("spark.graft.rangeJoin.bucketWidth", "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def maxBucketsConf: Long =
    try math.max(1L,
      conf.getConfString("spark.graft.rangeJoin.maxBuckets", "4000000").toLong)
    catch { case _: NumberFormatException => 4000000L }

  private def integral(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = widthConf
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.getTagValue(FallbackTag).isEmpty =>
        val rewritten = cond match {
          case And(GreaterThanOrEqual(p1, s), LessThanOrEqual(p2, e))
              if p1.semanticEquals(p2) =>
            tryRewrite(j, left, right, hint, p1, s, e, width)
          case And(LessThanOrEqual(p1, e), GreaterThanOrEqual(p2, s))
              if p1.semanticEquals(p2) =>
            tryRewrite(j, left, right, hint, p1, s, e, width)
          case _ => None
        }
        rewritten.getOrElse(j)
    }
  }

  private def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                         hint: JoinHint, p: Expression, s: Expression,
                         e: Expression, width: Long): Option[LogicalPlan] = {
    if (!(integral(p) && integral(s) && integral(e))) return None
    val boundsRefs = s.references ++ e.references
    val (pointSide, intervalSide, pointIsLeft) =
      if (p.references.subsetOf(left.outputSet) &&
        boundsRefs.subsetOf(right.outputSet)) (left, right, true)
      else if (p.references.subsetOf(right.outputSet) &&
        boundsRefs.subsetOf(left.outputSet)) (right, left, false)
      else return None
    if (p.references.isEmpty || boundsRefs.isEmpty) return None

    def div(x: Expression): Expression =
      IntegralDivide(Cast(x, LongType), Literal(width))
    val bktP = Alias(div(p), "_graft_bktp")()
    val pointP = Project(pointSide.output :+ bktP, pointSide)
    // bucket-count guard: span compared in DOUBLE space (never
    // overflows, unlike a long subtraction under ANSI; the ≤2^-11
    // relative rounding slack near the threshold only shifts WHICH
    // branch an interval takes — both branches are exact). Null
    // bounds make the predicate null → dropped by the Filter in
    // both branches, matching the naive join's null-comparison drop.
    val spanOk: Expression = LessThanOrEqual(
      Subtract(Cast(div(e), DoubleType), Cast(div(s), DoubleType)),
      Literal(maxBucketsConf.toDouble))
    // no explicit step: start > stop (inverted interval) descends
    // instead of erroring; the residual predicate rejects those rows.
    // Sequence is TimeZoneAwareExpression — unresolved until the
    // session zone is attached, even for integral sequences
    val seq = new Sequence(div(s), div(e), None,
      Some(conf.sessionLocalTimeZone))
    val bktI = AttributeReference("_graft_bkti", LongType, nullable = false)()
    val intervalG = Generate(Explode(seq), Nil, outer = false, None,
      Seq(bktI), Filter(spanOk, intervalSide))
    val newCond = And(EqualTo(bktP.toAttribute, bktI), j.condition.get)
    val (nl, nr) =
      if (pointIsLeft) (pointP, intervalG) else (intervalG, pointP)
    val bucketed = Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    // fallback branch: the oversized intervals keep their original
    // nested-loop plan (they were the rows that would have made
    // Sequence throw). Shared exprIds across Union children are the
    // self-union shape (df.filter(p).union(df.filter(!p))) — legal
    // post-analysis; the branches never meet in a join.
    val oversized = Filter(Not(spanOk), intervalSide)
    val (fl, fr) =
      if (pointIsLeft) (pointSide, oversized) else (oversized, pointSide)
    val fallbackJoin = Join(fl, fr, Inner, j.condition, hint)
    fallbackJoin.setTagValue(FallbackTag, ())
    val fallback = Project(j.output, fallbackJoin)
    val out = Union(Seq(bucketed, fallback))
    // defensive: a rewrite that fails to resolve must never replace a
    // working plan — fall back to the naive join instead
    if (out.resolved) Some(out)
    else {
      if (sys.env.contains("GRAFT_DEBUG_RULES")) {
        // scalastyle:off println
        println(s"[RangeJoinRule] rewrite unresolved:\n${out.treeString}")
        // scalastyle:on println
      }
      None
    }
  }
}

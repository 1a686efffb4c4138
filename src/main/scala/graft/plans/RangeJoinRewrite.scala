package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Plan-time range-join rewrite (SURVEY §2 D6).
  *
  * A declarative point-in-interval join —
  * `points.join(intervals, ts >= lo && ts < hi)` — has no equi-predicate,
  * so Spark physical-plans it as BroadcastNestedLoopJoin: O(|P|·|I|) and a
  * guaranteed failure at 100 TB. [[graft.operators.RangeJoin]] offers the
  * scalable bucketed formulation as an explicit operator; this Rule makes
  * the ENGINE apply it: users keep the declarative join, the optimizer
  * recognizes the two-sided long-typed range sandwich and rewrites to
  *
  *   points + bucket(ts)  ⋈_bucket  intervals × explode(bucket(lo)..bucket(hi))
  *     with the ORIGINAL predicate kept as the residual condition
  *
  * Buckets are `2^29 µs ≈ 9 min` via arithmetic shift (floor semantics,
  * no division edge cases). The rewrite is exact for every bound
  * combination (≥/>/</≤, either operand order): bucket coverage is a
  * superset of true matches and the residual filters precisely; null
  * timestamps/bounds produce null buckets and match nothing, exactly like
  * the original predicate. The rewritten join contains an equality
  * conjunct, so the rule never re-fires on its own output.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {
  /** log2 of the bucket width in the ts unit (2^29 µs ≈ 537 s). */
  val BucketBits = 29

  /** A comparison read as "point `p` is bounded by `b`"; both operand
    * orders are considered, so each comparison yields two readings. */
  private def readings(c: Expression): Seq[(Expression, Expression, Boolean)] =
    c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b) => Seq((a, b, true), (b, a, false))
      case LessThan(a, b) => Seq((a, b, false), (b, a, true))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Seq()
    }

  /** Extract (ts, lo, hi) when `cond` is a two-comparison sandwich on a
    * common long expression. */
  private def boundsOf(cond: Expression)
      : Option[(Expression, Expression, Expression)] = cond match {
    case And(c1, c2) =>
      (for {
        (p1, b1, low1) <- readings(c1)
        (p2, b2, low2) <- readings(c2)
        if p1.semanticEquals(p2) && low1 != low2
      } yield if (low1) (p1, b1, b2) else (p1, b2, b1)).headOption
    case _ => None
  }

  /** Which side of the join `e` reads from: Some(true)=left,
    * Some(false)=right, None=neither/both/constant. */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _) if j.resolved =>
      (for {
        (ts, lo, hi) <- boundsOf(cond)
        if ts.dataType == LongType && lo.dataType == LongType &&
          hi.dataType == LongType
        tsLeft <- sideOf(ts, left, right)
        loSide <- sideOf(lo, left, right)
        hiSide <- sideOf(hi, left, right)
        if loSide == hiSide && loSide != tsLeft
      } yield rewrite(j, ts, lo, hi, tsLeft)).getOrElse(j)
  }

  private def rewrite(j: Join, ts: Expression, lo: Expression,
      hi: Expression, tsLeft: Boolean): LogicalPlan = {
    val (pts, ivl) = if (tsLeft) (j.left, j.right) else (j.right, j.left)
    val shift = Literal(BucketBits)
    val pBucket = Alias(ShiftRight(ts, shift), "_graft_bucket_p")()
    val pPlan = Project(pts.output :+ pBucket, pts)
    val iBucket =
      AttributeReference("_graft_bucket_i", LongType, nullable = false)()
    val iPlan = Generate(
      // Sequence is TimeZoneAwareExpression: without a timezone it reports
      // unresolved even for long inputs, invalidating the rewritten plan
      Explode(new Sequence(
        ShiftRight(lo, shift), ShiftRight(hi, shift), None,
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(iBucket),
      child = Filter(LessThanOrEqual(lo, hi), ivl))
    val newCond = And(EqualTo(pBucket.toAttribute, iBucket), j.condition.get)
    val joined =
      if (tsLeft) Join(pPlan, iPlan, Inner, Some(newCond), JoinHint.NONE)
      else Join(iPlan, pPlan, Inner, Some(newCond), JoinHint.NONE)
    Project(j.output, joined)
  }
}

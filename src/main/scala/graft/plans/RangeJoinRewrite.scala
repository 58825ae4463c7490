package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a point-in-interval theta join into a
  * bucket-expansion equi-join, automatically.
  *
  * Spark plans `p >= lo AND p < hi` (no equi-key) as a broadcast
  * nested-loop join — O(|points| * |intervals|) and a non-starter at
  * 100 TB. ExtendedOps.rangeJoin is the explicit fix; this rule applies
  * the same expansion transparently to ANY eligible join in the plan
  * (reference: sclera's optimizer rewrites relational ops it can
  * evaluate better — sql/expr/relational/RelOp.scala — re-expressed
  * here as a Catalyst `Rule[LogicalPlan]`):
  *
  *   points:    bucket(p) = floor(p / W)
  *   intervals: explode(sequence(bucket(lo), bucket(hi)))
  *   join on bucket equality AND the original exact condition.
  *
  * The original condition is kept verbatim, so the rewrite is always
  * exact; bucket monotonicity (floor and IEEE division are monotone)
  * guarantees no match is lost. Intervals with lo > hi cannot match and
  * are filtered BEFORE the expansion (sequence(a, b) with b < a would
  * fabricate a descending bucket range).
  *
  * Opt-in via `spark.graft.rangeJoin.bucketWidth` (the bucket width in
  * value units — pick ~ the median interval length). The rule never
  * fires on joins with an equi-conjunct (hash/merge joins already
  * handle those, and the rewrite's own output has one — no refiring).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  /** One comparison read as "point is bounded by an expression from
    * the other side": lower = (point >= bound). */
  private case class Cand(point: Expression, bound: Expression, lower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(WidthKey, "")
    if (w.isEmpty || w.toDouble <= 0) return plan
    val width = w.toDouble
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if j.resolved =>
        rewrite(j, cond, width).getOrElse(j)
    }
  }

  private def rewrite(
      j: Join, cond: Expression, width: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val lset = j.left.outputSet
    val rset = j.right.outputSet

    // Some(true) = references the left side only.
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.nonEmpty && e.references.subsetOf(lset)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(rset)) Some(false)
      else None

    def crossSided(a: Expression, b: Expression): Boolean =
      (a.dataType, b.dataType) match {
        case (_: NumericType, _: NumericType) =>
          (sideOf(a), sideOf(b)) match {
            case (Some(x), Some(y)) => x != y
            case _ => false
          }
        case _ => false
      }

    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSided(a, b)
      case EqualNullSafe(a, b) => crossSided(a, b)
      case _ => false
    }
    if (hasEqui) return None

    // g >= s: g's lower bound is s, and s's upper bound is g.
    def views(g: Expression, s: Expression): Seq[Cand] =
      if (crossSided(g, s)) Seq(Cand(g, s, lower = true), Cand(s, g, lower = false))
      else Nil

    val cands = conjuncts.flatMap {
      case GreaterThan(a, b) => views(a, b)
      case GreaterThanOrEqual(a, b) => views(a, b)
      case LessThan(a, b) => views(b, a)
      case LessThanOrEqual(a, b) => views(b, a)
      case _ => Nil
    }

    val pair = (for {
      loC <- cands if loC.lower
      hiC <- cands
      if !hiC.lower && hiC.point.semanticEquals(loC.point) &&
        sideOf(hiC.bound) == sideOf(loC.bound)
    } yield (loC.point, loC.bound, hiC.bound)).headOption

    pair.map { case (point, lo, hi) =>
      val pointOnLeft = sideOf(point).contains(true)

      def bucket(e: Expression): Expression =
        Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))), LongType)

      val pAlias = Alias(bucket(point), "_graft_pb")()
      val pointChild = if (pointOnLeft) j.left else j.right
      val newPointChild = Project(pointChild.output :+ pAlias, pointChild)

      val intervalChild = if (pointOnLeft) j.right else j.left
      val guarded = Filter(LessThanOrEqual(lo, hi), intervalChild)
      val ibAttr = AttributeReference("_graft_ib", LongType, nullable = false)()
      val gen = Generate(
        // Sequence is TimeZoneAwareExpression: without a concrete zone
        // it stays unresolved and plan validation rejects the rewrite
        Explode(Sequence(bucket(lo), bucket(hi), Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ibAttr), child = guarded)

      val (nl, nr) =
        if (pointOnLeft) (newPointChild, gen) else (gen, newPointChild)
      val newJoin =
        Join(nl, nr, Inner,
          Some(And(EqualTo(pAlias.toAttribute, ibAttr), cond)), j.hint)
      Project(j.output, newJoin)
    }
  }
}

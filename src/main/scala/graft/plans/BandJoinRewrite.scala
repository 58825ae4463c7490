package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite a keyed band join into the sorted-sweep
  * [[BandJoinPlan]] automatically.
  *
  * Spark plans `l.k = r.k AND r.lo <= l.t AND l.t < r.hi` as a hash
  * equi-join on the key followed by a post-join filter — every
  * (point, interval) pair of a key is materialized before the band
  * predicate prunes, O(p*i) per key. ExtendedOps.bandJoin is the
  * explicit fix; this rule (the keyed sibling of [[RangeJoinRewrite]])
  * applies the sweep transparently to ANY eligible inner join in the
  * plan. The two rules split the space: RangeJoinRewrite fires only
  * when there is NO equi-conjunct, this one only when there is.
  *
  * Detection is attribute-only (t/lo/hi plain columns of matching
  * type), the strict/inclusive shape must match the exec's semantics
  * exactly (lo <= t, t < hi), and every residual conjunct is kept as a
  * filter above the sweep — the rewrite is always exact. IsNotNull
  * guards are inserted on the key columns of both sides: EqualTo never
  * matches nulls, but the sweep's clustering would group them together.
  *
  * Opt-in via `spark.graft.bandJoin.enabled`.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.bandJoin.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if j.resolved =>
        rewrite(j, cond).getOrElse(j)
    }
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val lset = j.left.outputSet
    val rset = j.right.outputSet

    // Some(true) = attribute of the left child.
    def side(a: Attribute): Option[Boolean] =
      if (lset.contains(a)) Some(true)
      else if (rset.contains(a)) Some(false)
      else None

    def crossAttrs(a: Expression, b: Expression): Option[(Attribute, Attribute)] =
      (a, b) match {
        case (x: Attribute, y: Attribute)
            if side(x).isDefined && side(y).isDefined && side(x) != side(y) =>
          Some((x, y))
        case _ => None
      }

    def isEqui(c: Expression): Boolean = c match {
      case EqualTo(a, b) => crossAttrs(a, b).isDefined
      case _ => false
    }

    // (leftKey, rightKey) per equi conjunct
    val equi = conjuncts.collect {
      case EqualTo(a, b) if crossAttrs(a, b).isDefined =>
        val (x, y) = crossAttrs(a, b).get
        if (side(x).contains(true)) (x, y) else (y, x)
    }
    if (equi.isEmpty) return None

    // (t, lo): t >= lo in either written order
    def lowerOf(c: Expression): Option[(Attribute, Attribute)] = c match {
      case GreaterThanOrEqual(a, b) => crossAttrs(a, b)
      case LessThanOrEqual(a, b) => crossAttrs(b, a)
      case _ => None
    }
    // (t, hi): t < hi in either written order
    def upperOf(c: Expression): Option[(Attribute, Attribute)] = c match {
      case LessThan(a, b) => crossAttrs(a, b)
      case GreaterThan(a, b) => crossAttrs(b, a)
      case _ => None
    }

    val band = (for {
      (t1, lo) <- conjuncts.flatMap(lowerOf)
      (t2, hi) <- conjuncts.flatMap(upperOf)
      if t1.semanticEquals(t2) && side(lo) == side(hi) &&
        side(t1) != side(lo) &&
        lo.dataType == t1.dataType && hi.dataType == t1.dataType
    } yield (t1, lo, hi)).headOption

    band.map { case (t, lo, hi) =>
      def consumed(c: Expression): Boolean =
        isEqui(c) ||
          lowerOf(c).exists { case (a, b) =>
            a.semanticEquals(t) && b.semanticEquals(lo) } ||
          upperOf(c).exists { case (a, b) =>
            a.semanticEquals(t) && b.semanticEquals(hi) }
      val residual = conjuncts.filterNot(consumed)

      def notNull(keys: Seq[Attribute], child: LogicalPlan): LogicalPlan =
        Filter(keys.map(IsNotNull(_): Expression).reduce(And), child)

      val (lkeys, rkeys) = equi.unzip
      val node =
        if (side(t).contains(true))
          BandJoinPlan(notNull(lkeys, j.left), notNull(rkeys, j.right),
            lkeys, rkeys, t, lo, hi)
        else
          BandJoinPlan(notNull(rkeys, j.right), notNull(lkeys, j.left),
            rkeys, lkeys, t, lo, hi)
      val filtered =
        if (residual.isEmpty) node
        else Filter(residual.reduce(And), node)
      Project(j.output, filtered)
    }
  }
}

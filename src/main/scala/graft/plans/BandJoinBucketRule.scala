package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: plans band joins — `a JOIN b ON abs(a.x − b.y) <= w`
  * (optionally among other conjuncts) — as bucketed HASH joins instead of
  * the broadcast-nested-loop Spark otherwise falls back to when a join has
  * no equi predicate.
  *
  * This is the one place the suite reaches for a custom `Rule[LogicalPlan]`
  * (SURVEY.md §2 preference (c)): the rewrite cannot be expressed from
  * inside a query — it must see the JOIN NODE — and Spark's own planner
  * genuinely lacks it (SPARK-8682 class of theta joins). The transformation
  * is the same one `Temporal.bandJoin` applies by hand, lifted to a rule so
  * a PLAIN theta join written by any user of the library gets the hash plan
  * automatically:
  *
  *   left  → project an extra bucket column  floor(x / w)
  *   right → explode buckets {floor(y/w)−1, floor(y/w), floor(y/w)+1}
  *   join  → ON left.bucket = right.bucket AND <original condition>
  *
  * Soundness: |x − y| ≤ w ⇒ |x/w − y/w| ≤ 1 ⇒ the floors differ by at most
  * one, so every qualifying pair shares a bucket in the ×3 expansion; the
  * ORIGINAL predicate is kept verbatim, so no false pair survives. The
  * rewritten join HAS an equi key, so the rule's own guard (skip joins
  * that already have one) makes it idempotent under the optimizer's
  * fixed-point batch.
  *
  * Scale: the shuffle keys on the bucket — co-partitioned both sides,
  * ×3 row expansion on the (smaller) right side only, candidate count
  * bounded by bucket population products rather than |L|·|R|. Skewed
  * buckets split under AQE like any hash join's.
  */
object BandJoinBucketRule extends Rule[LogicalPlan] with PredicateHelper {

  private def litToDouble(v: Any): Option[Double] = v match {
    case x: Int => Some(x.toDouble)
    case x: Long => Some(x.toDouble)
    case x: Short => Some(x.toDouble)
    case x: Byte => Some(x.toDouble)
    case x: Float => Some(x.toDouble)
    case x: Double => Some(x)
    case x: org.apache.spark.sql.types.Decimal => Some(x.toDouble)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !hasEquiKey(cond, left, right) =>
      findBand(cond, left, right) match {
        case Some((lExpr, rExpr, w)) => rewrite(j, lExpr, rExpr, w)
        case None => j
      }
  }

  /** Any conjunct `l = r` with one side per child already makes this a
    * hash-joinable plan — leave it to the normal planner.
    */
  private def hasEquiKey(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) => sidesSplit(a, b, left, right).isDefined
      case EqualNullSafe(a, b) => sidesSplit(a, b, left, right).isDefined
      case _ => false
    }

  /** (leftSideExpr, rightSideExpr) if a references exactly one child each. */
  private def sidesSplit(a: Expression, b: Expression, left: LogicalPlan,
                         right: LogicalPlan): Option[(Expression, Expression)] =
    if (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
      Some((a, b))
    else if (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      Some((b, a))
    else None

  /** First conjunct of shape abs(x − y) <= w (either literal side),
    * x and y on opposite children, w a positive numeric literal.
    */
  private def findBand(cond: Expression, left: LogicalPlan,
                       right: LogicalPlan): Option[(Expression, Expression, Double)] =
    splitConjunctivePredicates(cond).iterator
      .map[Option[(Expression, Expression, Double)]] {
        case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(w, _)) =>
          for { wd <- litToDouble(w); (l, r) <- sidesSplit(a, b, left, right) }
            yield (l, r, wd)
        case GreaterThanOrEqual(Literal(w, _), Abs(Subtract(a, b, _), _)) =>
          for { wd <- litToDouble(w); (l, r) <- sidesSplit(a, b, left, right) }
            yield (l, r, wd)
        case _ => None
      }.collectFirst { case Some(found) if found._3 > 0 => found }

  private def bucketOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))

  private def rewrite(j: Join, lExpr: Expression, rExpr: Expression, w: Double): LogicalPlan = {
    val lBucket = Alias(bucketOf(lExpr, w), "__band_bucket_l")()
    val newLeft = Project(j.left.output :+ lBucket, j.left)
    val rBucket = bucketOf(rExpr, w)
    val candidates = CreateArray(Seq(
      Subtract(rBucket, Literal(1L)), rBucket, Add(rBucket, Literal(1L))))
    val genOut = AttributeReference("__band_bucket_r", LongType, nullable = true)()
    val newRight = Generate(Explode(candidates), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(genOut), child = j.right)
    val newCond = And(EqualTo(lBucket.toAttribute, genOut), j.condition.get)
    // Restore the original output (the helper columns must not leak).
    Project(j.output,
      Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}

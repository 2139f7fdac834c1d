package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: plans band joins — theta joins whose only constraint is
  * that two numeric expressions lie within a constant of each other — as
  * bucketed HASH joins instead of the broadcast-nested-loop Spark otherwise
  * falls back to when a join has no equi predicate.
  *
  * Matched forms (all among arbitrary other conjuncts):
  *  - `abs(a.x − b.y) <= w`                                 (absolute band)
  *  - `a.x − b.y <= u AND b.y − a.x <= v`                   (two-conjunct,
  *    possibly asymmetric; strict `<` variants too)
  *  - `a.x BETWEEN b.y − w AND b.y + w` — Catalyst rewrites BETWEEN into
  *    the `x >= y − w AND x <= y + w` conjunct pair, which normalizes to
  *    the two-conjunct form above
  *
  * This is the one place the suite reaches for a custom `Rule[LogicalPlan]`
  * (SURVEY.md §2 preference (c)): the rewrite cannot be expressed from
  * inside a query — it must see the JOIN NODE — and Spark's own planner
  * genuinely lacks it (SPARK-8682 class of theta joins). The transformation
  * is the same one `Temporal.bandJoin` applies by hand, lifted to a rule so
  * a PLAIN theta join written by any user of the library gets the hash plan
  * automatically:
  *
  *   left  → project an extra bucket column  floor(x / W)
  *   right → explode buckets {floor(y/W)−1, floor(y/W), floor(y/W)+1}
  *   join  → ON left.bucket = right.bucket AND <original condition>
  *
  * Soundness: with W ≥ every band bound, a qualifying pair has
  * |x − y| ≤ W ⇒ |x/W − y/W| ≤ 1 ⇒ the floors differ by at most one, so
  * the pair shares a bucket in the ×3 expansion; the ORIGINAL predicate is
  * kept verbatim, so no false pair survives. The bucket width is
  * `Math.nextUp(max bound)`: a non-double-representable width literal
  * (e.g. decimal 0.3) converts to the NEAREST double, which can sit up to
  * half an ulp BELOW the exact decimal the residual predicate compares
  * against — bucketing with that smaller width could strand a pair at
  * exactly |x−y| = w two buckets apart. nextUp exceeds any real value
  * whose nearest double is the converted one, and a slightly-too-wide
  * bucket only loosens the candidate set, never the result. The rewritten
  * join HAS an equi key, so the rule's own guard (skip joins that already
  * have one) makes it idempotent under the optimizer's fixed-point batch.
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

  /** A one-sided bound `x − y ≤ c` extracted from one conjunct, with x and
    * y still unoriented (either may belong to either child).
    */
  private case class Bound(x: Expression, y: Expression, c: Double)

  /** Normalize a comparison conjunct to `x − y ≤ c` if a positive-position
    * literal can be isolated. Strict `<` normalizes identically — the
    * bucket cover for ≤ is a superset of the cover for <, and the original
    * predicate is re-applied verbatim.
    */
  private def normalize(e: Expression): Option[Bound] = {
    // flip Greater* into Less* so only one orientation needs matching
    val le: Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }
    le.flatMap {
      // x − y ≤ c
      case (Subtract(x, y, _), Literal(c, _)) =>
        litToDouble(c).map(Bound(x, y, _))
      // x ≤ y + c  /  x ≤ c + y   ⇒ x − y ≤ c
      case (x, Add(y, Literal(c, _), _)) if x.references.nonEmpty =>
        litToDouble(c).map(Bound(x, y, _))
      case (x, Add(Literal(c, _), y, _)) if x.references.nonEmpty =>
        litToDouble(c).map(Bound(x, y, _))
      // x − c ≤ y  ⇒ x − y ≤ c
      case (Subtract(x, Literal(c, _), _), y) if y.references.nonEmpty =>
        litToDouble(c).map(Bound(x, y, _))
      // x ≤ y − c  ⇒ x − y ≤ −c
      case (x, Subtract(y, Literal(c, _), _)) if x.references.nonEmpty =>
        litToDouble(c).map(cd => Bound(x, y, -cd))
      // x + c ≤ y  ⇒ x − y ≤ −c
      case (Add(x, Literal(c, _), _), y) if y.references.nonEmpty =>
        litToDouble(c).map(cd => Bound(x, y, -cd))
      case (Add(Literal(c, _), x, _), y) if y.references.nonEmpty =>
        litToDouble(c).map(cd => Bound(x, y, -cd))
      case _ => None
    }
  }

  /** Find a band: either `abs(x − y) ≤ w`, or a PAIR of one-sided bounds
    * `L − R ≤ u` and `R − L ≤ v` over the same two expressions. Returns
    * (leftExpr, rightExpr, W) with W = the largest bound — the sound
    * symmetric cover |l − r| ≤ W.
    */
  private def findBand(cond: Expression, left: LogicalPlan,
                       right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    val conjuncts = splitConjunctivePredicates(cond)

    // absolute form first (round-9 behavior, unchanged)
    val absBand = conjuncts.iterator
      .map[Option[(Expression, Expression, Double)]] {
        case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(w, _)) =>
          for { wd <- litToDouble(w); (l, r) <- sidesSplit(a, b, left, right) }
            yield (l, r, wd)
        case GreaterThanOrEqual(Literal(w, _), Abs(Subtract(a, b, _), _)) =>
          for { wd <- litToDouble(w); (l, r) <- sidesSplit(a, b, left, right) }
            yield (l, r, wd)
        case _ => None
      }.collectFirst { case Some(found) if found._3 > 0 => found }
    if (absBand.isDefined) return absBand

    // two-conjunct form: orient every normalized bound as L−R ≤ c or R−L ≤ c
    // fwd: (lExpr, rExpr, c) with lExpr from the left child — L − R ≤ c
    // rev: (lExpr, rExpr, c) oriented the same way      — R − L ≤ c
    val oriented = conjuncts.flatMap(normalize).flatMap { b =>
      if (b.x.references.nonEmpty && b.y.references.nonEmpty &&
          b.x.references.subsetOf(left.outputSet) &&
          b.y.references.subsetOf(right.outputSet))
        Some((b.x, b.y, b.c, true)) // forward: L − R ≤ c
      else if (b.x.references.nonEmpty && b.y.references.nonEmpty &&
          b.x.references.subsetOf(right.outputSet) &&
          b.y.references.subsetOf(left.outputSet))
        Some((b.y, b.x, b.c, false)) // reverse: R − L ≤ c
      else None
    }
    val pairs = for {
      (l1, r1, u, true) <- oriented
      (l2, r2, v, false) <- oriented
      if l1.semanticEquals(l2) && r1.semanticEquals(r2)
      w = math.max(u, v)
      if w > 0 && u + v >= 0 // u + v < 0 is an empty band — nothing to bucket
    } yield (l1, r1, w)
    pairs.headOption
  }

  private def bucketOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))

  private def rewrite(j: Join, lExpr: Expression, rExpr: Expression, w0: Double): LogicalPlan = {
    // cover any real width whose nearest-double conversion was w0 (see scaladoc)
    val w = Math.nextUp(w0)
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

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType, IntegerType, LongType, ShortType}

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
  * bucket only loosens the candidate set, never the result.
  *
  * OPERAND precision (r11, from r10 advice): nextUp covers the width
  * literal's conversion, not the operands'. Casting a high-precision
  * value to double loses up to half an ulp OF THAT VALUE — for
  * DECIMAL(24,18) near 1e6 that is ~1e-10, ≫ the ~5e-17 nextUp nudge —
  * so a boundary pair could land 2 buckets apart and silently vanish
  * from an inner join. Three regimes now handle this (see
  * [[candidateRadius]] / [[intBucketOf]]):
  *   - integral × integral: bucket in EXACT 64-bit integer arithmetic
  *     (floor-division, width ⌈w⌉) — no double anywhere, ±1 candidates;
  *   - any FRACTIONAL decimal operand (scale > 0, any precision), a
  *     scale-0 decimal wider than 15 digits, or a long mixed with a
  *     fractional side: candidates widen to ±2, sound while per-operand
  *     cast error ≤ W/4 (checked statically from the type's max
  *     magnitude 10^(p−s); for long, an accepted |x| ≤ W·2^51 gamble —
  *     see [[candidateRadius]]);
  *   - a decimal type whose worst-case cast error exceeds W/4: the rule
  *     STANDS DOWN — a nested loop is slow but never wrong.
  *
  * The rewritten join HAS an equi key, so the rule's own guard (skip
  * joins that already have one) makes it idempotent under the
  * optimizer's fixed-point batch.
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

  private def isIntegralType(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Exact floor(x / W) in 64-bit integer arithmetic — no double cast, so
    * the bucket is exact at ANY integral magnitude (a long near 2^63 loses
    * up to ~512 when cast to double, far more than any nextUp nudge).
    * IntegralDivide truncates toward zero; subtract 1 for negative
    * non-multiples to recover floor. Overflow-free: unlike the
    * `(x − pmod(x,W)) div W` formulation nothing here can leave the long
    * range (W ≥ 1, and div/remainder of any long by a positive W fit).
    */
  private def intBucketOf(e: Expression, w: Long): Expression = {
    val x = Cast(e, LongType)
    val wl = Literal(w, LongType)
    Subtract(
      IntegralDivide(x, wl),
      If(And(LessThan(x, Literal(0L)), Not(EqualTo(Remainder(x, wl), Literal(0L)))),
        Literal(1L), Literal(0L)))
  }

  /** Cast-to-double soundness at the operand TYPE's worst magnitude
    * (r10 advice: nextUp covers only the width literal's conversion, not
    * the operands'). Returns the candidate-bucket radius to use, or None
    * when no radius is statically sound and the rule must stand down:
    *   - radius 1: operand values are exactly double-representable —
    *     int/smaller, float/double (already doubles, the cast is the
    *     identity), and SCALE-0 decimals within 15 digits (integers
    *     ≤ 10^15 < 2^53 are exact). Fractional decimals are NOT exact at
    *     any precision — DECIMAL(15,2) near 1e13 casts with absolute
    *     error up to ~10^13·2^-53 ≈ 1.1e-3, far above the nextUp nudge —
    *     so every DecimalType with scale > 0 takes the maxErr check
    *     (r11 advice).
    *   - radius 2: each cast can err by up to ulp/2 ≤ W/4, so a true pair
    *     lands within 2 buckets (|x'−y'| ≤ W + 2·(W/4) ⇒ floor gap ≤ 2);
    *   - None: a DECIMAL(p,s) with 10^(p−s)·2^-52 > W/4 — the type alone
    *     admits values whose cast error swamps the band; fall back to the
    *     nested loop (slow but sound) rather than silently drop pairs.
    *     (At such magnitudes Spark's own ANSI decimal arithmetic in the
    *     residual predicate may overflow anyway — standing down matches
    *     what the un-rewritten query would do.)
    * A LongType operand mixed with a fractional side gets radius 2: its
    * relative cast error is 2^-53, so the bound holds whenever |x| ≤
    * W·2^51 — epoch MICROS (~1.7e15) are covered for any W ≥ 1, but
    * epoch NANOS (~1.7e18) need W ≥ ~760. This magnitude assumption is
    * an ACCEPTED STATIC GAMBLE (documented, r11 advice): the type holds
    * values up to 2^63 whose cast error (~1024) would need W ≥ 4096 to
    * bound statically, and standing down below that width would kill
    * every realistic epoch-scale band join. long-vs-long never gets
    * here — the exact-integer path covers it at any magnitude.
    */
  private def candidateRadius(lExpr: Expression, rExpr: Expression,
                              w: Double): Option[Int] = {
    val radii = Seq(lExpr, rExpr).map { e =>
      e.dataType match {
        case d: DecimalType if d.scale == 0 && d.precision <= 15 => Some(1)
        case d: DecimalType =>
          val maxErr = math.pow(10, (d.precision - d.scale).toDouble) * math.pow(2, -52)
          if (maxErr > w / 4) None else Some(2)
        case LongType => Some(2)
        case _ => Some(1)
      }
    }
    if (radii.contains(None)) None else Some(radii.flatten.max)
  }

  private def rewrite(j: Join, lExpr: Expression, rExpr: Expression, w0: Double): LogicalPlan = {
    val integral = isIntegralType(lExpr) && isIntegralType(rExpr)
    // cover any real width whose nearest-double conversion was w0 (see scaladoc)
    val w = Math.nextUp(w0)
    val (lB, rB, radius) =
      if (integral) {
        // exact integer bucketing: ceil(w) only widens the bucket (sound),
        // and no double ever enters — radius 1 is exact at any magnitude
        val wi = math.ceil(w0).toLong max 1L
        (intBucketOf(lExpr, wi), intBucketOf(rExpr, wi), 1)
      } else candidateRadius(lExpr, rExpr, w) match {
        case Some(rad) => (bucketOf(lExpr, w), bucketOf(rExpr, w), rad)
        case None => return j // statically unsound to bucket — keep the NLJ
      }
    val lBucket = Alias(lB, "__band_bucket_l")()
    val newLeft = Project(j.left.output :+ lBucket, j.left)
    val candidates = CreateArray(
      (-radius to radius).map(i => Add(rB, Literal(i.toLong))))
    val genOut = AttributeReference("__band_bucket_r", LongType, nullable = true)()
    val newRight = Generate(Explode(candidates), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(genOut), child = j.right)
    val newCond = And(EqualTo(lBucket.toAttribute, genOut), j.condition.get)
    // Restore the original output (the helper columns must not leak).
    Project(j.output,
      Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}

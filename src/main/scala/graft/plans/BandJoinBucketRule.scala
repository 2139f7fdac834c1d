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
  * `pow2ceil(Math.nextUp(max bound))` — two adjustments, each only ever
  * WIDENING the bucket (loosening candidates, never the result):
  *   - nextUp: a non-double-representable width literal (e.g. decimal
  *     0.3) converts to the NEAREST double, which can sit up to half an
  *     ulp BELOW the exact decimal the residual predicate compares
  *     against — bucketing with that smaller width could strand a pair
  *     at exactly |x−y| = w two buckets apart; nextUp exceeds any real
  *     value whose nearest double is the converted one;
  *   - pow2ceil (r13): rounding the width up to a power of two makes the
  *     bucket DIVISION exact in IEEE arithmetic, which is what makes
  *     radius 1 rigorous at any operand magnitude — see
  *     [[candidateRadius]] for the full argument.
  *
  * OPERAND precision (r11 from r10 advice; closed statically in r13):
  * nextUp covers the width literal's conversion, not the operands'.
  * Casting a high-precision value to double loses up to half an ulp OF
  * THAT VALUE — for DECIMAL(24,18) near 1e6 that is ~1e-10, ≫ the
  * ~5e-17 nextUp nudge — so a boundary pair could land buckets apart
  * and silently vanish from an inner join. Three regimes handle this
  * (see [[candidateRadius]] / [[intBucketOf]]):
  *   - integral × integral: bucket in EXACT 64-bit integer arithmetic
  *     (floor-division, width ⌈w⌉) — no double anywhere, ±1 candidates;
  *   - exactly-representable fractional operands (double/float, small
  *     scale-0 decimals; type coercion guarantees both sides share one
  *     type — see [[candidateRadius]] point 1): radius ±1, rigorous at
  *     ANY magnitude because the power-of-two bucket division is exact
  *     (r13 — this retires r12's "long mixed with fractional" gamble,
  *     whose premise coercion makes unreachable, AND the quotient-
  *     rounding hazard the r12 analysis missed);
  *   - other decimals: ±2 when the type's worst-case cast error fits
  *     W/4, else the rule STANDS DOWN — a nested loop is slow but
  *     never wrong.
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

  /** Static soundness screen for the double-bucketing path. Returns the
    * candidate radius, or None when no radius is statically sound and
    * the rule must stand down. With the power-of-two bucket width
    * ([[pow2ceil]]) the division inside `floor(x/W₂)` is EXACT, so the
    * whole analysis reduces to operand CAST error — statically bounded
    * for every type that can appear here:
    *
    * 1. MIXED TYPES CANNOT REACH THIS RULE (r13 — retires the r12
    *    "long mixed with a fractional side" accepted gamble as
    *    unreachable rather than risky): every matched conjunct is a
    *    resolved comparison, and Catalyst's type coercion forces both
    *    sides of a comparison (and both operands of the Subtract/Add
    *    forms) to ONE common type before the rule ever sees the join —
    *    a "long vs double" band arrives here as double vs double with
    *    the cast INSIDE lExpr, and the residual predicate evaluates on
    *    the SAME casted values the bucketing sees, so that cast can
    *    never separate a pair the predicate accepts. long vs long takes
    *    the exact-integer path and never gets here.
    *
    * 2. Radius 1 for exactly-representable operand types (double/float/
    *    int and smaller, scale-0 decimals within 15 digits): the cast
    *    is the identity and the division is exact, so a true pair's
    *    bucket quotients differ by ≤ W/W₂ ≤ 1 EXACTLY and their floors
    *    by ≤ 1 — rigorous at ANY magnitude, including the epoch-nanos
    *    regime r12 flagged. (With a rounding division this was only
    *    ε-sound: quotient half-ulps grow with magnitude and ⌊a⌋,⌊b⌋
    *    with |a−b| = 1+ε can sit two apart. Exactness removes the ε.)
    *
    * 3. Radius 2 for other decimals, screened (r11, unchanged): each
    *    side's decimal→double cast errs ≤ maxErr = 10^(p−s)·2^-52,
    *    required ≤ W/4 ≤ W₂/4 — quotient gap ≤ 1 + 2·(W/4)/W₂ ≤ 1.5,
    *    floor gap ≤ 2. Beyond the screen the type alone admits values
    *    whose cast error swamps the band — fall back to the nested loop
    *    (slow but never wrong; at such magnitudes Spark's own ANSI
    *    decimal arithmetic in the residual may overflow anyway).
    *    Fractional decimals are never exactly double-representable —
    *    DECIMAL(15,2) near 1e13 casts with absolute error ~1.1e-3 —
    *    which is why the screen keys on the type's integral magnitude
    *    10^(p−s), not on scale.
    */
  private def candidateRadius(lExpr: Expression, rExpr: Expression,
                              w: Double): Option[Int] = {
    val radii = Seq(lExpr, rExpr).map { e =>
      e.dataType match {
        // scale-0 decimals within 15 digits are exactly representable
        // (≤ 10^15 < 2^53): no cast error
        case d: DecimalType if d.scale == 0 && d.precision <= 15 => Some(1)
        case d: DecimalType =>
          val maxErr = math.pow(10, (d.precision - d.scale).toDouble) * math.pow(2, -52)
          if (maxErr > w / 4) None else Some(2)
        case _ => Some(1)
      }
    }
    if (radii.contains(None)) None else Some(radii.flatten.max)
  }

  /** Smallest power of two ≥ x (x > 0). Dividing an IEEE binary64 by a
    * power of two is EXACT whenever the result is normal (only the
    * exponent changes), so bucketing with a power-of-two width carries
    * ZERO division rounding — the keystone of this rule's soundness
    * argument (see [[candidateRadius]]). Subnormal quotients (operand
    * < width·2^-1022) can round, but only across the 0/−1 bucket
    * boundary, where any qualifying partner is within radius 1 anyway.
    */
  def pow2ceil(x: Double): Double = {
    val p = math.pow(2, Math.getExponent(x).toDouble)
    if (p >= x) p else p * 2
  }

  private def rewrite(j: Join, lExpr: Expression, rExpr: Expression, w0: Double): LogicalPlan = {
    val integral = isIntegralType(lExpr) && isIntegralType(rExpr)
    // cover any real width whose nearest-double conversion was w0 (see
    // scaladoc), then round UP to a power of two so the bucket division
    // is exact — at most 2× the band, so bucket population stays
    // band-density-bounded while every magnitude hazard disappears
    val w = pow2ceil(Math.nextUp(w0))
    // pow2ceil overflows to +Infinity above 2^1023; x / Infinity = 0
    // would collapse every row into bucket 0 — still CORRECT (the
    // residual predicate holds) but a single-bucket join is worse than
    // the NLJ it replaced. Stand down instead of degenerating.
    if (!integral && w.isInfinite) return j
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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Vector kernels as Catalyst expressions.
  *
  * The SQL-lambda formulation (`aggregate(zip_with(...))`) materializes an
  * intermediate array per row per evaluation; these expressions run one
  * fused loop over the unsafe array data, with whole-stage codegen calling
  * the static kernels below. Arithmetic is kept EXACTLY as the lambda
  * version (float → double per element, index-order accumulation,
  * dot/(sqrt(na)·sqrt(nb))) so results — and the DuckDB oracle hashes —
  * are bit-identical.
  */
object VectorOps {

  /** Cosine similarity of two numeric arrays (index-order accumulation).
    * Each side is float or double, flagged by the caller from its Catalyst
    * element type (float → double widening is exact, so a float side and
    * its double-cast twin produce bit-identical results — which keeps
    * DuckDB oracle hashes stable whether a side is a raw float embedding
    * or a trained double centroid). Returns null (boxed) when lengths
    * differ or any element is null — exactly what the zip_with/aggregate
    * lambda formulation yields (a null product nullifies the whole sum),
    * so swapping the kernel in never changes results.
    */
  def cosineF(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Squared L2 distance (index-order accumulation) — the fused form of
    * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, (s,v) -> s+v)`,
    * which is CodegenFallback (interpreted per row) as a SQL lambda and
    * was the measured hot spot of PQ codebook training at sf10 (1.28 B
    * interpreted evals in the assign join). Same float→double widening
    * and null semantics as [[cosineF]]: null on length mismatch (zip_with
    * pads the shorter side with null, nullifying the lambda's sum) or any
    * null element, 0.0 on empty — swapping the kernel in never changes
    * results or oracle hashes.
    */
  def sqDist(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Merge-scan intersection count of two ASCENDING-sorted string arrays
    * (UTF8String binary order — exactly what Spark's sort_array emits for
    * StringType). O(|a|+|b|), no intermediate set/array. Used by the
    * ppJoin verify stage, where the alternative (per-pair explode +
    * count-join) costs two corpus-sized shuffles.
    */
  def sortedIntersect(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1L; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Multi-plane sign-bucket: bit p set iff dot(v, planes(p)) > 0,
    * weighted by weights(p) (so one kernel serves single- and
    * multi-table layouts).
    */
  def planeBucket(v: ArrayData, planes: Array[Array[Double]],
                  weights: Array[Long]): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * plane(i); i += 1 }
      if (dot > 0) bucket += weights(p)
      p += 1
    }
    bucket
  }
}

/** cosine(a, b) over array<float|double> columns — codegen'd fused loop. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null even on non-null inputs: length mismatch or null elements
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def isFloat(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (isFloat(left.dataType), isFloat(right.dataType)) match {
      case (Some(_), Some(_)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  private lazy val aFloat = isFloat(left.dataType).get
  private lazy val bFloat = isFloat(right.dataType).get

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}$$boxed = graft.functions.VectorOps.cosineF($a, $b, $aFloat, $bFloat);
         |if (${ev.value}$$boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$boxed.doubleValue(); }
         |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** sq_dist(a, b) over array<float|double> columns — codegen'd fused loop
  * with the exact arithmetic of the zip_with/aggregate lambda form.
  */
case class SqDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def isFloat(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (isFloat(left.dataType), isFloat(right.dataType)) match {
      case (Some(_), Some(_)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_dist expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  private lazy val aFloat = isFloat(left.dataType).get
  private lazy val bFloat = isFloat(right.dataType).get

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}$$boxed = graft.functions.VectorOps.sqDist($a, $b, $aFloat, $bFloat);
         |if (${ev.value}$$boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$boxed.doubleValue(); }
         |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDist =
    copy(left = l, right = r)
}

/** Intersection size of two sorted array<string> columns — codegen'd
  * merge scan. Inputs MUST be ascending-sorted (sort_array output); the
  * expression does not re-verify order.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.StringType, false),
            ArrayType(org.apache.spark.sql.types.StringType, false)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(org.apache.spark.sql.types.StringType, _),
            ArrayType(org.apache.spark.sql.types.StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects array<string> inputs, got ${left.dataType} / ${right.dataType}")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sortedIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.sortedIntersect($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Sign-bucket of a float vector against a fixed hyperplane matrix. */
case class PlaneBucket(child: Expression, planes: Array[Array[Double]],
                       weights: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  // the kernel reads getFloat unconditionally: an array<double> input
  // (e.g. Similarity.residuals' drop-in "embedding" column) would be
  // reinterpreted 4-bytes-at-a-time into deterministic garbage buckets
  // with no error (r13 audit) — reject it at analysis time instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"PlaneBucket needs array<float>, got ${other.simpleString}")
    }

  protected override def nullSafeEval(v: Any): Any =
    VectorOps.planeBucket(v.asInstanceOf[ArrayData], planes, weights)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val weightsRef = ctx.addReferenceObj("weights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorOps.planeBucket($v, $planesRef, $weightsRef);")
  }

  override protected def withNewChildInternal(c: Expression): PlaneBucket =
    copy(child = c)
}

object vector {
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sq_dist(a: Column, b: Column): Column =
    ColumnBridge.column(SqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def plane_bucket(v: Column, planes: Array[Array[Double]], weights: Array[Long]): Column =
    ColumnBridge.column(PlaneBucket(ColumnBridge.expression(v), planes, weights))
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** jaro_winkler(a, b) → double — a native Catalyst expression (SURVEY.md
  * §7.1 preference (b): Expression over UDF) so the quadratic inner loop
  * of a fuzzy-dedup blocking join stays inside whole-stage codegen: the
  * generated code calls the static [[StringSim]] kernel directly, no
  * serialized closure, no boxing of the double result.
  */
case class JaroWinklerExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.toString, b.toString)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.jaroWinkler($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerExpr =
    copy(left = l, right = r)
}

/** Column-API surface for string-similarity expressions. */
object strsim {
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

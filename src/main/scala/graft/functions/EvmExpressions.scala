package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions wrapping the EvmCodec static helpers.
  *
  * All are string→string scalar functions that participate in whole-stage
  * codegen via a static call into EvmCodec (no reflection, no UDF
  * serialization), so they stay inside the generated loop on the hot decode
  * path — SURVEY.md §7.1's "custom Expression beats Scala UDF" requirement.
  */
abstract class EvmUnaryExpression extends UnaryExpression {
  /** EvmCodec method name invoked from generated code. */
  def staticName: String
  def invoke(s: String): String

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(invoke(input.toString))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.EvmCodec.$staticName($c.toString()));
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin)
}

/** keccak256 of hex-encoded bytes → 0x-hex digest. */
case class KeccakOfHex(child: Expression) extends EvmUnaryExpression {
  override def staticName: String = "keccakHex"
  override def invoke(s: String): String = EvmCodec.keccakHex(s)
  override protected def withNewChildInternal(c: Expression): KeccakOfHex = copy(c)
}

/** keccak256 of a UTF-8 string → 0x-hex digest. */
case class KeccakOfUtf8(child: Expression) extends EvmUnaryExpression {
  override def staticName: String = "keccakUtf8"
  override def invoke(s: String): String = EvmCodec.keccakUtf8(s)
  override protected def withNewChildInternal(c: Expression): KeccakOfUtf8 = copy(c)
}

/** 32-byte topic word → EIP-55 checksummed 20-byte address. */
case class TopicAddress(child: Expression) extends EvmUnaryExpression {
  override def staticName: String = "topicToAddress"
  override def invoke(s: String): String = EvmCodec.topicToAddress(s)
  override protected def withNewChildInternal(c: Expression): TopicAddress = copy(c)
}

/** 32-byte topic word holding uint256 → base-10 string (exceeds DecimalType
  * precision 38, so stays a string — SURVEY.md §1.2).
  */
case class TopicUintDec(child: Expression) extends EvmUnaryExpression {
  override def staticName: String = "topicToUintDec"
  override def invoke(s: String): String = EvmCodec.topicToUintDec(s)
  override protected def withNewChildInternal(c: Expression): TopicUintDec = copy(c)
}

/** Base-10 uint256 string → 0x 32-byte hex (E7 normalizing variant). */
case class UintDecToBytes32(child: Expression) extends EvmUnaryExpression {
  override def staticName: String = "uintDecToBytes32"
  override def invoke(s: String): String = EvmCodec.uintDecToBytes32(s)
  override protected def withNewChildInternal(c: Expression): UintDecToBytes32 = copy(c)
}

/** Strict UTF-8 decode of 0x-hex bytes; null on invalid UTF-8. */
case class Utf8Strict(child: Expression) extends EvmUnaryExpression {
  override def staticName: String = "utf8Strict"
  override def invoke(s: String): String = EvmCodec.utf8Strict(s)
  override protected def withNewChildInternal(c: Expression): Utf8Strict = copy(c)
}

/** Dynamic `bytes` argument #argIndex of an nArgs-word ABI data section. */
case class AbiBytesArg(child: Expression, argIndex: Int, nArgs: Int)
    extends EvmUnaryExpression {
  override def staticName: String = "abiBytesArg"
  override def invoke(s: String): String = EvmCodec.abiBytesArg(s, argIndex, nArgs)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.EvmCodec.abiBytesArg($c.toString(), $argIndex, $nArgs));
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): AbiBytesArg =
    copy(child = c)
}

/** namehash(parent, label) = keccak256(parent ++ keccak256(label)). */
case class NamehashExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(parent: Any, label: Any): Any =
    UTF8String.fromString(EvmCodec.namehash(parent.toString, label.toString))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, l) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.EvmCodec.namehash($p.toString(), $l.toString()));
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NamehashExpr =
    copy(left = l, right = r)
}

/** Column-API surface for the EVM expressions. */
object evm {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def keccak_hex(c: Column): Column = col(KeccakOfHex(expr(c)))
  def keccak_utf8(c: Column): Column = col(KeccakOfUtf8(expr(c)))
  def topic_address(c: Column): Column = col(TopicAddress(expr(c)))
  def topic_uint_dec(c: Column): Column = col(TopicUintDec(expr(c)))
  def uint_dec_to_bytes32(c: Column): Column = col(UintDecToBytes32(expr(c)))
  def utf8_strict(c: Column): Column = col(Utf8Strict(expr(c)))
  def abi_bytes_arg(c: Column, argIndex: Int, nArgs: Int): Column =
    col(AbiBytesArg(expr(c), argIndex, nArgs))
  def namehash(parent: Column, label: Column): Column =
    col(NamehashExpr(expr(parent), expr(label)))

  /** Register all functions for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("keccak_hex", es => KeccakOfHex(es.head), "built-in")
    reg.createOrReplaceTempFunction("keccak_utf8", es => KeccakOfUtf8(es.head), "built-in")
    reg.createOrReplaceTempFunction("topic_address", es => TopicAddress(es.head), "built-in")
    reg.createOrReplaceTempFunction("topic_uint_dec", es => TopicUintDec(es.head), "built-in")
    reg.createOrReplaceTempFunction("utf8_strict", es => Utf8Strict(es.head), "built-in")
    reg.createOrReplaceTempFunction("namehash", es => NamehashExpr(es(0), es(1)), "built-in")
  }
}

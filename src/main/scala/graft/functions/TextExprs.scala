package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.textnorm.TextNorm

/** `full_to_half` as a native codegen'd Catalyst expression — the reference
  * applies this normalization to every emitted text span
  * (pipeline_middle_json_mkcontent.py:113-130), so at corpus scale it must
  * live inside whole-stage codegen rather than a Scala UDF. */
case class FullToHalf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextNorm.fullToHalf(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.textnorm.TextNorm.fullToHalf($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Ligature replacement as a codegen'd expression (span_pre_proc.py:128). */
case class Deligature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextNorm.replaceLigatures(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.textnorm.TextNorm.replaceLigatures($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFns {
  def fullToHalf(c: Column): Column = GraftShim.column(FullToHalf(GraftShim.expr(c)))
  def deligature(c: Column): Column = GraftShim.column(Deligature(GraftShim.expr(c)))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen residual-PQ ADC ordering score (r17): the HOF chain it
  * replaces (`aggregate(transform(sequence(...), element_at(...)))`)
  * runs on Catalyst's INTERPRETED higher-order-function path — at
  * m = 48–192 subspaces that is millions of per-row lambda invocations
  * and boxed array reads across a 100K-row codes scan, and it dominated
  * the phase-1 ADC time on the 100K×768D tile. This expression is one
  * static kernel call per row ([[graft.functions.VectorKernels.adcScore]]);
  * the per-query lookup tables ride the plan as reference objects — the
  * same broadcast-as-literal pattern as the distance kernels
  * (EuclideanDistanceDouble) and the text-hash kernels (HashedGramMargin).
  *
  * `mode`: 0 = dot, 1 = l2, 2 = cosine — resolved by the builder
  * ([[graft.operators.Pq.adcOrderingResidual]]), which also owns the
  * table algebra (per-cell constants + shared subspace tables).
  */
case class PqAdcScore(codes: Expression, cell: Expression,
    dotFlat: Array[Double], normFlat: Array[Double], crossFlat: Array[Double],
    dotQC: Array[Double], normC: Array[Double], k: Int, mode: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(k > 0 && mode >= 0 && mode <= 2,
    s"PqAdcScore: bad k=$k / mode=$mode")

  override def left: Expression = codes
  override def right: Expression = cell
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(c: Any, ce: Any): Any =
    graft.functions.VectorKernels.adcScore(c.asInstanceOf[ArrayData],
      ce.asInstanceOf[Int], dotFlat, normFlat, crossFlat, dotQC, normC,
      k, mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dotRef = ctx.addReferenceObj("adcDotFlat", dotFlat, "double[]")
    val normRef = ctx.addReferenceObj("adcNormFlat", normFlat, "double[]")
    val crossRef = ctx.addReferenceObj("adcCrossFlat", crossFlat, "double[]")
    val dotQCRef = ctx.addReferenceObj("adcDotQC", dotQC, "double[]")
    val normCRef = ctx.addReferenceObj("adcNormC", normC, "double[]")
    nullSafeCodeGen(ctx, ev, (c, ce) =>
      s"""${ev.value} = graft.functions.VectorKernels.adcScore($c, $ce,
         |  $dotRef, $normRef, $crossRef, $dotQCRef, $normCRef, $k, $mode);
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, cell = newRight)
}

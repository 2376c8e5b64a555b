package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

import graft.functions.VectorKernels

/** Codegen'd Catalyst expressions for the five reference distance metrics
  * (reference: crates/velesdb-core/src/distance.rs:16-81). Lives in an
  * `org.apache.spark.sql` subpackage to access `private[sql]` Catalyst
  * API (AbstractDataType, ExpressionUtils); the public facade is
  * [[graft.functions.VectorFunctions]].
  *
  * The expressions stay inside whole-stage codegen — generated Java calls
  * the static [[graft.functions.VectorKernels]] loops, and when the query
  * vector is a foldable literal it is materialized ONCE as a `float[]`
  * reference object instead of being re-decoded per row.
  */
abstract class VectorDistanceExpression extends BinaryExpression with ExpectsInputTypes {
  /** Static method name on graft.functions.VectorKernels. */
  def kernel: String
  protected def compute(a: Array[Float], b: Array[Float]): Double

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    // toFloats: null-ELEMENT-checked conversion — the bulk toFloatArray
    // silently read null slots as 0.0f (unsafe path) or NPE'd (generic
    // path); r15 review finding
    compute(VectorKernels.toFloats(a.asInstanceOf[ArrayData]),
      VectorKernels.toFloats(b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val constRight: Option[Array[Float]] =
      if (right.foldable) {
        Option(right.eval(null)).map(d =>
          VectorKernels.toFloats(d.asInstanceOf[ArrayData]))
      } else None
    constRight match {
      case Some(q) =>
        val qRef = ctx.addReferenceObj("queryVec", q, "float[]")
        val leftGen = left.genCode(ctx)
        ev.copy(code = code"""
          ${leftGen.code}
          boolean ${ev.isNull} = ${leftGen.isNull};
          double ${ev.value} = 0.0;
          if (!${ev.isNull}) {
            ${ev.value} = graft.functions.VectorKernels.$kernel(
              graft.functions.VectorKernels.toFloats(${leftGen.value}), $qRef);
          }""")
      case None =>
        nullSafeCodeGen(ctx, ev, (a, b) =>
          s"${ev.value} = graft.functions.VectorKernels.$kernel(" +
            s"graft.functions.VectorKernels.toFloats($a), " +
            s"graft.functions.VectorKernels.toFloats($b));")
    }
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def kernel: String = "cosine"
  override protected def compute(a: Array[Float], b: Array[Float]): Double =
    VectorKernels.cosine(a, b)
  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def kernel: String = "dot"
  override protected def compute(a: Array[Float], b: Array[Float]): Double =
    VectorKernels.dot(a, b)
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class EuclideanDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def kernel: String = "l2"
  override protected def compute(a: Array[Float], b: Array[Float]): Double =
    VectorKernels.l2(a, b)
  override def prettyName: String = "l2_dist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class HammingDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def kernel: String = "hamming"
  override protected def compute(a: Array[Float], b: Array[Float]): Double =
    VectorKernels.hamming(a, b)
  override def prettyName: String = "hamming_dist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class JaccardSimilarity(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def kernel: String = "jaccard"
  override protected def compute(a: Array[Float], b: Array[Float]): Double =
    VectorKernels.jaccard(a, b)
  override def prettyName: String = "jaccard_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Elementwise half-precision round-trip over an `array<float>` column
  * (reference: half_precision.rs — `VectorData::from_f32_slice` +
  * `to_f32_vec`). `fmt` is "f16" (IEEE binary16) or "bf16" (bfloat16);
  * the output holds the exact f32 values a half-precision store would
  * return, so downstream scoring stays full-speed f32 codegen. Applied
  * once at collection PUBLISH time for `storage_mode='f16'/'bf16'`, not
  * per query. */
case class HalfRound(child: Expression, fmt: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(fmt == "f16" || fmt == "bf16", s"HalfRound: unknown format '$fmt'")
  private def kernel: String = if (fmt == "f16") "f16Round" else "bf16Round"

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  // output elements are never null: a null ELEMENT is rejected with a
  // typed error below (toFloatArray would otherwise NPE opaquely on
  // `[1.0, null]` during an f16/bf16 collection upsert)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = s"${fmt}_round"

  override def nullSafeEval(a: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    VectorKernels.requireNoNullElements(ad, prettyName)
    ArrayData.toArrayData(
      if (fmt == "f16") VectorKernels.f16Round(ad.toFloatArray())
      else VectorKernels.bf16Round(ad.toFloatArray()))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""graft.functions.VectorKernels.requireNoNullElements($a, "$prettyName");
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.VectorKernels.$kernel($a.toFloatArray()));
         |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** DOUBLE-typed Euclidean distance — the k-means assignment / silhouette
  * kernel. The clustering operators computed this as a
  * `zip_with`+`aggregate` higher-order-function fold, which evaluates an
  * interpreted lambda per ELEMENT (k×dim per row); this expression is
  * the same left-to-right IEEE accumulation as one codegen'd kernel
  * call. A foldable right side (the centroid literal) materializes once
  * as a `double[]` reference object. */
case class EuclideanDistanceDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_dist_d"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2Double(a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val constRight: Option[Array[Double]] =
      if (right.foldable) {
        Option(right.eval(null)).map(_.asInstanceOf[ArrayData].toDoubleArray())
      } else None
    constRight match {
      case Some(q) =>
        val qRef = ctx.addReferenceObj("centroidVec", q, "double[]")
        val leftGen = left.genCode(ctx)
        ev.copy(code = code"""
          ${leftGen.code}
          boolean ${ev.isNull} = ${leftGen.isNull};
          double ${ev.value} = 0.0;
          if (!${ev.isNull}) {
            ${ev.value} = graft.functions.VectorKernels.l2Double(
              ${leftGen.value}.toDoubleArray(), $qRef);
          }""")
      case None =>
        nullSafeCodeGen(ctx, ev, (a, b) =>
          s"${ev.value} = graft.functions.VectorKernels.l2Double(" +
            s"$a.toDoubleArray(), $b.toDoubleArray());")
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column ↔ Expression bridge for code outside org.apache.spark.sql. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A NATIVE scalar-subquery Column over `df`'s plan: Catalyst executes
    * the subquery inside the outer query (once, broadcast) instead of a
    * driver-side collect at plan-build time. */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        df.queryExecution.analyzed))

  /** Clone of `s` sharing the SparkContext but with its OWN SessionState
    * — runtime conf, temp views — copied from `s` (what Structured
    * Streaming itself does per query). `cloneSession` is private[sql],
    * hence surfaced here. Unlike `newSession()`, runtime conf changes
    * made on `s` since startup carry over. */
  def cloneSession(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}

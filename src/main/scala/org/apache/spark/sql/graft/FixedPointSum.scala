package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact fixed-point SUM over pre-scaled longs, accumulated in a
  * 128-bit signed integer carried as two Long buffer slots — the same
  * accumulation strategy DuckDB uses for `SUM(DECIMAL)` (int128
  * hugeint), expressed as a Catalyst [[DeclarativeAggregate]] so the
  * whole update/merge path stays inside whole-stage-codegen
  * HashAggregate as a handful of primitive long ops.
  *
  * Why: Spark's stock `Sum` over `DECIMAL(18,s)` widens the buffer to
  * `DECIMAL(28,s)`, which exceeds the compact-Long decimal range, so
  * every row's add churns JavaBigDecimal allocations. On TPC-H Q1 at
  * 18M rows that is 3.3× the cost of the same aggregation over
  * primitive sums (Q1Lab: 0.895 s decimal vs 0.270 s double vs
  * 0.149 s scan floor). The Spark optimizer's own `DecimalAggregates`
  * unscaled-long rewrite only fires at precision ≤ 8 — too narrow for
  * money columns.
  *
  * Semantics: input is the UNSCALED long of `CAST(x AS DECIMAL(18,s))`
  * (see `RelationalQueries.dsum`), so per-row rounding is identical to
  * the decimal plan and to the DuckDB oracle. The int128 running sum
  * is exact for ~2^64 input rows (overflow-free for any realistic
  * scan; stock decimal sum would overflow its 28-digit precision
  * around the same magnitude). Output is DOUBLE `sum / 10^scale`:
  * while the unscaled sum fits int64 the long→double conversion is
  * single-rounded (exactly the stock path); past int64 the hi/lo
  * recombination adds ≤1 ulp, the same tolerance DuckDB's own
  * decimal→double conversion (`unscaled.ToDouble() / 10^s`) carries.
  *
  * Null semantics match SQL SUM: nulls skipped, all-null/empty → null.
  */
case class FixedPointSum(child: Expression, scale: Int)
    extends DeclarativeAggregate with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "fixed_point_sum"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val nonEmpty =
    AttributeReference("nonEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, nonEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Wrapping long add regardless of the session ANSI mode — int128
    * limb arithmetic NEEDS two's-complement wraparound. */
  private def addW(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** (h1,l1) + (h2,l2) in int128: lo limbs add with wraparound, the
    * carry-out of the unsigned lo add ripples into the hi limb
    * (carry = ((a&b) | ((a|b) & ~r)) >>> 63, the standard carry-out
    * identity for r = a + b mod 2^64). */
  private def add128(h1: Expression, l1: Expression,
      h2: Expression, l2: Expression): (Expression, Expression) = {
    val newLo = addW(l1, l2)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(l1, l2),
        BitwiseAnd(BitwiseOr(l1, l2), BitwiseNot(newLo))),
      Literal(63))
    val newHi = addW(addW(h1, h2), carry)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // sign-extend the 64-bit input to int128: xHi = x >> 63 (0 or -1)
    val (nh, nl) = add128(hi, lo, ShiftRight(child, Literal(63)), child)
    Seq(
      If(IsNull(child), hi, nh),
      If(IsNull(child), lo, nl),
      Or(nonEmpty, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nh, nl) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(nh, nl, Or(nonEmpty.left, nonEmpty.right))
  }

  override lazy val evaluateExpression: Expression = {
    // exact path (the int128 is just a sign-extended int64 — true for
    // any realistic sum): rebuild the decimal from the unscaled long
    // and let Decimal.toDouble single-round, BIT-IDENTICAL to the
    // stock decimal Sum's output (a long→double→÷10^s chain would
    // double-round and drift 1 ulp — observed on q01's sum_charge)
    val fitsInt64 = EqualTo(hi, ShiftRight(lo, Literal(63)))
    val exact = Cast(MakeDecimal(lo, DecimalType.MAX_PRECISION, scale), DoubleType)
    // wide path (unscaled sum beyond ±9.2e18): hi·2^64 + unsigned(lo)
    // in doubles — hi·2^64 is an exact power-of-two scaling, the
    // unsigned lo reassembles from (lo >>> 1)·2 + (lo & 1); carries
    // ≤1 ulp, the tolerance any engine's decimal→double has up here
    val loUnsigned = addD(
      Multiply(Cast(ShiftRightUnsigned(lo, Literal(1)), DoubleType),
        Literal(2.0), EvalMode.LEGACY),
      Cast(BitwiseAnd(lo, Literal(1L)), DoubleType))
    val wide = Divide(
      addD(
        Multiply(Cast(hi, DoubleType),
          Literal(1.8446744073709552e19), EvalMode.LEGACY),
        loUnsigned),
      Literal(math.pow(10, scale)), EvalMode.LEGACY)
    If(nonEmpty, If(fitsInt64, exact, wide), Literal(null, DoubleType))
  }

  private def addD(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixedPointSum {
  import org.apache.spark.sql.Column

  /** `SUM(CAST(c AS DECIMAL(18,scale)))` as a double, computed exactly
    * via the int128 aggregate: the per-row decimal cast (identical
    * rounding to the stock plan and the DuckDB oracle) feeds its
    * unscaled long straight into [[FixedPointSum]] — no decimal adds. */
  def dsum(c: Column, scale: Int): Column = Bridge.column(
    FixedPointSum(
      UnscaledValue(Cast(Bridge.expression(c), DecimalType(18, scale))),
      scale).toAggregateExpression())
}

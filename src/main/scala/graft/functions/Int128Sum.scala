package graft.functions

import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, BinaryExpression, BitwiseAnd, BitwiseNot, BitwiseOr, Cast, EvalMode, Expression, If, IsNull, Literal, Not, Or, ShiftRight, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

/** Exact 128-bit integer sum of a BIGINT column, evaluated to the
  * correctly-rounded DOUBLE of the exact sum — DuckDB's
  * `CAST(sum(BIGINT) AS DOUBLE)` (HUGEINT sum) semantics on Spark.
  *
  * Why it exists: the alternative exact accumulator, `sum(CAST(x AS
  * DECIMAL(38,0)))`, leaves Spark's long-backed decimal fast path
  * (precision > 18) and does per-row BigDecimal arithmetic on byte-array
  * state — measured ~3× the whole aggregation's cost on the moment-sum
  * keys. This is a DeclarativeAggregate whose update/merge are pure
  * bitwise/add EXPRESSIONS (two-long state, carry via the classic
  * `((a&b)|((a|b)&~s))>>>63` trick), so it whole-stage-codegens like the
  * builtin sum and partial-aggregates exactly (integer adds commute).
  *
  * Overflow-proof to ±2¹²⁷ — at 100 TB a per-row product bounded by 10¹⁴
  * summed over 10¹² rows reaches 10²⁶, far past BIGINT (the reason this
  * exists) and far short of the 1.7×10³⁸ ceiling.
  *
  * Oracle parity: evaluate converts (hi, lo) through BigInteger →
  * doubleValue, a single correctly-rounded conversion of the exact
  * integer — the same value Spark's Decimal.toDouble produced and DuckDB's
  * HUGEINT→DOUBLE cast matches on all checked data.
  */
case class Int128SumDouble(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  // Integral inputs only: INT/SMALLINT/TINYINT widen losslessly to BIGINT;
  // fractional/decimal/string inputs are rejected at ANALYSIS with a clear
  // message instead of building an ill-typed bitwise tree that dies
  // cryptically at codegen. (ExpectsInputTypes is unusable here —
  // AbstractDataType is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    // Bare NULL literal: all-NULL input, evaluates to NULL via the nz flag —
    // matching builtin sum and DuckDB, which both accept sum(NULL).
    case org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sum_i128 requires an integral input (TINYINT..BIGINT), got ${other.catalogString}")
  }

  /** Input widened to BIGINT (no-op for BIGINT; lossless for narrower). */
  private lazy val input: Expression =
    if (child.dataType == LongType) child
    else Cast(child, LongType, evalMode = EvalMode.LEGACY)

  override def dataType: DataType = DoubleType
  // sum-over-zero-rows (or all-NULL input) is NULL, matching both the
  // builtin sum and DuckDB — a zero-initialized state alone would yield
  // 0.0 for a global aggregate over an empty relation.
  override def nullable: Boolean = true
  override def prettyName: String = "sum_i128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val nz = AttributeReference("nz", BooleanType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, nz)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Wrapping 64-bit add — EvalMode.LEGACY, never ANSI: low-word overflow
    * IS the carry mechanism (Spark 4 defaults to ANSI adds, which throw).
    */
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Unsigned-overflow bit of s = a + b, as 0/1. */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val v = If(IsNull(input), Literal(0L), input) // sum semantics: nulls contribute 0
    val vhi = ShiftRight(v, Literal(63))          // sign-extend to 128 bits
    val newLo = wadd(lo, v)
    val newHi = wadd(wadd(hi, vhi), carry(lo, v, newLo))
    Seq(newHi, newLo, Or(nz, Not(IsNull(input))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = wadd(lo.left, lo.right)
    val newHi = wadd(wadd(hi.left, hi.right), carry(lo.left, lo.right, newLo))
    Seq(newHi, newLo, Or(nz.left, nz.right))
  }

  override lazy val evaluateExpression: Expression =
    If(nz, Int128ToDouble(hi, lo), Literal(null, DoubleType))

  override protected def withNewChildInternal(c: Expression): Int128SumDouble =
    copy(child = c)
}

/** (hi, lo) two's-complement int128 → correctly-rounded double. Runs once
  * per group at final evaluation, so the slow exact BigInteger path off
  * the int64 fast path costs nothing.
  */
case class Int128ToDouble(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "int128_to_double"

  override def nullSafeEval(h: Any, l: Any): Any =
    Int128ToDouble.toDouble(h.asInstanceOf[Long], l.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, l) =>
      s"graft.functions.Int128ToDouble.toDouble($h, $l)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int128ToDouble =
    copy(left = l, right = r)
}

object Int128ToDouble {
  def toDouble(hi: Long, lo: Long): Double = {
    if ((hi == 0L && lo >= 0L) || (hi == -1L && lo < 0L)) lo.toDouble // fits int64: exact fast path
    else java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
      .doubleValue()
  }
}

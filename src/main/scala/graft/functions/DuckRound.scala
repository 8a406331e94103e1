package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** C-library double rounding: round(x·10ᵖ)/10ᵖ with ties away from zero —
  * the algorithm DuckDB's `round(DOUBLE, p)` executes (std::round of the
  * scaled value, guarded to return the input on overflow to ±inf/NaN).
  *
  * Why not Spark's builtin `round`: it routes every double through
  * BigDecimal.setScale (HALF_UP on the exact decimal expansion). That is
  * (a) ~8× slower per value than a pure-double op — builtin-round
  * dominated fn_trig's bench time — and (b) subtly DIFFERENT from the
  * oracle: the decimal expansion of the double can round the other way
  * from the scaled-double algorithm, and BigDecimal drops the sign of
  * -0.0 while std::round keeps it (the r3 agg_corr_stats hash miss).
  * Executing the oracle's own algorithm makes parity structural.
  */
object DuckRound {
  /** Java translation of std::round(x·pow10)/pow10. The fractional part
    * `a - floor(a)` of a double < 2⁵³ is exact, so the >= .5 test is the
    * precise ties-away-from-zero rule, and copySign preserves -0.0.
    */
  def round(x: Double, pow10: Double): Double = {
    val y = x * pow10
    if (java.lang.Double.isNaN(y) || java.lang.Double.isInfinite(y)) return x
    val a = math.abs(y)
    val f = math.floor(a)
    val r = math.copySign(if (a - f >= 0.5) f + 1.0 else f, y) / pow10
    if (java.lang.Double.isInfinite(r) || java.lang.Double.isNaN(r)) x else r
  }
}

case class DuckRoundExpr(child: Expression, scale: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(scale >= 0 && scale <= 15, s"scale $scale out of range")
  private val pow10: Double = math.pow(10.0, scale)

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "duck_round"

  override def nullSafeEval(x: Any): Any =
    DuckRound.round(x.asInstanceOf[Double], pow10)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DuckRound.round($c, ${java.lang.Double.toString(pow10)}D)")

  override protected def withNewChildInternal(c: Expression): DuckRoundExpr =
    copy(child = c)
}

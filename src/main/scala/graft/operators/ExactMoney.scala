package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{round, sum}

/** The exact-integer money-sum recipe (round-15 class closure), in ONE
  * place — Spark DSL side and oracle-SQL side in lockstep — so a new
  * money column cannot re-open the class by hand-editing one of the two
  * (round-15 VERDICT task 3). Callers: tpchQ1Sql/tpchQ5Sql and
  * agg_rollup/agg_cube in Relational.scala, join_smj_facts in
  * Joins.scala; the bit-identity property lives in ExactMoneySpec.
  *
  * THE CLASS IT CLOSES: summing dollar DOUBLEs and rounding the sum
  * breaks cross-engine at giant magnitudes two distinct ways —
  * (a) double partial-sum ORDER noise grows with magnitude until it
  * crosses the round quantum (rollup/cube/smj grand totals at ×64
  * facts), and (b) `round(double, k)` ITSELF diverges between DuckDB's
  * multiply-based round and Spark's BigDecimal round whenever x·10^k
  * lands within ~ULP/2 of a half-quantum (q1's whole-table sums at
  * ×64f — adjudicated against exact rational arithmetic, BASELINE.md
  * round-15). THE RECIPE: quantize each ROW to integer units of the
  * output quantum, sum exactly in DECIMAL, then ONE int64→double cast +
  * ONE exact-power-of-ten division. Every step is correctly rounded on
  * identical operands in both engines, so the outputs are bit-identical
  * BY CONSTRUCTION wherever the sum fits BIGINT (the shipped call sites
  * use ≤ ~2% of the range at ×64 facts; headroom ~×3000).
  *
  * CHOOSING rowPrec: the smallest decimal precision that bounds the
  * per-ROW |units|. ≤ 8 is the fast path — Catalyst's DecimalAggregates
  * rewrite (precision + 10 ≤ 18) runs the sum as unscaled longs
  * (UnscaledValue in the plan); the (38,0) first cut of rollup/cube took
  * the 16-byte decimal path instead and tripled the key's wall through
  * rollup's 3× Expand (caught by the r15 closing bench). Product rows
  * (cents × cents-complement) exceed 8 digits and must take a wider
  * precision. The bound is LOUD, never silently wrong: a row wider than
  * rowPrec digits throws CAST_OVERFLOW under Spark ANSI and a conversion
  * error in DuckDB; the SUM itself carries rowPrec+10 digits (Spark) /
  * 38 digits (DuckDB) of headroom, and decimal-sum overflow is again
  * loud under ANSI.
  */
object ExactMoney {

  /** "1", "100", "10000" — integer power-of-ten literal for SQL texts. */
  private def p10(d: Int): String = {
    require(d >= 0 && d <= 15, s"power-of-ten quantum out of range: $d")
    "1" + "0" * d
  }

  /** Quantize a d-decimal money DOUBLE column to integer units.
    * Half-away-from-zero `round` is engine-identical; d = 0 is the
    * integral-valued-double case (quantities), where round-THEN-cast is
    * load-bearing, not defensive decoration: Spark's bare double→bigint
    * cast truncates toward zero while DuckDB's CAST rounds to nearest,
    * so a non-integral value (a 17.5 in a future perturbed corpus)
    * would silently diverge by 1 per row without the round (r15
    * ADVICE). With it, both engines round identically before an exact
    * integral cast.
    */
  def units(c: Column, d: Int): Column =
    (if (d == 0) round(c) else round(c * p10(d).toLong)).cast("bigint")

  /** SQL text of [[units]], parsed identically by Spark and DuckDB. */
  def unitsSql(e: String, d: Int): String =
    if (d == 0) s"CAST(round($e) AS BIGINT)"
    else s"CAST(round($e * ${p10(d)}) AS BIGINT)"

  /** Exact sum of integer row units, rendered back to BIGINT. */
  def sumUnits(rowUnits: Column, rowPrec: Int): Column =
    sum(rowUnits.cast(s"decimal($rowPrec,0)")).cast("bigint")

  /** SQL text of [[sumUnits]]: DuckDB sums DECIMAL(p,0) into
    * DECIMAL(38,0) (exact), Spark into DECIMAL(min(38,p+10),0) — and
    * for p ≤ 8 Spark's DecimalAggregates runs it as unscaled longs.
    */
  def sumUnitsSql(e: String, rowPrec: Int): String =
    s"CAST(sum(CAST($e AS DECIMAL($rowPrec,0))) AS BIGINT)"

  /** Render a BIGINT units value as a DOUBLE at 10^-d units: one
    * correctly-rounded int64→double cast, then one division by an
    * exactly-representable power of ten — both deterministic IEEE ops,
    * identical in both engines. NO round() afterwards: the result IS
    * the value, and a trailing round(double, k) is exactly the
    * divergence class this module exists to avoid.
    */
  def toDollars(unitsSum: Column, d: Int): Column =
    if (d == 0) unitsSum.cast("double")
    else unitsSum.cast("double") / p10(d).toDouble

  /** SQL text of [[toDollars]]. */
  def toDollarsSql(e: String, d: Int): String =
    if (d == 0) s"CAST($e AS DOUBLE)"
    else s"CAST($e AS DOUBLE) / ${p10(d)}.0"

  /** The whole recipe: exact decimal sum of integer units → BIGINT →
    * DOUBLE at 10^-outDiv units.
    */
  def exactSum(rowUnits: Column, rowPrec: Int, outDiv: Int): Column =
    toDollars(sumUnits(rowUnits, rowPrec), outDiv)

  /** SQL text of [[exactSum]], shared-dialect (Spark + DuckDB). */
  def exactSumSql(e: String, rowPrec: Int, outDiv: Int): String =
    toDollarsSql(sumUnitsSql(e, rowPrec), outDiv)

  /** SIGN-SAFE half-up quantization of an integer-units expression to a
    * coarser quantum (drop `d` low decimal digits): ties round toward
    * +∞. Pure integer arithmetic with sign-of-dividend `%` — identical
    * in Spark and DuckDB, so the q1 sum_charge cents³→4dp quantize is
    * engine-exact by construction. The naive `x + h - (x + h) % q` is
    * half-up only for x ≥ 0: with sign-of-dividend `%`, x = -149,
    * q = 100 yields 0 instead of -100 (r15 ADVICE). The double-% form
    * below is floor((x+h)/q)·q for EITHER sign (for non-negative x the
    * two forms coincide, so shipped outputs are unchanged; money here
    * is non-negative, but credits/refunds stay correct).
    */
  def halfUpDropSql(e: String, d: Int): String = {
    require(d >= 1 && d <= 15, s"digits to drop out of range: $d")
    val q = p10(d)
    val h = p10(d).toLong / 2
    s"(($e + $h) - ((($e + $h) % $q + $q) % $q))"
  }
}

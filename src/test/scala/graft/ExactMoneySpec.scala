package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactMoney

/** Property tests for the shared exact-integer money-sum recipe
  * (r15 VERDICT task 3): bit-identity of the rendered double against
  * EXACT RATIONAL arithmetic at the boundary magnitudes that broke the
  * naive forms at ×64 facts, sign-safety of the half-up integer
  * quantize, the round-before-cast double→integer semantics, and the
  * DecimalAggregates unscaled-long plan contract the rowPrec ≤ 8 call
  * sites rely on.
  */
class ExactMoneySpec extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  /** Split an exact integer-units total into ≤ maxRow chunks (all the
    * same sign as n) so a Spark sum over the rows reconstructs n
    * exactly iff the decimal-sum path is exact.
    */
  private def chunks(n: BigInt, maxRow: Long): Seq[Long] = {
    val m = BigInt(maxRow)
    val full = (n.abs / m).toInt
    val rest = (n.abs % m).toLong
    val sgn = n.signum
    (Seq.fill(full)(maxRow) ++ (if (rest != 0) Seq(rest) else Nil))
      .map(_ * sgn)
  }

  test("exactSum is bit-identical to exact rational arithmetic at " +
    "boundary magnitudes (the r15 round(double,k) divergence class)") {
    // Sums PAST 2^53 where a double ULP is a macroscopic fraction of the
    // output quantum — the regime where ×64f caught q1/rollup/cube/smj.
    // For each output quantum 10^-d, plant totals exactly AT and one
    // unit either side of a half-quantum boundary: the adversarial
    // inputs for any rounding step. The recipe has NO rounding step
    // after the sum — its claim is that one correctly-rounded
    // int64→double cast + one exact-power-of-ten division land within
    // 1 ulp of the true rational and are deterministic given n.
    val magnitudes = Seq(
      BigInt(9007199254740993L),   // 2^53 + 1: first integer a double drops
      BigInt(180000000000000000L), // ~1.8e17: the measured q1 ×64f class
      BigInt(4500000000000000000L) // ~half the BIGINT range: deep headroom
    )
    for (mag <- magnitudes; d <- Seq(2, 4, 6); delta <- Seq(-1L, 0L, 1L)) {
      val q = BigInt(10).pow(d)
      val n = (mag / q) * q + q / 2 + delta // at/straddling a half-quantum
      val rows = chunks(n, 900000000000000000L).toDF("u")
      val got = rows.agg(ExactMoney.exactSum(col("u"), 18, d).as("v"))
        .head().getDouble(0)
      // The recipe reference, in plain JVM ops on the EXACT integer sum:
      // BigInt-exact sum → long → one cast + one division.
      val expect = n.toLong.toDouble / math.pow(10, d)
      assert(java.lang.Double.doubleToLongBits(got)
        == java.lang.Double.doubleToLongBits(expect),
        s"mag=$mag d=$d delta=$delta: got=$got expect=$expect")
      // And the recipe is honest: two correctly-rounded ops (cast, then
      // divide) each contribute <= 0.5 ulp, so the result sits within
      // 2 ulp of the true rational (measured max ~1.3 ulp at 1.8e17;
      // a single rounding could do 0.5 — determinism, not last-ulp
      // accuracy, is what cross-engine exactness needs).
      val rational = BigDecimal(n) / BigDecimal(10).pow(d)
      val err = (BigDecimal(got) - rational).abs
      assert(err <= BigDecimal(2 * math.ulp(got)),
        s"mag=$mag d=$d delta=$delta: off by $err > 2 ulp")
    }
  }

  test("exactSum at rowPrec 8 (the fast path) equals the rowPrec 38 " +
    "slow path and the exact BigInt sum") {
    val rows = (1L to 4000L).map(i => (i * 7919L) % 99999999L)
    val n = rows.map(BigInt(_)).sum
    val df = rows.toDF("u")
    val fast = df.agg(ExactMoney.exactSum(col("u"), 8, 2)).head().getDouble(0)
    val slow = df.agg(ExactMoney.exactSum(col("u"), 38, 2)).head().getDouble(0)
    val expect = n.toLong.toDouble / 100.0
    assert(java.lang.Double.doubleToLongBits(fast)
      == java.lang.Double.doubleToLongBits(expect))
    assert(java.lang.Double.doubleToLongBits(slow)
      == java.lang.Double.doubleToLongBits(expect))
  }

  test("rowPrec <= 8 call sites take the DecimalAggregates unscaled-long " +
    "path (UnscaledValue in the executed plan)") {
    // Pins the perf contract the (38,0)->(8,0) r15 fix bought: losing it
    // again (a hand-edited precision) tripled agg_rollup's wall through
    // the 3x Expand before the closing bench caught it.
    val p = SparkEntry.queries("agg_rollup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("UnscaledValue"),
      s"agg_rollup lost the unscaled-long decimal-sum rewrite:\n$p")
  }

  test("rollup/cube quantize is hoisted BELOW the Expand (evaluated once " +
    "per input row, not per expanded row)") {
    // The perf contract of the r16 hoist: inside exactSum the units()
    // round/cast sat in the aggregate's input expressions, which
    // rollup/cube evaluate per EXPANDED row (3x/4x) — measured ~22% of
    // the key's wall. The hoist projects integer `qu`/`pu` columns
    // before .rollup, so ExpandExec's child must already OUTPUT them;
    // inlining the quantize back would make them vanish from the
    // Expand input and this test fails before the bench does.
    // String-form check (AQE's executedPlan wrapper hides the tree from
    // collect() until materialized; count() finalizes, toString renders
    // the final plan like PlanSpec does).
    for ((key, cols) <- Seq("agg_rollup" -> Seq("qu#", "pu#"),
                            "agg_cube" -> Seq("pu#"))) {
      val df = SparkEntry.queries(key)(spark, sf)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val expandLine = p.linesIterator.find(_.contains("Expand"))
      assert(expandLine.nonEmpty, s"$key lost its Expand (rollup/cube shape):\n$p")
      cols.foreach { c =>
        assert(expandLine.get.contains(c),
          s"$key: quantized column '$c' not in the Expand input — the " +
            s"units() hoist regressed back into the aggregate:\n${expandLine.get}")
      }
    }
  }

  test("halfUpDropSql is sign-safe: floor((x+h)/q)*q for either sign " +
    "(ties toward +inf), not the non-negative-only naive form") {
    val xs = Seq(-250L, -201L, -200L, -199L, -151L, -150L, -149L, -101L,
      -100L, -99L, -51L, -50L, -49L, -1L, 0L, 1L, 49L, 50L, 51L, 99L,
      100L, 149L, 150L, 151L, 199L, 249L, 250L,
      Long.MaxValue / 2, -(Long.MaxValue / 2))
    val got = xs.toDF("x")
      .select(col("x"), expr(ExactMoney.halfUpDropSql("x", 2)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val expect = Math.floorDiv(x + 50L, 100L) * 100L
      assert(got(x) == expect, s"x=$x: got=${got(x)} expect=$expect")
      // The r15 ADVICE counterexample stays pinned explicitly:
      if (x == -149L) assert(got(x) == -100L)
    }
  }

  test("units(c, 0) rounds BEFORE the integral cast, half away from " +
    "zero — the engine-identical double->integer semantics") {
    // Spark's bare cast(double as bigint) truncates toward zero while
    // DuckDB's CAST rounds to nearest: 17.5 would silently read 17 vs
    // 18 cross-engine without the round (r15 ADVICE). Pin the Spark
    // side to half-away-from-zero, which DuckDB's round() also uses.
    val vs = Seq(17.5, -17.5, 17.49, -17.49, 2.5, -2.5, 0.5, -0.5, 0.0, 42.0)
    val got = vs.toDF("v")
      .select(col("v"), ExactMoney.units(col("v"), 0).as("u"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val expect = Map(17.5 -> 18L, -17.5 -> -18L, 17.49 -> 17L,
      -17.49 -> -17L, 2.5 -> 3L, -2.5 -> -3L, 0.5 -> 1L, -0.5 -> -1L,
      0.0 -> 0L, 42.0 -> 42L)
    expect.foreach { case (v, e) =>
      assert(got(v) == e, s"units($v, 0): got=${got(v)} expect=$e")
    }
  }

  test("units(c, 2) recovers the true cents of any 2-dp money double " +
    "(quantization is exact on the money domain)") {
    // 123.45 as a double is NOT 123.45; *100 can land at 12344.999...
    // — the round() recovers the intended integer. Exhaustive-ish over
    // deterministic pseudo-random 2-dp values in the call sites' domain.
    val cents = (1 to 2000).map(i => ((i * 2654435761L) % 99999999L + 1L))
    val vs = cents.map(c => c / 100.0) // the parquet double a writer emits
    val got = vs.toDF("v").select(ExactMoney.units(col("v"), 2).as("u"))
      .collect().map(_.getLong(0))
    got.zip(cents).zip(vs).foreach { case ((g, c), v) =>
      assert(g == c, s"units($v, 2): got=$g expect=$c")
    }
  }
}

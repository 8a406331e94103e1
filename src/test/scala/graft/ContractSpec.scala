package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query runs at sf0.001, flagship is
  * non-empty, and the oracle map stays consistent with the query map.
  */
class ContractSpec extends AnyFunSuite {
  import SparkFixture._

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every key has an oracle — sketch keys emit tolerance verdicts") {
    // Since r6 the two sketch keys emit engine-agnostic tolerance
    // verdicts (exact value + boolean) instead of raw sketch values, so
    // the FULL inventory is DuckDB-checkable: no key may lack an oracle.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less keys: $noOracle")
  }

  test("every query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(name)(assert(n >= 0))
    }
  }

  test("T.normalizeTs maps both fixture generations to TIMESTAMP") {
    // The 2026-08-13 regeneration switched events.ts from TIMESTAMP(NANOS)
    // (readable only as raw longs) to timestamp[µs]/NTZ; a future
    // regeneration could switch back. Both branches must stay alive:
    // identical instants out, TimestampType out, regardless of input type.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    import spark.implicits._
    val microsUtc = 1704067199123456L // 2023-12-31 23:59:59.123456 UTC
    // Legacy generation: ts arrives as raw NANOS long.
    val legacy = T.normalizeTs(Seq(microsUtc * 1000L).toDF("ts"))
    // Current generation: ts arrives as TIMESTAMP_NTZ. Built from LITERAL
    // wall-clock fields (make_timestamp_ntz), NOT via a round-trip cast:
    // a cast-constructed NTZ and the cast back are inverse session-TZ
    // shifts, so that leg would pass under ANY timezone and could never
    // catch the cast ceasing to be value-preserving (r9 ADVICE). With a
    // literal NTZ, the unix_micros equality below holds ONLY when the
    // NTZ→LTZ cast runs under a UTC session — the invariant normalizeTs
    // now asserts.
    val ntz = T.normalizeTs(
      spark.sql(
        "SELECT make_timestamp_ntz(2023, 12, 31, 23, 59, 59.123456) AS ts"))
    for ((df, gen) <- Seq(legacy -> "legacy-nanos", ntz -> "ntz-micros")) {
      withClue(gen) {
        assert(df.schema("ts").dataType == TimestampType)
        assert(df.select(unix_micros(col("ts"))).head.getLong(0) == microsUtc)
      }
    }
    // And the live fixture loader lands on the same contract: every
    // watermark/window/date_trunc downstream assumes TimestampType.
    assert(T.events(spark, sf).schema("ts").dataType == TimestampType)
  }
}

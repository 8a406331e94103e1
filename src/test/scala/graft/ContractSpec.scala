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
}

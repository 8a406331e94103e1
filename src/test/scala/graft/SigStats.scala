package graft
/** One-off probe (r15): simhash signature-collision head at scale. */
object SigStats {
  def main(args: Array[String]): Unit = {
    val s = SparkFixture.spark
    import org.apache.spark.sql.functions._
    args.foreach { d =>
      val sig = operators.Dedup.simhashDS(s, d)
      val g = sig.groupBy(col("simhash")).count().persist()
      val r = g.agg(count(lit(1)), max(col("count")), sum(expr("count*(count-1)/2"))).head()
      val top = g.orderBy(desc("count")).limit(5).collect()
        .map(r => s"${r.getLong(1)}").mkString(",")
      println(s"[sigstats] $d distinct=${r.getLong(0)} maxgrp=${r.getLong(1)} identical_sig_pairs=${r.get(2)} top5=$top")
      s.catalog.clearCache()
    }
  }
}

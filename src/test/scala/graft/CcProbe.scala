package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r19): decompose dedup_cluster_cc — how much is candidate
  * pair generation vs the label-propagation loop, and how many rounds
  * does the loop run at this sf? Run with Test/runMain graft.CcProbe.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }

    (1 to 2).foreach { it =>
      spark.catalog.clearCache()
      println(s"[ccprobe] --- iteration $it ---")
      // Stage 1: candidate pairs (the shared jaccardPairs subtree).
      val edges = time("pairs (materialize)") {
        val e = operators.Dedup.jaccardPairs(spark, sfDir)
          .filter(col("jaccard") >= 0.8)
          .select(col("a_id"), col("b_id"))
          .persist()
        e.count()
        e
      }
      val und = time("undirect (materialize)") {
        val u = edges.union(edges.select(col("b_id"), col("a_id")))
          .toDF("src", "dst").persist()
        u.count()
        u
      }
      // Stage 2: the label loop, inlined with per-round timing (same
      // algorithm as minLabelComponents).
      val labels = time("label loop total") {
        var labels = und.select(col("src").as("id")).distinct()
          .withColumn("comp", col("id")).localCheckpoint(true)
        def compSum(): Option[Long] =
          Option(labels.agg(sum(col("comp"))).first().getAs[java.lang.Long](0))
            .map(_.longValue())
        var oldSum = Option(Long.MaxValue)
        var newSum = compSum()
        var round = 0
        while (newSum.isDefined && newSum != oldSum && round < 15) {
          time(f"  round $round") {
            val prop = und.join(labels, und("dst") === labels("id"))
              .select(und("src").as("id"), col("comp"))
            val nbrMin = labels.union(prop)
              .groupBy(col("id")).agg(min(col("comp")).as("comp"))
            val jump = nbrMin.select(col("id").as("jid"), col("comp").as("jcomp"))
            labels = nbrMin.join(jump, col("comp") === col("jid"), "left")
              .select(col("id"),
                least(col("comp"), coalesce(col("jcomp"), col("comp")))
                  .as("comp"))
              .localCheckpoint(true)
            oldSum = newSum
            newSum = compSum()
            round += 1
          }
        }
        println(s"[ccprobe] rounds=$round")
        labels
      }
      time("sized join + collect") {
        val sized = labels.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
        labels.join(sized, "comp").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r19): is win_range_numeric's cost the sliding RANGE frame
  * replay (Spark re-aggregates the frame whenever the lower bound moves)
  * or the scan/exchange floor? Times the key with different frame widths
  * — if replay dominates, cost scales with frame width.
  */
object WinProbe {
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

    def key(band: Double) = {
      val bandC = (band * 100).toLong
      val w = 2 * bandC
      val base = T.events(spark, sfDir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("value"),
          expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
        .withColumn("bkt", expr(s"CAST(floor(vc / $w.0) AS BIGINT)"))
      val anchors = base.withColumn("is_anchor", lit(true))
      val carryIn = base
        .filter(expr(s"vc - $w * CAST(floor(vc / $w.0) AS BIGINT) >= ${w - bandC}"))
        .withColumn("bkt", col("bkt") + 1)
        .withColumn("is_anchor", lit(false))
      anchors.unionByName(carryIn)
        .select(col("event_id"), col("value"), col("is_anchor"),
          expr(s"""count(*) OVER (PARTITION BY bkt ORDER BY value
                  RANGE BETWEEN $band PRECEDING AND CURRENT ROW)""").as("band_n"),
          T.r2(expr(s"""sum(vc) OVER (PARTITION BY bkt ORDER BY value
                     RANGE BETWEEN $band PRECEDING AND CURRENT ROW)""") / 100.0)
            .as("band_sum"))
        .filter(col("is_anchor"))
        .select(col("event_id"), col("value"), col("band_n"), col("band_sum"))
    }
    def noWindow() = {
      // same scan/union/exchange/sort shape, trivial frame work
      val base = T.events(spark, sfDir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("value"),
          expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
        .withColumn("bkt", expr("CAST(floor(vc / 2000.0) AS BIGINT)"))
      val anchors = base.withColumn("is_anchor", lit(true))
      val carryIn = base
        .filter(expr("vc - 2000 * CAST(floor(vc / 2000.0) AS BIGINT) >= 1000"))
        .withColumn("bkt", col("bkt") + 1)
        .withColumn("is_anchor", lit(false))
      anchors.unionByName(carryIn)
        .select(col("event_id"), col("value"), col("is_anchor"),
          expr("""count(*) OVER (PARTITION BY bkt ORDER BY value
                  ROWS BETWEEN CURRENT ROW AND CURRENT ROW)""").as("band_n"))
        .filter(col("is_anchor"))
    }
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = (1 to 3).map(_ => once()).min
      println(f"[winprobe] $label%-24s ${t}%6.3f s")
    }
    time("key band=10 (shipped)")(key(10.0))
    time("key band=1")(key(1.0))
    time("key band=40")(key(40.0))
    time("no-window shape")(noWindow())
    spark.stop()
  }
}

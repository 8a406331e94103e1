package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool (r18 optimization round): dump `.explain("formatted")` for
  * declared queries to one file per key, under the SAME session config as
  * Bench (master width, shuffle partitions, split sizes) so the plans are
  * the ones the bench actually times.
  *
  * Usage: runMain graft.PlanExplain <outDir> <suffix> [key1,key2,...]
  *   e.g. runMain graft.PlanExplain plans/r18 before sql_tpch_q5,agg_percentiles
  * With no key list, dumps every declared key. Streaming keys execute their
  * micro-batch runs as a side effect of building the returned DataFrame —
  * their explain is the final batch read-back, which is still the plan the
  * driver hashes.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys: Seq[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
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
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${k}_$suffix.txt"), txt)
        println(s"[planexplain] $k ok")
      } catch {
        case e: Throwable =>
          System.err.println(s"[planexplain] $k FAILED: ${e.getMessage}")
      } finally {
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object ParProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("dedup_embed_cosine")(spark, "/tmp/graft_sfx64d")
    df.count()  // warmup
    val t0 = System.nanoTime(); df.count()
    println(s"[parprobe] 1m-split run: ${(System.nanoTime()-t0)/1e9} s")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r19): which expression dominates fn_try_ansi?
  * Times each try_ expression separately over part at the bench config.
  * Not part of any suite — run with Test/runMain graft.TryProbe.
  */
object TryProbe {
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
    T.part(spark, sfDir).createOrReplaceTempView("part_try")
    val variants = Seq(
      "baseline_key" -> SparkEntry.queries("fn_try_ansi"),
      "only_scan" -> ((s: SparkSession, d: String) =>
        s.sql("SELECT p_partkey FROM part_try")),
      "only_div" -> ((s: SparkSession, d: String) =>
        s.sql("SELECT p_partkey, round(try_divide(p_retailprice, p_size - 25), 6) + 0.0 AS x FROM part_try")),
      "only_add" -> ((s: SparkSession, d: String) =>
        s.sql("SELECT p_partkey, try_add(9223372036854775807, p_partkey) AS x FROM part_try")),
      "only_cast" -> ((s: SparkSession, d: String) =>
        s.sql("SELECT p_partkey, try_cast(p_brand AS INT) AS x FROM part_try")),
      "only_elem" -> ((s: SparkSession, d: String) =>
        s.sql("SELECT p_partkey, try_element_at(array(1, 2), CAST(nullif(p_size, 0) AS INT)) AS x FROM part_try")),
      "only_ts_guarded" -> ((s: SparkSession, d: String) =>
        s.sql("""SELECT p_partkey, CASE WHEN p_brand RLIKE '^\\s*[+-]?[0-9]' THEN try_to_timestamp(p_brand, 'yyyy-MM-dd') END AS x FROM part_try""")),
      "only_ts_unguarded" -> ((s: SparkSession, d: String) =>
        s.sql("SELECT p_partkey, try_to_timestamp(p_brand, 'yyyy-MM-dd') AS x FROM part_try"))
    )
    variants.foreach { case (name, fn) =>
      // one warm-up + min of 3
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = (1 to 3).map(_ => once()).min
      println(f"[tryprobe] $name%-18s ${t}%6.3f s")
    }
    spark.stop()
  }
}

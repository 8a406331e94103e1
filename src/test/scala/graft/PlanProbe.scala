package graft
/** Dev tool: time one key and dump its executed plan.
  * Key/dir via SPARK_GRAFT_PROBE_KEY / SPARK_GRAFT_PROBE_DIR
  * (defaults: dedup_embed_cosine on the x64d probe corpus).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkFixture.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/graft_sfx64d")
    val k = sys.env.getOrElse("SPARK_GRAFT_PROBE_KEY", "dedup_embed_cosine")
    val df = SparkEntry.queries(k)(s, d)
    val t0 = System.nanoTime()
    df.count()
    println(s"[planprobe] $k count took ${(System.nanoTime()-t0)/1e9} s")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/probe_plan.txt"),
      df.queryExecution.executedPlan.toString)
    println("[planprobe] plan written to /tmp/probe_plan.txt")
  }
}

package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkFixture.spark
    val d = "/tmp/graft_sfx64d"
    val df = SparkEntry.queries("dedup_embed_cosine")(s, d)
    val t0 = System.nanoTime()
    df.count()
    println(s"[planprobe] count took ${(System.nanoTime()-t0)/1e9} s")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/embed_plan.txt"),
      df.queryExecution.executedPlan.toString)
    println("[planprobe] plan written")
  }
}

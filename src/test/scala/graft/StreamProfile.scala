package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable

/** Listener-based wall breakdown of the checkpointed streaming keys
  * (VERDICT r16 task 3): where does a ~1.5–2 s pinned key actually spend
  * its wall — stream START (plan + source discovery before the first
  * trigger), the micro-batches themselves (triggerExecution, split into
  * addBatch / walCommit / stateStoreCommit / getBatch / queryPlanning),
  * STOP (termination after the last commit), or the surrounding batch
  * work (input staging fingerprint check, sink read-back)?
  *
  * Usage: sbt "Test/runMain graft.StreamProfile [key] [sfDir] [runs]"
  *   key defaults to stream_late_drop; pass `all` for the whole
  *   checkpointed family. Conf A/B via SPARK_GRAFT_CONF ("k=v;k=v"), e.g.
  *   spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false.
  *
  * Methodology mirrors Bench: same session confs, one untimed warm-up
  * invocation of the key first (JVM-global streaming first-touch is paid
  * by Bench's untimed toy warm-up; here the first real run serves), then
  * `runs` timed invocations, each fully executed via the noop sink.
  */
object StreamProfile {
  private case class BatchRow(batchId: Long, numInputRows: Long,
                              durations: Map[String, Long])

  def main(args: Array[String]): Unit = {
    val keyArg = if (args.nonEmpty) args(0) else "stream_late_drop"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
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
    sys.env.get("SPARK_GRAFT_CONF").foreach(
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k.trim, v.trim)
          case _           => ()
        }
      })

    // Per-query lifecycle capture. One query runs at a time here, so a
    // single mutable buffer with explicit resets is race-free enough —
    // listener callbacks for a query all precede awaitTermination return.
    val batches = mutable.ArrayBuffer.empty[BatchRow]
    @volatile var startedAtMs = 0L
    @volatile var terminatedAtMs = 0L
    @volatile var lastProgressAtMs = 0L
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        startedAtMs = System.currentTimeMillis()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        lastProgressAtMs = System.currentTimeMillis()
        import scala.jdk.CollectionConverters._
        batches += BatchRow(e.progress.batchId, e.progress.numInputRows,
          e.progress.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap)
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        terminatedAtMs = System.currentTimeMillis()
    }
    spark.streams.addListener(listener)

    def profileOnce(key: String): Unit = {
      batches.clear(); startedAtMs = 0; terminatedAtMs = 0; lastProgressAtMs = 0
      val t0 = System.currentTimeMillis()
      SparkEntry.queries(key)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.currentTimeMillis()
      val total = t1 - t0
      val preStart = if (startedAtMs > 0) startedAtMs - t0 else -1L
      val trig = batches.map(_.durations.getOrElse("triggerExecution", 0L)).sum
      val stop = if (terminatedAtMs > 0 && lastProgressAtMs > 0)
        terminatedAtMs - lastProgressAtMs else -1L
      val after = if (terminatedAtMs > 0) t1 - terminatedAtMs else -1L
      val interTrigger =
        if (startedAtMs > 0 && lastProgressAtMs > 0)
          (lastProgressAtMs - startedAtMs) - trig else -1L
      println(f"[profile] $key%-22s total ${total}%5d ms = pre-start $preStart%4d" +
        f" + triggers $trig%5d + inter-trigger gap $interTrigger%4d" +
        f" + stop $stop%4d + post (read-back/noop) $after%4d   (${batches.size} batches)")
      val compKeys = Seq("addBatch", "walCommit", "commitOffsets", "getBatch",
        "latestOffset", "queryPlanning")
      batches.foreach { b =>
        val comps = compKeys.map(k => f"$k ${b.durations.getOrElse(k, 0L)}%d")
          .mkString(" ")
        println(f"[profile]   batch ${b.batchId}%2d rows ${b.numInputRows}%7d " +
          f"trigger ${b.durations.getOrElse("triggerExecution", 0L)}%5d ms: $comps")
      }
    }

    val keys: Seq[String] =
      if (keyArg == "all") graft.operators.Streaming.checkpointedKeys.toSeq.sorted
      else Seq(keyArg)
    keys.foreach { key =>
      println(s"[profile] === $key (1 untimed warm-up + $runs timed) ===")
      try SparkEntry.queries(key)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[profile] warm-up failed: $e") }
      (1 to runs).foreach(_ => profileOnce(key))
    }
    spark.stop()
  }
}

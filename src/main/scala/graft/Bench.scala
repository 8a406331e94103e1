package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated key filter for local isolation runs; the
    // driver never sets it, so driver benches always time the full map.
    val keyFilter = sys.env.get("SPARK_GRAFT_KEYS")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Oracle-parity invariant (see T.normalizeTs): don't depend on the
      // sbt fork's -D flag alone — a Bench launched any other way must
      // still read NTZ fixtures as UTC instants.
      .config("spark.sql.session.timeZone", "UTC")
      // At 100 TB a table is thousands of ≥128 MB splits and every core
      // has work; the sf0.1 fixtures are single ~50 MB files, which the
      // default 128 MB split turns into 1–3 partitions — a 32-core run
      // where 29 cores idle. Small splits emulate the cluster's natural
      // scan parallelism at fixture scale (scan config, not a query
      // change — plans and results are identical).
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Noop sink forces FULL execution of every operator: a count() action
    // would let Catalyst prune projections and eliminate sorts, timing a
    // bare scan for projection-only keys.
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // FIXED execution order (sorted keys): map iteration order shifted
    // whenever the inventory changed, which moved which key absorbed
    // residual warm-up/GC phase — one of the r5 per-key noise sources.
    val bench = (keyFilter match {
      case Some(ks) => SparkEntry.queries.filter { case (k, _) => ks(k) }
      case None     => SparkEntry.queries
    }).toSeq.sortBy(_._1)
    // Untimed warm-ups: JVM/codegen/file-index warm-up otherwise lands on
    // whichever query runs first (~4 s of noise on one key); the second
    // warm-up of the FIRST MEASURED key covers its key-specific codegen
    // so position #1 isn't systematically penalized.
    try run("agg_daily_counts") catch { case _: Throwable => () }
    bench.headOption.foreach { case (k, _) =>
      try run(k) catch { case _: Throwable => () }
    }
    // Typed-Dataset/encoder codegen warm-up: multimodal_binary is the one
    // key on the typed mapPartitions path; its BENCH_r06 driver number
    // (1.57 s) was 6-9x its isolated/full local min-of-3 (0.18-0.34 s,
    // unreproducible with identical code), so pay any first-touch typed-
    // pipeline JIT here, untimed, instead of inside a measured key.
    if (keyFilter.forall(_("multimodal_binary")))
      try run("multimodal_binary") catch { case _: Throwable => () }
    // min of 3 runs per key: full execution each time (noop sink), best
    // timing reported. r5 showed min-of-2 leaves ±2–4× single-key swings
    // (fn_json 0.59→2.65 s with zero code change) — a third sample makes
    // a real 2× regression distinguishable from a straggler run.
    val samples = bench.map { case (name, _) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        run(name)
        (System.nanoTime() - t0) / 1e9
      }
      // A failed query reports -1 (never a bogus near-zero timing).
      try { name -> Seq(once(), once(), once()) }
      catch { case _: Throwable => name -> Seq(-1.0) }
    }
    val results = samples.map { case (k, ss) => k -> ss.min }.toMap
    // The driver parses this line from a 2000-char stdout TAIL (measured
    // from BENCH_r01.json: tail len 2000, and round 1's full-precision
    // line was truncated → "parsed": null). sbt's trailing "[success]"
    // line consumes ~80 of that window, so the whole line must stay under
    // ~1900 chars NO MATTER how many keys the inventory grows to: emit
    // the slowest keys (the informative ones) until a 1500-char budget is
    // spent, and fold the remaining fast keys into a count + summed
    // seconds. Full per-key numbers live in BASELINE.md / local runs.
    def f(v: Double): String = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.values.filter(_ >= 0).sum
    // Failures (-1 sentinel) sort FIRST: under the char budget the tail
    // gets folded into the omitted summary, and a failed key must never
    // disappear from the line (sorting by -v alone would bury them last).
    val sorted = results.toSeq.sortBy { case (_, v) => (v >= 0, -v) }
    val (shown, omitted) = {
      var used = 0
      val keep = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      val rest = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      sorted.foreach { case (k, v) =>
        val cost = k.length + f(v).length + 4
        if (used + cost <= 1500) { keep += ((k, v)); used += cost }
        else rest += ((k, v))
      }
      (keep, rest)
    }
    val qs = shown.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val omittedSum = omitted.map(_._2).filter(_ >= 0).sum
    val sfName = new java.io.File(sfDir).getName
    // COMPLETE per-key record (every key, all 3 samples + min) to a file:
    // the driver's 2000-char stdout tail can only carry the slowest ~66
    // keys, which left 72 keys invisible to round-over-round comparison
    // (VERDICT r7 task 2 / r8 task 2). tools/bench_baseline.py consumes
    // this to pin per-key medians in BASELINE.md.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full.json")
    val keyJson = samples.sortBy(_._1).map { case (k, ss) =>
      s"""    "$k": {"samples": [${ss.map(f).mkString(", ")}], "min": ${f(ss.min)}}"""
    }.mkString(",\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath),
      s"""{\n  "sf": "$sfName",\n  "cpus": $cpus,\n  "total_min_sec": ${f(total)},\n  "keys": {\n$keyJson\n  }\n}\n""")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"omitted_fast_keys":${omitted.size},"omitted_sec":${f(omittedSum)},"sf":"$sfName"}""")
    spark.stop()
  }
}

package graft.operators

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing (SURVEY.md §2.9).
  *
  * The reference's cron-driven daily batch (`LogProcessor.full_run`
  * [UNVERIFIED]) is semantically a 1-day tumbling window over the event
  * stream; these keys express tumbling / sliding / session windows with
  * Spark's `window()` / `session_window()` in batch mode so they fit the
  * driver's DataFrame contract and get a DuckDB oracle. The SAME
  * expressions run under `readStream` — exercised with `MemoryStream` +
  * watermarks in StreamingSpec (no oracle there; golden asserts).
  *
  * Scale notes (100 TB):
  * - tumbling/sliding windows are plain hash aggregates on (window, key) —
  *   map-side partial agg applies; the sliding window fans each row out to
  *   exactly windowDuration/slideDuration (= 2) buckets before the agg;
  * - session windows shuffle once on user_id; in true streaming the state
  *   store holds one open session per key, bounded by the watermark;
  * - in streaming mode the watermark bounds state: late rows beyond
  *   10 minutes are dropped — verified in StreamingSpec.
  */
object Streaming extends QueryModule {
  import T._

  private[graft] def rmr(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  /** Publish a fully-built staging directory at `dst` via atomic rename
    * (r14 verdict task 3): the old rmr-then-write-in-place staging left a
    * window where a second JVM saw — or tore — a half-written dir before
    * the marker landed. Here `tmp` is complete (marker included) before
    * any rename, the previous generation is moved ASIDE (rename, not a
    * slow recursive delete) and only then deleted, and `tmp` lands at
    * `dst` in one rename. Both paths must share a filesystem (same /tmp
    * parent by construction). A concurrent publisher that wins the race
    * makes our second rename throw — the caller re-verifies the marker
    * and accepts the identical winner (same fingerprint ⇒ same content).
    */
  private[graft] def atomicPublishDir(tmp: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    val retired = java.nio.file.Paths.get(
      s"$dst.old.${ProcessHandle.current().pid()}")
    var published = false
    try {
      if (java.nio.file.Files.exists(dst))
        java.nio.file.Files.move(dst, retired,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      published = true
    } finally {
      // Failed move-in with the old generation already retired: ROLL
      // BACK (rename retired into place) so a failed publish never
      // leaves the destination absent — the first cut of this helper
      // deleted `retired` unconditionally and a late rename failure
      // destroyed the only live generation (caught by StreamingSpec's
      // ghost-publish probe). The retired copy is deleted only once a
      // valid generation — ours or a concurrent winner's — sits at dst.
      if (!published && !java.nio.file.Files.exists(dst) &&
          java.nio.file.Files.exists(retired))
        try java.nio.file.Files.move(retired, dst,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: Throwable => () }
      if (java.nio.file.Files.exists(dst))
        try rmr(retired) catch { case _: Throwable => () }
    }
  }

  /** Temp dir that outlives the returned lazy DataFrame (the streaming
    * sink's output must stay readable until the caller's action runs) but
    * is reaped at JVM exit — repeat invocations (bench min-of-3) would
    * otherwise leak one dir per run (r6 ADVICE).
    */
  private def tempDirReapedAtExit(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook { try rmr(p) catch { case _: Throwable => () } }
    p.toString
  }

  /** Fresh per-run checkpoint dir, preferring RAM-backed tmpfs
    * (`/dev/shm`) over the disk-backed default temp dir. A streaming
    * checkpoint is many small writes (offset log, commit log, one
    * state-store delta per partition per micro-batch); for THESE runs it
    * is pure harness scaffolding — created fresh and deleted in the
    * `finally` — so its durability is irrelevant and it has no business
    * on disk. Measured r9 (3-JVM isolated medians of the 9-key family,
    * identical protocol): ext4 10.57 s vs tmpfs 10.09 / 10.91 s across
    * two same-code re-runs — i.e. NEUTRAL within the noise band (the OS
    * page cache already absorbs the small non-fsynced writes); kept on
    * principle, not claimed as a win. The same protocol rejected
    * 2 state partitions (10.6 s vs 4's 10.09–10.91): at ~10 state keys,
    * scan/agg parallelism beats per-store constant overhead. The
    * family's ~10 s floor is the per-query streaming start/stop constant
    * (6 checkpointed multi-micro-batch queries × 3 bench samples), not
    * removable by storage or partition config. One later trim that IS
    * semantics-free: skipping the trailing no-data micro-batch on the
    * keys whose emission never depends on it (see the per-key withConf
    * sites and BASELINE.md's no-data addendum). A real deployment's
    * checkpoint carries the restart contract and belongs on durable
    * shared storage (HDFS/S3 via `checkpointLocation`) — this helper is
    * explicitly the ephemeral-bench path, not deployment advice.
    */
  /** The single /dev/shm-usable predicate — Bench reports the checkpoint
    * regime from THIS value so the report can never drift from what
    * freshCkptDir actually does (review r10).
    */
  private[graft] def ckptOnShm: Boolean =
    java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm"))

  /** The six checkpointed streaming keys (fresh checkpoint + real
    * micro-batch runs per invocation). Bench derives its warm-up and
    * two-sample-cap set from HERE so a future seventh key cannot be
    * silently left out (review r10).
    */
  private[graft] val checkpointedKeys: Set[String] = Set(
    "stream_batch_equiv", "stream_late_drop", "stream_dedup",
    "stream_stateful_totals", "stream_stream_join", "pipeline_daily_e2e")

  private def freshCkptDir(prefix: String): String = {
    val p =
      if (ckptOnShm)
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), prefix)
      else java.nio.file.Files.createTempDirectory(prefix)
    p.toString
  }

  /** Run `body` with session confs temporarily set, restoring (or
    * unsetting) every key on ALL exit paths. The streaming keys size
    * state parallelism / pick the state-store provider per query; a
    * leaked conf would silently change every subsequent batch key's
    * plan, so the restore must be unforgettable.
    */
  private def withConf[A](s: SparkSession, kvs: (String, String)*)(body: => A): A = {
    val saved = kvs.map { case (k, _) =>
      k -> scala.util.Try(Option(s.conf.get(k))).toOption.flatten
    }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** Stage `df` as ONE flat parquet part-file at `dir/name.parquet` with
    * an explicit mtime — the staged-arrival recipe shared by the
    * micro-batch keys (the file stream source lists plain files, not
    * parquet output dirs, and orders pending files by modification time).
    */
  private def stageSingleFile(df: DataFrame, dir: String, name: String,
                              mtime: Long): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft_stage")
    try {
      val tmp = s"$stage/$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Paths.get(s"$dir/$name.parquet")
      java.nio.file.Files.move(part, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    } finally rmr(stage)
  }

  /** On-disk signature of the fixture path — cheap, no Spark job. Keys
    * the fingerprint cache so a fixture regenerated MID-JVM (long bench
    * session) still misses the cache and is re-fingerprinted (r8
    * ADVICE). r15 (r14 ADVICE): the old total-bytes + max-mtime-millis
    * pair collided when a fixture was regenerated in place with
    * identical total size within the same millisecond (or on a
    * coarse-mtime filesystem) — now a SHA-256 over the sorted per-file
    * (relative name, size, mtime-NANOS) listing plus the file count, so
    * any file added, removed, renamed, resized, or retouched at
    * nanosecond granularity changes the signature. (Spark part-file
    * names carry a fresh task UUID per write, so even a same-instant
    * in-place rewrite changes the listing.)
    */
  private[graft] def fileSig(p: java.nio.file.Path): String = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(p)) "absent"
    else {
      val fs = java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_)).toSeq
      val listing = fs.map { f =>
        val nanos = java.nio.file.Files.getLastModifiedTime(f)
          .to(java.util.concurrent.TimeUnit.NANOSECONDS)
        s"${p.relativize(f)}:${java.nio.file.Files.size(f)}:$nanos"
      }.sorted.mkString("\n")
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(listing.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s"n=${fs.size};sha=${digest.take(12).map("%02x".format(_)).mkString}"
    }
  }

  /** Content fingerprint of the events fixture under `d`: row count, max
    * event ts, and an order-independent xxhash64 XOR over every row's
    * full content (one tiny agg job, cached per (dir, file signature)).
    * Written into each staged-input marker so a REGENERATED fixture
    * restages instead of silently reusing stale arrival files — the r7
    * name-only `_STAGED` marker was a silent-wrong-data class. The XOR
    * term closes the r8 gap: a regeneration that preserved row count and
    * max ts but changed values/types/ids now changes the fingerprint.
    */
  private val fpCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def eventsFingerprint(s: SparkSession, d: String): String = {
    val key = s"$d|${fileSig(java.nio.file.Paths.get(s"$d/events.parquet"))}"
    fpCache.getOrElseUpdate(key, {
      // props participates in the XOR: a regeneration changing ONLY props
      // (same ids/ts/types/values) must still change the fingerprint —
      // the staged copies carry full rows incl. props (review r10).
      val r = events(s, d).agg(count(lit(1)), max(col("ts")),
        expr("bit_xor(xxhash64(event_id, ts, event_type, value, user_id, props))")).head()
      s"rows=${r.getLong(0)};maxTs=${r.get(1)};xor=${r.get(2)}"
    })
  }

  /** Marker-guarded staging: reuse `in` only when `_STAGED` holds the
    * CURRENT fixture fingerprint; on mismatch (first run, regenerated
    * fixture, interrupted prior staging, or an unreadable/garbage marker
    * — the read is Try-wrapped, never a key failure) wipe the dir and
    * restage. The marker is written last, so a crash mid-staging can
    * never leave a dir that passes the guard.
    */
  private[graft] def ensureStaged(s: SparkSession, d: String, in: String)
                                 (stage: => Unit): Unit = {
    val marker = java.nio.file.Paths.get(s"$in/_STAGED")
    val fp = eventsFingerprint(s, d)
    val ok = scala.util.Try(java.nio.file.Files.readString(marker))
      .toOption.contains(fp)
    if (!ok) {
      rmr(java.nio.file.Paths.get(in))
      new java.io.File(in).mkdirs()
      stage
      java.nio.file.Files.writeString(marker, fp)
    }
  }

  /** Arrival-file schema gate (r13 verdict task 3): the file stream
    * source with a user-provided schema silently NULL-fills a column
    * that a drifted arrival file dropped — rows flow, aggregate under a
    * phantom NULL group, and the result is silently wrong relative to
    * the source of truth; a corrupt/truncated file fails only once the
    * micro-batch actually reads it. At 100 TB's at-least-once ingest
    * (files landing in a drop folder from many writers), both are
    * routine, so validate every arrival file's FOOTER against the
    * expected schema BEFORE starting the stream — the schema-registry
    * gate every production ingest runs, one footer read per file, never
    * data-scaled — applied at EVERY staged-arrival read site (all six
    * checkpointed keys, both join-source dirs included; r14 review
    * find: the gate began life on stream_late_drop only, leaving the
    * other drop folders exposed to the same NULL-fill class).
    * Poison → one loud error naming the file; extra
    * columns are benign (the explicit-schema reader ignores them);
    * recovery = remove/fix the named file (the staged dir is input, not
    * ours to rewrite). Probed end-to-end by tools/degen_check.py's
    * arrival_poison family: corrupt footer, type drift, dropped column
    * — all LOUD with zero committed output, then green again once the
    * poison is removed.
    */
  private[graft] def validateArrivals(s: SparkSession, in: String,
      expected: org.apache.spark.sql.types.StructType): Unit = {
    // Gate EXACTLY the file set the stream source will list (r14
    // ADVICE): the source does NOT filter by extension — it lists every
    // file Spark's hidden-path rule admits — so an extension-based gate
    // (the r14 `.parquet`-only filter) let a drifted `data.pq` or
    // `part-000.snappy` bypass the footer check and reopen the
    // NULL-fill/late-crash class. Mirror the listing rule
    // (InMemoryFileIndex.shouldFilterOutPathName): hidden = starts with
    // "." / in-flight "._COPYING_" / starts with "_" without "=" —
    // except the `_metadata`/`_common_metadata` names, which the source
    // DOES list and the gate must therefore check too.
    def sourceLists(name: String): Boolean = {
      val excluded = (name.startsWith("_") && !name.contains("=")) ||
        name.startsWith(".") || name.endsWith("._COPYING_")
      val readmitted =
        name.startsWith("_metadata") || name.startsWith("_common_metadata")
      !excluded || readmitted
    }
    val files = Option(new java.io.File(in).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && sourceLists(f.getName))
      .sortBy(_.getName)
    files.foreach { f =>
      val sch = try s.read.parquet(f.getPath).schema catch {
        case e: Throwable => throw new IllegalArgumentException(
          s"poisoned arrival file ${f.getName}: unreadable parquet footer " +
            s"(${e.getMessage})", e)
      }
      expected.fields.foreach { fld =>
        val got = sch.fields.find(_.name == fld.name)
        require(got.exists(_.dataType == fld.dataType),
          s"poisoned arrival file ${f.getName}: column ${fld.name} expected " +
            s"${fld.dataType.simpleString}, got " +
            got.map(_.dataType.simpleString).getOrElse("MISSING"))
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Daily tumbling window ≡ the reference's per-day batch roll-up.
    "stream_tumbling_daily" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("total"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("total"))
    }),

    // 1-hour windows sliding every 30 minutes: each event lands in exactly
    // two windows (epoch-aligned starts in both engines).
    "stream_sliding_1h30m" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("wstart"), col("n"), col("n_users"))
    }),

    // Stream-equals-batch equivalence, driver-checked: a TRUE Structured
    // Streaming run (readStream file source → tumbling-window stateful agg
    // → foreachBatch upsert into a serving table, Trigger.AvailableNow) —
    // the reference's cron-driven daily batch made incremental — whose
    // final table must equal the batch SQL oracle. Aggregates are
    // integer-exact (count + cents sum) so incremental state-merge order
    // cannot perturb the result vs the batch plan. At 100 TB this is the
    // operational ingest shape: new log files land, AvailableNow drains
    // them through bounded state, foreachBatch upserts day-partitions.
    "stream_batch_equiv" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      // Stream sources can't infer schema: take it from the batch reader
      // (ts arrives as raw long / NTZ per fixture generation — see
      // T.events; T.normalizeTs below maps either to TIMESTAMP).
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val out  = tempDirReapedAtExit("graft_sbe_out")
      val ckpt = freshCkptDir("graft_sbe_ckpt")
      // The file stream source watches a DIRECTORY (its real contract:
      // log files landing in a drop folder); the fixture is a single
      // file, so stage it into one via symlink — read-only, zero copy.
      val in = java.nio.file.Files.createTempDirectory("graft_sbe_in")
      // Checkpoint + staged input are dead once the query terminates;
      // remove them even when the streaming run throws (r6 ADVICE: a
      // failure before cleanup leaked all three dirs).
      // State-store parallelism: the session's 32 shuffle partitions mean
      // 32 state-store instances (each with its own checkpoint delta/
      // snapshot files) for ~10 (day, event_type) groups — pure constant
      // overhead per micro-batch. 4 partitions hold the same state with
      // 8× fewer checkpoint files; the value is baked into the fresh
      // checkpoint at query start, so restoring the session conf after
      // is safe. At real scale the key cardinality (days × types) stays
      // small, so a low state-partition count is the RIGHT setting there
      // too — state parallelism should track key cardinality, not the
      // batch shuffle width.
      // No-data micro-batches exist to advance the watermark so append-mode
      // aggregations can emit closed windows; this query has no watermark
      // (complete mode re-emits the full aggregate every batch), so a
      // trailing no-data batch would only re-run the foreachBatch full
      // rewrite for nothing. Disabled here and on every streaming key whose
      // emission doesn't depend on a post-data watermark advance; the one
      // key that DOES (stream_late_drop: append agg emits closed day
      // windows only when the watermark passes them) keeps the default.
      withConf(s, "spark.sql.shuffle.partitions" -> "4",
          "spark.sql.streaming.minBatchesToRetain" -> "2",
          "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") { try {
        java.nio.file.Files.createSymbolicLink(
          in.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$d/events.parquet").toAbsolutePath)
        validateArrivals(s, in.toString, schema)
        val agg = T.normalizeTs(s.readStream.schema(schema).parquet(in.toString))
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            // try_cast, not cast: a single non-finite/overflow value (NaN,
            // ±Inf, |v| ≳ 9.2e16 — every real 100 TB log has some) would
            // otherwise kill the whole streaming job with CAST_OVERFLOW
            // (measured, r11 dirty-values corpus). NULL cents skip the
            // sum while the row still counts; the oracle's TRY_CAST
            // agrees on every input class.
            sum(expr("try_cast(round(value * 100) AS BIGINT)")).as("total_cents"))
          .select(col("w.start").cast("date").as("day"), col("event_type"),
            col("n"), col("total_cents"))
        val q = agg.writeStream
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          // Complete-mode foreachBatch: each trigger delivers the full
          // updated aggregate; the idempotent overwrite is the exactly-once
          // upsert analog (a real deployment would MERGE day-partitions).
          .foreachBatch { (bdf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            bdf.write.mode("overwrite").parquet(out)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Explicit schema on the read-back (r11 review): a zero-row
        // corpus leaves `out` with no parquet footer to infer from; the
        // correct answer is the empty aggregate, not an inference error.
        s.read.schema(agg.schema).parquet(out)
      } finally { rmr(java.nio.file.Paths.get(ckpt)); rmr(in) } }
    }),

    // Watermark late-data semantics, driver-checked: the events table is
    // staged as THREE arrival files — on-time rows (ts ≥ Jan 10) land
    // first, then a mid file (Jan 5 ≤ ts < Jan 10), then a truly-late file
    // (ts < Jan 5). maxFilesPerTrigger=1 + AvailableNow processes them as
    // three micro-batches. Spark 4 runs append aggregation on the TWO-
    // WATERMARK model: the late-events filter uses the PREVIOUS batch's
    // watermark while eviction/emission uses the current one — so batch 1
    // (mid) still passes the stale initial watermark and is aggregated +
    // emitted, but batch 2 (late) hits lateEvents wm = max(on-time ts) − 1h
    // and every row is DROPPED (verified empirically: 1362 dropped rows at
    // sf0.01, batch 2 emits nothing). Append mode emits exactly the
    // surviving day windows whose end ≤ final watermark (the last open day
    // stays in state, unemitted — AvailableNow does not flush open
    // windows). The oracle reproduces both rules in batch SQL: aggregate
    // rows ts ≥ Jan 5 only, keep windows with end ≤ max(on-time ts) − 1 h.
    // Aggregates are integer-exact so micro-batch merge order can't
    // perturb parity. At 100 TB this is THE ingest correctness contract:
    // bounded state via watermark, deterministic lateness cutoff, no
    // double-emits for closed windows.
    "stream_late_drop" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00"))
      val mid    = lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
      val out  = tempDirReapedAtExit("graft_sld_out")
      val ckpt = freshCkptDir("graft_sld_ckpt")
      // The three arrival files are a pure function of the fixture: stage
      // them ONCE per sf into a marker-guarded fixed dir (the
      // scan_partition_pruned recipe) and reuse across invocations — only
      // the checkpoint must be fresh per run (a reused one would replay
      // "already processed" and emit nothing). Staged as plain micro-
      // TIMESTAMP parquet via T.events, so the stream schema needs no
      // nanos shim; mtimes are set explicitly 60 s apart because the file
      // source orders pending files by modification time and all three
      // writes land within the same ms.
      val tag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
      val in = s"/tmp/graft_sld_in_$tag"
      // 4 state partitions instead of the session's 32 — see
      // stream_batch_equiv: three micro-batches × 32 state stores of
      // checkpoint files for ~10 groups is pure constant overhead.
      withConf(s, "spark.sql.shuffle.partitions" -> "4",
          "spark.sql.streaming.minBatchesToRetain" -> "2") { try {
        ensureStaged(s, d, in) {
          val ev = events(s, d)
          val t0 = System.currentTimeMillis() - 180000
          stageSingleFile(ev.filter(col("ts") >= cutoff), in, "0_ontime", t0)
          stageSingleFile(ev.filter(col("ts") >= mid && col("ts") < cutoff),
            in, "1_mid", t0 + 60000)
          stageSingleFile(ev.filter(col("ts") < mid), in, "2_late", t0 + 120000)
        }
        val schema = s.read.parquet(s"$in/0_ontime.parquet").schema
        // Fail LOUD on any poisoned arrival file before the stream
        // starts (corrupt footer / schema drift — see validateArrivals).
        validateArrivals(s, in, schema)
        val emitted = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(in.toString)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            // try_cast, not cast: a single non-finite/overflow value (NaN,
            // ±Inf, |v| ≳ 9.2e16 — every real 100 TB log has some) would
            // otherwise kill the whole streaming job with CAST_OVERFLOW
            // (measured, r11 dirty-values corpus). NULL cents skip the
            // sum while the row still counts; the oracle's TRY_CAST
            // agrees on every input class.
            sum(expr("try_cast(round(value * 100) AS BIGINT)")).as("total_cents"))
          .select(col("w.start").cast("date").as("day"), col("event_type"),
            col("n"), col("total_cents"))
        val q = emitted.writeStream
          .outputMode("append")
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Read back with the emission's own schema: a run that closes NO
        // windows (single event, all-late arrivals — the watermark never
        // passes a day boundary) leaves only _spark_metadata in the sink
        // dir, where bare schema inference would throw instead of
        // answering the correct empty result (streaming-degenerate find).
        s.read.schema(emitted.schema).parquet(out)
      } finally {
        // Only the checkpoint is per-run garbage; the staged input dir is
        // the reusable per-sf fixture.
        rmr(java.nio.file.Paths.get(ckpt))
      } }
    }),

    // Streaming exactly-once dedup, driver-checked: the events file lands
    // twice — once whole, then a second arrival file re-delivering every
    // 'click' row (the at-least-once redelivery every real log pipeline
    // produces). Two micro-batches (maxFilesPerTrigger=1 + AvailableNow);
    // dropDuplicatesWithinWatermark(event_id) keeps the FIRST occurrence
    // and bounds its state by the 1 h watermark — the 100 TB contract: at
    // unbounded-state dropDuplicates the dedup map grows with the whole
    // stream's key space; within-watermark state holds only the last
    // hour's ids. Batch 2 emits nothing because every redelivered id is
    // STILL IN DEDUP STATE (state expires only past watermark + delay;
    // the redelivered rows sit within 1 h of the stream max, so the
    // watermark alone would NOT drop them all) — shrinking the 1 h delay
    // below the redelivery lag is what would break exactly-once here.
    // The read-back aggregate must equal the plain batch aggregate over
    // events (each id once).
    "stream_dedup" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val out  = tempDirReapedAtExit("graft_sdd_out")
      val ckpt = freshCkptDir("graft_sdd_ckpt")
      // Staged arrivals are a pure function of the fixture → write once
      // per sf behind a marker (the stream_late_drop recipe); mtimes 60 s
      // apart because the file source orders pending files by mtime.
      val tag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
      val in = s"/tmp/graft_sdd_in_$tag"
      // dropDuplicatesWithinWatermark is a stateful FILTER: survivors emit
      // in the same data batch they arrive in, and the watermark only
      // bounds state eviction (irrelevant here — the checkpoint is
      // discarded after the run). The trailing no-data batch would commit
      // an empty batch for nothing; skip it.
      withConf(s, "spark.sql.shuffle.partitions" -> "4",
          "spark.sql.streaming.minBatchesToRetain" -> "2",
          "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") { try {
        ensureStaged(s, d, in) {
          val ev = events(s, d)
          val t0 = System.currentTimeMillis() - 180000
          stageSingleFile(ev, in, "0_full", t0)
          stageSingleFile(ev.filter(col("event_type") === "click"),
            in, "1_redelivered", t0 + 60000)
        }
        val schema = s.read.parquet(s"$in/0_full.parquet").schema
        validateArrivals(s, in, schema)
        val emitted = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(in.toString)
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("event_id")
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        val q = emitted.writeStream
          .outputMode("append")
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Aggregate the deduped emission for a compact, integer-exact
        // compare: equality here certifies each event_id survived exactly
        // once with its original row intact. Explicit schema on the
        // read-back: a zero-emission run (empty corpus) leaves a sink dir
        // with only _spark_metadata, where inference would throw.
        s.read.schema(emitted.schema).parquet(out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("event_id")).as("n_ids"),
            // try_cast, not cast: a single non-finite/overflow value (NaN,
            // ±Inf, |v| ≳ 9.2e16 — every real 100 TB log has some) would
            // otherwise kill the whole streaming job with CAST_OVERFLOW
            // (measured, r11 dirty-values corpus). NULL cents skip the
            // sum while the row still counts; the oracle's TRY_CAST
            // agrees on every input class.
            sum(expr("try_cast(round(value * 100) AS BIGINT)")).as("total_cents"))
      } finally rmr(java.nio.file.Paths.get(ckpt)) }
    }),

    // Arbitrary stateful processing (Spark 4 transformWithState),
    // driver-checked: the reference's incremental counts table as CUSTOM
    // state — per event_type, a typed ValueState (n, cents) accumulated
    // across two staged micro-batches on RocksDB state (the operational
    // store at 100 TB: incremental checkpoints, state beyond heap).
    // Update-mode emissions upsert via dynamic partition overwrite (each
    // batch rewrites only the event_type partitions it emitted), so the
    // final table is the running total per key — which must equal the
    // plain batch aggregate.
    "stream_stateful_totals" -> ((s, d) => {
      import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, Trigger, TTLConfig, TimerValues, ValueState}
      import s.implicits._
      val out  = tempDirReapedAtExit("graft_sst_out")
      val ckpt = freshCkptDir("graft_sst_ckpt")
      val tag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
      val in = s"/tmp/graft_sst_in_$tag"
      // transformWithState requires the RocksDB state store.
      withConf(s,
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.minBatchesToRetain" -> "2",
        // TimeMode.None: no watermark, no timers — a no-data batch can
        // never fire new emissions, so don't schedule one.
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      ) { try {
        ensureStaged(s, d, in) {
          val ev = events(s, d)
            .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          val split = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
          val t0 = System.currentTimeMillis() - 120000
          stageSingleFile(ev.filter(col("ts") < split), in, "0_h1", t0)
          stageSingleFile(ev.filter(col("ts") >= split), in, "1_h2", t0 + 60000)
        }
        class Totals extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {
          @transient private var st: ValueState[(Long, Long)] = _
          override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
            st = getHandle.getValueState[(Long, Long)]("totals",
              implicitly[org.apache.spark.sql.Encoder[(Long, Long)]], TTLConfig.NONE)
          override def handleInputRows(key: String, rows: Iterator[(String, Long)],
              timers: TimerValues): Iterator[(String, Long, Long)] = {
            var (n, cents) = if (st.exists()) st.get() else (0L, 0L)
            rows.foreach { r => n += 1; cents += r._2 }
            st.update((n, cents))
            Iterator.single((key, n, cents))
          }
        }
        val sch = s.read.parquet(s"$in/0_h1.parquet").schema
        validateArrivals(s, in, sch)
        val emitted = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1")
          .parquet(in.toString)
          .select(col("event_type"),
            // coalesce: a NULL value row must still COUNT while adding 0
            // cents — exactly what the batch oracle's sum-skips-NULLs +
            // count(*) computes. The bare cast NPE'd the typed encoder
            // (NOT_NULL_ASSERT_VIOLATION on Tuple2._2) — one NULL row
            // killed the stream (NULL-injection universe find).
            // try_cast inside the coalesce: NULL *or* non-finite/overflow
            // values add 0 cents while still counting (r11 dirty-values
            // corpus: the bare ANSI cast killed the stream on one 1e300
            // row) — identical to the oracle's count(*) + sum-skips-NULL.
            coalesce(expr("try_cast(round(value * 100) AS BIGINT)"), lit(0L)).as("cents"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .transformWithState(new Totals, TimeMode.None(), OutputMode.Update())
          .toDF("event_type", "n", "total_cents")
        val q = emitted.writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          // Idempotent upsert: each batch dynamically overwrites ONLY the
          // event_type partitions it emitted; keys silent in a later
          // batch keep their last written totals.
          .foreachBatch { (bdf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            bdf.write.mode("overwrite")
              .option("partitionOverwriteMode", "DYNAMIC")
              .partitionBy("event_type")
              .parquet(out)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Explicit schema (r11 review): with a zero-row corpus no batch
        // ever writes a partition, leaving nothing to infer from. The
        // emission schema's event_type doubles as the partition column.
        s.read.schema(emitted.schema).parquet(out)
          .select(col("event_type"), col("n"), col("total_cents"))
      } finally rmr(java.nio.file.Paths.get(ckpt)) }
    }),

    // Stream-stream interval join, driver-checked: the purchase and click
    // streams join on user_id with clicks in the 5 minutes before each
    // purchase — the attribution join, run as TRUE streaming (two file
    // sources, watermarks on both sides, append mode). The time-range
    // condition + watermarks are what bound the join state at 100 TB:
    // each side buffers only rows younger than watermark + band; without
    // them an inner stream-stream join buffers both streams forever.
    // Both staged files arrive in micro-batch 0 (no maxFilesPerTrigger),
    // so no row is watermark-late and the emission must equal the batch
    // theta join — the oracle.
    "stream_stream_join" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val out  = tempDirReapedAtExit("graft_ssj_out")
      val ckpt = freshCkptDir("graft_ssj_ckpt")
      val tag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
      val in = s"/tmp/graft_ssj_in_$tag"
      // Stream-stream INNER join emits each pair in the data batch where
      // the match lands (watermarks only bound buffered state / lateness,
      // and both files arrive in batch 0) — the trailing no-data batch
      // would only evict state we're about to delete with the checkpoint.
      withConf(s, "spark.sql.shuffle.partitions" -> "4",
          "spark.sql.streaming.minBatchesToRetain" -> "2",
          "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") { try {
        ensureStaged(s, d, in) {
          val ev = events(s, d).filter(col("user_id").isNotNull)
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts"))
            .coalesce(1).write.mode("overwrite").parquet(s"$in/p")
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"))
            .coalesce(1).write.mode("overwrite").parquet(s"$in/c")
        }
        val pSch = s.read.parquet(s"$in/p").schema
        val cSch = s.read.parquet(s"$in/c").schema
        validateArrivals(s, s"$in/p", pSch)
        validateArrivals(s, s"$in/c", cSch)
        val p = s.readStream.schema(pSch).parquet(s"$in/p")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        val c = s.readStream.schema(cSch).parquet(s"$in/c")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
          .withWatermark("c_ts", "1 hour")
        val emitted = p.join(c,
            col("user_id") === col("c_user") &&
              col("c_ts") <= col("p_ts") &&
              col("c_ts") >= col("p_ts") - expr("INTERVAL 5 MINUTES"))
          .select(col("p_id"), col("user_id"))
        val q = emitted.writeStream
          .outputMode("append")
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Pair counts per user — compact, integer-exact compare. Explicit
        // schema: a corpus with no qualifying pairs (no purchases, or no
        // click within the band) emits nothing, leaving a metadata-only
        // sink dir where inference would throw.
        s.read.schema(emitted.schema).parquet(out)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
      } finally rmr(java.nio.file.Paths.get(ckpt)) }
    }),

    // The reference's ENTIRE operational loop as ONE driver-checked key:
    // daily dumps land (two staged arrival halves, split by time) → the
    // incremental streaming aggregation rolls (file, date) play counts →
    // each micro-batch UPSERTS its date partitions into the at-rest
    // counts table (dynamic partition overwrite — the halves touch
    // disjoint dates, exactly the daily-cron shape) → the result is read
    // back through graft.api.Playcounts, the reference's own query API.
    // Oracle = the same point lookups straight off the raw events: the
    // whole ingest→sink→API chain must be lossless.
    "pipeline_daily_e2e" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val out  = tempDirReapedAtExit("graft_p2e_out")
      val ckpt = freshCkptDir("graft_p2e_ckpt")
      val tag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
      val in = s"/tmp/graft_p2e_in_$tag"
      // Update-mode aggregation without a watermark: every emission
      // happens in a data batch (state never expires), so a no-data batch
      // would only re-fire foreachBatch's dynamic-overwrite for nothing.
      withConf(s, "spark.sql.shuffle.partitions" -> "4",
          "spark.sql.streaming.minBatchesToRetain" -> "2",
          "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") { try {
        ensureStaged(s, d, in) {
          val ev = events(s, d)
            .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          val split = lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
          val t0 = System.currentTimeMillis() - 120000
          stageSingleFile(ev.filter(col("ts") < split), in, "0_h1", t0)
          stageSingleFile(ev.filter(col("ts") >= split), in, "1_h2", t0 + 60000)
        }
        val sch = s.read.parquet(s"$in/0_h1.parquet").schema
        validateArrivals(s, in, sch)
        val emitted = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1")
          .parquet(in.toString)
          .groupBy(col("event_type").as("file"),
            day(col("ts")).as("date"))
          .agg(count(lit(1)).as("count"))
        val q = emitted.writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (bdf: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            bdf.write.mode("overwrite")
              .option("partitionOverwriteMode", "DYNAMIC")
              .partitionBy("date")
              .parquet(out)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Query the upserted counts table through the reference API.
        // Explicit schema (r11 review): a zero-row corpus writes no
        // partitions, and the API must answer empty off an empty table
        // instead of failing schema inference.
        val pc = new graft.api.Playcounts(
          s.read.schema(emitted.schema).parquet(out))
        pc.dateCount("view", java.sql.Date.valueOf("2024-01-20"))
          .unionByName(pc.dateCount("click", java.sql.Date.valueOf("2024-01-05")))
      } finally rmr(java.nio.file.Paths.get(ckpt)) }
    }),

    // Per-user session windows, 5-minute gap. Session end = last event +
    // gap, and the merge is END-INCLUSIVE: an event at exactly prev_end
    // (= prev event + gap) MERGES into the session — Spark's session
    // merge condition is sessionStart <= currentEnd, adjacent windows
    // included. Proven off-fixture by the GenPropertySpec island-merge
    // property with forced boundary arrivals (which caught the oracle's
    // original `>=` new-session flag as a latent divergence: fixture
    // microsecond timestamps never land exactly on a gap boundary, so
    // the hash gate alone could never see it). The oracle's
    // gaps-and-islands flag uses `>` to match.
    "stream_session_5m" -> ((s, d) => {
      events(s, d)
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), r4(sum(col("value"))).as("total"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("total"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "stream_tumbling_daily" -> """
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS wstart, event_type,
             count(*) AS n, round(sum(value), 4) AS total
      FROM events GROUP BY 1, 2 ORDER BY wstart, event_type
    """,

    "stream_sliding_1h30m" -> """
      WITH fanout AS (
        SELECT user_id,
               unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
                 AS wstart
        FROM events)
      SELECT wstart, count(*) AS n, count(DISTINCT user_id) AS n_users
      FROM fanout GROUP BY wstart ORDER BY wstart
    """,

    // The streaming dedup must emit each event exactly once: its
    // read-back aggregate equals the plain batch aggregate (each row's
    // redelivered copy dropped by first-occurrence-wins).
    "stream_dedup" -> """
      SELECT event_type, count(*) AS n,
             count(DISTINCT event_id) AS n_ids,
             CAST(sum(TRY_CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM events GROUP BY event_type ORDER BY event_type
    """,

    // The full ingest→sink→API chain must be lossless: the API's point
    // lookups off the upserted counts table equal the raw-event counts.
    // HAVING count(*) > 0 mirrors the API's unknown-file contract (r10
    // ADVICE): a file type with NO events anywhere answers EMPTY, a known
    // type on a playless date answers the zero-fill row — without the
    // gate the oracle would fabricate a count-0 row for an absent type
    // on corpora that lack it (the fixture always has both types).
    "pipeline_daily_e2e" -> """
      SELECT 'view' AS file, DATE '2024-01-20' AS date,
             count(*) FILTER (WHERE CAST(date_trunc('day', ts) AS DATE)
                              = DATE '2024-01-20') AS count
      FROM events WHERE event_type = 'view'
      HAVING count(*) > 0
      UNION ALL
      SELECT 'click' AS file, DATE '2024-01-05' AS date,
             count(*) FILTER (WHERE CAST(date_trunc('day', ts) AS DATE)
                              = DATE '2024-01-05') AS count
      FROM events WHERE event_type = 'click'
      HAVING count(*) > 0
      ORDER BY file
    """,

    // The transformWithState running totals must equal the plain batch
    // aggregate after the last micro-batch's upsert. coalesce(sum, 0):
    // the typed state accumulates 0 cents per dirty/NULL row (a running
    // total is never NULL), so a group whose values are ALL dirty reads
    // 0 — the oracle's bare sum over all-NULL would read NULL
    // (stream_dirty corpus, r11).
    "stream_stateful_totals" -> """
      SELECT event_type, count(*) AS n,
             CAST(coalesce(sum(TRY_CAST(round(value * 100) AS BIGINT)), 0)
                  AS BIGINT) AS total_cents
      FROM events GROUP BY event_type ORDER BY event_type
    """,

    // The streaming interval join must equal the batch theta join: both
    // staged files land in micro-batch 0, so nothing is watermark-late.
    "stream_stream_join" -> """
      SELECT p.user_id, count(*) AS n_pairs
      FROM (SELECT user_id, ts FROM events
            WHERE event_type = 'purchase' AND user_id IS NOT NULL) p
      JOIN (SELECT user_id, ts AS c_ts FROM events
            WHERE event_type = 'click' AND user_id IS NOT NULL) c
        ON p.user_id = c.user_id AND c.c_ts <= p.ts
           AND c.c_ts >= p.ts - INTERVAL 5 MINUTES
      GROUP BY p.user_id ORDER BY p.user_id
    """,

    // The batch SQL the streaming run must equal (sum over BIGINT is
    // HUGEINT in DuckDB — cast back).
    "stream_batch_equiv" -> """
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             count(*) AS n,
             CAST(sum(TRY_CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """,

    // Batch restatement of the streaming run's TWO rules: (1) the truly-
    // late file (ts < Jan 5, arriving after the watermark advanced past
    // it) is excluded — the mid file still passes the one-batch-lagging
    // lateEvents watermark; (2) append mode emits only day windows whose
    // end ≤ final watermark = max(on-time ts) − 1 h.
    "stream_late_drop" -> """
      WITH kept AS (
        SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'),
      wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events
             WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'),
      g AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               count(*) AS n,
               CAST(sum(TRY_CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM kept GROUP BY 1, 2)
      SELECT day, event_type, n, total_cents
      FROM g, wm
      WHERE CAST(day AS TIMESTAMP) + INTERVAL 1 DAY <= wm.w
      ORDER BY day, event_type
    """,

    "stream_session_5m" -> """
      WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL '5 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL '5 minutes' AS session_end,
             count(*) AS n_events, round(sum(value), 4) AS total
      FROM sessions GROUP BY user_id, sid
      ORDER BY user_id, session_start
    """
  )
}

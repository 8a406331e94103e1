package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's user-facing query surface, re-expressed as a library
  * over DataFrames — a user of `harej/mediaplaycounts` maps each call
  * 1:1 (ref cites [UNVERIFIED], reconstructed public behavior —
  * SURVEY.md §0, §3):
  *
  * | reference                                   | here                 |
  * |---------------------------------------------|----------------------|
  * | `FilePlaycount.date_count(file, date)`      | `dateCount`          |
  * | `FilePlaycount.date_range_count(f, s, e)`   | `dateRangeCount`     |
  * | `FilePlaycount.last_30(file)`               | `last30`             |
  * | `FilePlaycount.last_90(file)`               | `last90`             |
  * | `CategoryPlaycount` (AskCommons + sum)      | `categoryCount` (recursive overload = subcategory descent) |
  * | `LogProcessor.parse` (TSV → counts rows)    | `Playcounts.fromMediacountsLog` |
  *
  * `counts` schema: (file STRING, date DATE, count BIGINT) — the
  * reference's MySQL `counts` table, held as a (date-partitionable)
  * DataFrame.
  *
  * The r11-ADVICE fold of `knownFile` into the main aggregate (one
  * scan, existence = count over a file-only filter) was measured and
  * REJECTED (r12): on a 1500-partition date-partitioned counts table,
  * the fused form is 2–3× slower on the KNOWN-file hot path (dateCount
  * ×5: probe 0.95–1.49 s vs fused 2.59–3.09 s) because the existence
  * aggregate must scan the file's whole history with no early exit,
  * where the probe's limit(1) stops at the first pushed match and the
  * main branch keeps its date partition pruning; unknown files tie
  * (2.72 vs 2.62 s — both shapes must exhaust the scan). If true
  * MySQL-point-lookup latency ever matters, the answer is a
  * broadcastable distinct-file dimension maintained at ingest, not the
  * fold — the API keeps the probe.
  *
  * Scale notes (100 TB): every method is a filter + aggregate over the
  * counts table — partition pruning on `date` and predicate pushdown on
  * `file` do the heavy lifting at rest; `categoryCount` broadcasts the
  * (small) membership dimension, never shuffling the fact side. The
  * `details` list is built with `collect_list` AFTER per-date
  * aggregation — bounded by days-in-range, never by raw log rows.
  */
final class Playcounts(counts: DataFrame) {

  /** 1-row-or-empty probe: does the counts table know `file` AT ALL?
    * Gates the zero-fill below so "zero plays that day" and "unknown
    * file" stay distinguishable (round-10 ADVICE: the reference API
    * answers error/empty for a filename it has never seen, zero only for
    * a known file on a playless date). limit(1) short-circuits the scan
    * at the first pushed-filter match; crossJoin with the empty probe
    * result erases the fabricated row for unknown files while the main
    * branch keeps its own (file, date) pushdown + partition pruning.
    */
  private def knownFile(file: String): DataFrame =
    counts.filter(col("file") === file).limit(1).select(lit(1).as("_known"))

  /** Single (file, date) point lookup — MySQL PK lookup analog. A KNOWN
    * file on a date with no stored row answers count 0, not an empty
    * result: the reference's API returns a zero count for dates with no
    * plays (the same zero-fill contract as `join_anti_zerofill`), and
    * the pipeline_daily_e2e oracle (a COUNT(*) over the raw events)
    * produces a 0-row for such dates — found diverging on the round-10
    * degenerate-universe corpus where a queried date had no events. A
    * filename absent from counts entirely answers an EMPTY result (the
    * reference's unknown-file error path).
    */
  def dateCount(file: String, date: java.sql.Date): DataFrame =
    counts.filter(col("file") === file && col("date") === date)
      .agg(coalesce(sum(col("count")), lit(0L)).as("count"))
      .crossJoin(broadcast(knownFile(file)))
      .select(lit(file).as("file"), lit(date).as("date"), col("count"))

  /** Range query: grand total + date-sorted per-day details — the
    * `{filename, total, details:[{date,count}…]}` API response shape.
    * Same unknown-file contract as `dateCount`: a known file with no
    * plays in range answers (total 0, details []), an unknown file
    * answers empty.
    */
  def dateRangeCount(file: String, start: java.sql.Date, end: java.sql.Date): DataFrame = {
    val daily = counts
      .filter(col("file") === file && col("date").between(start, end))
      .groupBy(col("date")).agg(sum(col("count")).as("count"))
    daily.agg(
      coalesce(sum(col("count")), lit(0L)).as("total"),
      sort_array(collect_list(struct(col("date"), col("count")))).as("details"))
      .crossJoin(broadcast(knownFile(file)))
      .select(lit(file).as("file"), col("total"), col("details"))
  }

  /** Sliding "last N days" ending at `asOf` (the reference anchors at
    * today; explicit anchor keeps the library deterministic).
    */
  def lastN(file: String, asOf: java.sql.Date, n: Int): DataFrame = {
    // Loud contract: n <= 0 is caller garbage — a silent empty-range
    // zero-total for a known file would be indistinguishable from "no
    // plays in the window" (same loud-beats-silent rule as the
    // batch value-domain keys).
    require(n > 0, s"lastN window must be positive, got $n")
    dateRangeCount(file, java.sql.Date.valueOf(asOf.toLocalDate.minusDays(n - 1L)), asOf)
  }

  def last30(file: String, asOf: java.sql.Date): DataFrame = lastN(file, asOf, 30)
  def last90(file: String, asOf: java.sql.Date): DataFrame = lastN(file, asOf, 90)

  /** Category roll-up: membership (category, file) ⨝ counts, summed per
    * category — the reference's only join, done there as N API calls +
    * a Python loop; here one broadcast join + aggregate.
    */
  def categoryCount(members: DataFrame, category: String,
                    start: java.sql.Date, end: java.sql.Date): DataFrame = {
    val files = members.filter(col("category") === category).select(col("file"))
    rollup(files, category, start, end)
  }

  /** Recursive variant — the reference's AskCommons category →
    * subcategory → … descent, in-engine: membership is the closure of
    * `category` over the `edges` (parent, child) dimension, resolved by
    * iterative broadcast-join frontier expansion (the
    * `join_category_closure` shape). Real category graphs are DAGs that
    * may contain cycles, so each round subtracts already-seen categories
    * — the loop terminates on any graph; depth is bounded LOUDLY (callers
    * with deeper hierarchies raise `maxDepth` — real Commons chains can
    * exceed the default), and a file reachable through several
    * subcategories still counts once (distinct before the roll-up).
    * Category dimensions are ≪ facts at 100 TB: the closure costs
    * O(depth) tiny broadcast joins over an edge dim that is materialized
    * ONCE up front (localCheckpoint — re-broadcasting an unpersisted
    * frame would re-scan the source every round), and the counts table
    * is touched exactly once.
    */
  def categoryCount(members: DataFrame, edges: DataFrame, category: String,
                    start: java.sql.Date, end: java.sql.Date,
                    maxDepth: Int = 20): DataFrame = {
    val spark = members.sparkSession
    import spark.implicits._
    val edgeDim = edges.select(col("parent"), col("child")).localCheckpoint(true)
    var frontier = Seq(category).toDF("category").localCheckpoint(true)
    // cats = flat union of eagerly-checkpointed frontiers — depth-1 plan,
    // no checkpoint of its own needed (one job per round, not three).
    var cats = frontier
    var round = 0
    while (!frontier.isEmpty && round < maxDepth) {
      frontier = frontier.join(broadcast(edgeDim), col("category") === col("parent"))
        .select(col("child").as("category")).distinct()
        .except(cats).localCheckpoint(true)
      cats = cats.union(frontier)
      round += 1
    }
    require(frontier.isEmpty,
      s"category closure did not terminate within $round rounds; " +
        s"raise maxDepth (currently $maxDepth) for deeper hierarchies")
    val files = members.join(broadcast(cats), Seq("category"))
      .select(col("file")).distinct()
    rollup(files, category, start, end)
  }

  private def rollup(files: DataFrame, category: String,
                     start: java.sql.Date, end: java.sql.Date): DataFrame =
    counts
      .join(broadcast(files), Seq("file"))
      .filter(col("date").between(start, end))
      .agg(coalesce(sum(col("count")), lit(0L)).as("total"),
        countDistinct(col("file")).as("n_files"))
      .select(lit(category).as("category"), col("total"), col("n_files"))
}

object Playcounts {

  /** Playable-media extensions (reference whitelist [MED on exact set]). */
  val playableExtensions: Seq[String] =
    Seq("ogg", "oga", "ogv", "webm", "wav", "mp3", "mid", "flac")

  /** `LogProcessor.parse` as one declarative pipeline over raw mediacounts
    * TSV lines: split → whitelist filter (path prefix + extension) →
    * `-`→0 counter parse → play count = original + transcoded audio +
    * transcoded movie → percent-decode + dir-prefix strip → (file, date,
    * count) rows.
    *
    * Column positions follow the public mediacounts format: col 0 = path,
    * play-relevant transfer counters at positions 3 (original), 4
    * (transcoded audio), 16 (transcoded movie) [MED — positional detail].
    *
    * @param lines one raw TSV line per row, column name `line`
    * @param date  the dump's day (one file per day in the reference)
    */
  def fromMediacountsLog(lines: DataFrame, date: java.sql.Date): DataFrame = {
    val f = split(col("line"), "\t")
    // get(), not [i]: under ANSI an ordinal access beyond the array kills
    // the job with INVALID_ARRAY_INDEX, so one TRUNCATED dump line — the
    // most ordinary real-world corruption — used to end the whole day
    // (measured, r12). get() answers NULL out of bounds, so a missing
    // counter column falls into the same '-'→0 rule as an unparseable one.
    def counter(i: Int): Column =
      coalesce(expr(s"try_cast(get(split(line, '\t'), $i) AS BIGINT)"), lit(0L))
    lines
      .select(element_at(f, 1).as("path"),
        // try_add, not `+`: this is the RAWEST ingest surface, and under
        // ANSI one absurd dump line with near-Long.Max counters kills
        // the whole day with ARITHMETIC_OVERFLOW (measured, r12 — the
        // same one-corrupt-row crash class as the r11 streaming cents
        // find; the Python reference's bigints can't overflow). Overflow
        // → NULL count → the count > 0 filter below drops the garbage
        // row, matching the existing tolerance for undecodable paths.
        try_add(try_add(counter(3), counter(4)), counter(16)).as("count"))
      .filter(col("path").startsWith("/wikipedia/commons/")
        && lower(regexp_extract(col("path"), "\\.([a-zA-Z0-9]+)$", 1))
          .isin(playableExtensions: _*))
      .select(
        // Percent-decode ONLY (the reference uses urllib.parse.unquote):
        // pre-escaping '+' keeps it literal (url_decode is form-encoding
        // and would turn it into a space), and try_+coalesce keeps one
        // malformed '%' from aborting a whole day's ingest — the Python
        // reference leaves undecodable bytes untouched.
        coalesce(
          expr("try_url_decode(replace(substring_index(path, '/', -1), '+', '%2B'))"),
          substring_index(col("path"), "/", -1)).as("file"),
        lit(date).as("date"),
        col("count"))
      .filter(col("count") > 0)
  }
}

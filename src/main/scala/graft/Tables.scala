package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared table readers and oracle-parity helpers.
  *
  * Parity rules (SURVEY.md §5.2): explicit ordering on a unique key set,
  * floats rounded before output, sums of ints cast to BIGINT on the DuckDB
  * side, ascending order keys declared NULLS FIRST in oracle SQL (DuckDB
  * defaults to NULLS LAST; Spark's asc is NULLS FIRST).
  */
object T {

  /** Left-to-right `(a*mult + codePoint) % p` fold over the string's
    * UNICODE CODE POINTS — the Scala twin of the oracle fragment
    * `list_reduce(string_split(s,'') → ascii(c))`, which iterates code
    * points (DuckDB chars ARE code points; Spark's split('')/ascii
    * likewise — verified empirically on BMP and astral input). A plain
    * `foldLeft` over a Scala String iterates UTF-16 CODE UNITS, which
    * diverges on astral characters (surrogate pairs fold as two values)
    * — found by the round-10 unicode corpus. ASCII results are
    * bit-identical to the old fold (code point == code unit there).
    */
  private[graft] def cpFold(s: String, mult: Long, p: Long): Long = {
    var a = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      a = (a * mult + cp) % p
      i += Character.charCount(cp)
    }
    a
  }

  /** Integer tuning knob from the environment, parsed with context: a
    * malformed or out-of-range value fails NAMING the variable and the
    * bad text, instead of a bare NumberFormatException thrown from some
    * object initializer three modules away (r12 ADVICE). Range checks
    * live HERE — on the knob, not inside one consumer — so every surface
    * that derives SQL from the knob (Spark query, DuckDB oracle
    * generator) shares a single guard; an out-of-range value can never
    * silently generate a wrong oracle (e.g. a 32-bit `1 << p` overflow
    * in DuckDB at planes ≥ 31).
    */
  private[graft] def envInt(name: String, default: Int,
                            min: Int, max: Int): Int = {
    val v = sys.env.get(name).map { raw =>
      try raw.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$name must be an integer, got '$raw'")
      }
    }.getOrElse(default)
    require(v >= min && v <= max,
      s"$name must be in [$min, $max], got $v")
    v
  }

  /** All fixture tables, for view registration / docs. */
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet reader. Schemas are embedded in parquet (no inference). */
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = tbl(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = tbl(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = tbl(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = tbl(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = tbl(s, d, "region")
  /** events.ts normalized to TIMESTAMP (LTZ) across fixture generations.
    * Earlier driver fixtures wrote TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects outright (PARQUET_TYPE_ILLEGAL) — readable only as raw longs
    * under `nanosAsLong`, then truncated to µs (bit-identical to DuckDB's
    * own ns→µs read-time truncation). Current fixtures write timestamp[µs]
    * without UTC adjustment, which Spark reads as TIMESTAMP_NTZ. The
    * session TZ is pinned UTC (build.sbt), so the NTZ→LTZ cast is
    * value-preserving and both generations land on identical µs instants
    * — every downstream window/watermark/date_trunc sees one type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(tbl(s, d, "events"))
  }

  /** ts → TimestampType for either fixture generation (see [[events]]). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // The NTZ→LTZ cast reinterprets the wall-clock fields in the
        // SESSION timezone — value-preserving ONLY under UTC. That
        // invariant lives in session config (build.sbt fork options /
        // each builder), not in this code path, so fail loudly rather
        // than silently shifting every instant if a caller ever runs
        // non-UTC (r9 ADVICE). The legacy nanos branch above is
        // TZ-independent and needs no guard.
        val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
        // Compare normalized zone rules, not the literal string: 'UTC',
        // 'Etc/UTC', 'Z', '+00:00' are all value-preserving for the cast
        // and must all pass; only a genuinely shifted zone should throw
        // (review r10).
        val isUtc = scala.util.Try(
          java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
        ).getOrElse(false)
        require(isUtc,
          s"events.ts is TIMESTAMP_NTZ: the NTZ->TIMESTAMP cast requires " +
            s"a UTC session timezone (got '$tz')")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  def documents(s: SparkSession, d: String): DataFrame  = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")

  /** All three rounders run graft.functions.DuckRound — the ORACLE's own
    * double-rounding algorithm (std::round(x·10ᵖ)/10ᵖ, ties away from
    * zero), codegen'd. Parity is structural (including -0.0, which
    * Spark's BigDecimal round drops) and it benches ~8× faster per value
    * than the builtin round's BigDecimal path.
    */
  private def duckRound(c: Column, scale: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.DuckRoundExpr(
      ColumnBridge.expression(c.cast("double")), scale))
  }

  /** Round for per-row arithmetic outputs (bit-identical across engines). */
  def r6(c: Column): Column = duckRound(c, 6)

  /** Round for sums over many rows — coarser, absorbs fp-ordering noise. */
  def r4(c: Column): Column = duckRound(c, 4)

  /** Round for money-magnitude sums (1e8+), where fp noise is largest. */
  def r2(c: Column): Column = duckRound(c, 2)

  /** events.ts truncated to day as DATE (identical in Spark and DuckDB). */
  def day(c: Column): Column = date_trunc("DAY", c).cast("date")

  /** SQL fragment: BIGINT expression cast to INT, failing LOUDLY on
    * overflow (r18 ADVICE on setop_multiset): a plain CAST wraps negative
    * under ANSI-off and array_repeat on a negative count silently returns
    * an empty array — silent row loss. Unreachable below ~2^31 rows per
    * group, but keys that argue 100 TB semantics must fail, not lose rows.
    * The guarded value is identical to CAST(e AS INT) whenever it fits.
    */
  def intExactSql(e: String): String =
    s"CASE WHEN ($e) <= 2147483647 THEN CAST(($e) AS INT) " +
      s"ELSE CAST(raise_error(CONCAT('count exceeds Int.MaxValue: ', " +
      s"CAST(($e) AS STRING))) AS INT) END"

  // NOTE on input layout (2026-08-13 fixture regeneration): every fixture
  // table is now ONE parquet row group, and a parquet scan parallelizes at
  // row-group granularity — scan-fused stages run single-task at any
  // master width. A layout-decoupling repartition after the scan was
  // measured at the two heaviest compute-after-scan sites and REJECTED
  // both times (dedup signature fold 1.75→1.89 s, embed-cosine assignment
  // 2.10→2.40 s, isolated 2-JVM medians): at fixture scale the serial
  // work above the scan is cheaper than the exchange, and the remaining
  // delta is an unavoidable serial-decode floor. At cluster scale the
  // same decision holds in reverse — healthy multi-row-group inputs give
  // the scan its parallelism for free, so no loader here adds an
  // unconditional exchange. Bench bands are pinned on this layout
  // (BASELINE.md).
}

/** One bundle of driver-contract queries plus their DuckDB oracle SQL. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

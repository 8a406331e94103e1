package graft.operators

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (SURVEY.md §2.11
  * family; no reference analog — the reference never samples
  * [`LogProcessor.py` processes every row, UNVERIFIED]).
  *
  * Both samplers key on an explicit affine hash of the row id —
  * `(doc_id * 1103515245 + 12345) mod (2^31 − 1)` — NOT on engine RNG or
  * hash builtins, for the same reason as the Dedup suite: the identical
  * arithmetic runs in the DuckDB oracle, so the SAMPLE ITSELF is
  * oracle-checked, and a re-run over re-partitioned data picks the same
  * rows (sampling that shifts under repartitioning poisons dataset
  * reproducibility at 100 TB).
  *
  * Scale notes (100 TB):
  * - Bernoulli sampling is a pure map-side filter — zero shuffles, full
  *   codegen, composes with pushdown (the hash predicate can't reach the
  *   parquet reader, but every pruned column/partition still does);
  * - fixed-k-per-stratum needs a per-stratum top-k: ONE shuffle on the
  *   stratum key. The window form here is fine while k × |strata| is
  *   modest; for huge k swap in the same two-stage per-partition-heap
  *   trick Spark uses for TakeOrderedAndProject.
  */
object Sampling extends QueryModule {
  import T._

  private val P = 2147483647L
  // Reduce the id mod P BEFORE the multiply: the product then stays below
  // P·1103515245 ≈ 2.4e18 < 2^63 for ANY 64-bit id. A raw id·a would wrap
  // (Spark) or error (DuckDB ANSI overflow) once ids pass 2^63/a ≈ 8.4e9 —
  // i.e. exactly at the 100 TB scale this module claims to serve. Same
  // discipline as the Dedup hash fragments.
  private def h(c: String) = s"((CAST($c AS BIGINT) % $P) * 1103515245 + 12345) % $P"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fixed-size stratified sample: exactly min(20, |stratum|) docs per
    // language, chosen by hash rank — deterministic across runs, engines,
    // and partitionings.
    "sample_stratified" -> ((s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("hkey"), col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), col("lang"), expr(h("doc_id")).as("hkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("doc_id"), col("lang"), col("rk"))
    }),

    // Rate-based Bernoulli sample with per-stratum rates (en 10%, de 20%,
    // rest 5%): map-side filter on the hash bucket, no shuffle at all.
    "sample_hash_bernoulli" -> ((s, d) => {
      documents(s, d)
        .withColumn("bucket", expr(s"${h("doc_id")} % 100"))
        .filter(col("bucket") <
          when(col("lang") === "en", 10)
            .when(col("lang") === "de", 20)
            .otherwise(5))
        .select(col("doc_id"), col("lang"), col("bucket"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "sample_stratified" -> s"""
      WITH ranked AS (
        SELECT doc_id, lang, ${h("doc_id")} AS hkey,
               row_number() OVER (PARTITION BY lang
                 ORDER BY ${h("doc_id")}, doc_id) AS rk
        FROM documents)
      SELECT doc_id, lang, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= 20
      ORDER BY lang, rk
    """,

    "sample_hash_bernoulli" -> s"""
      SELECT doc_id, lang, ${h("doc_id")} % 100 AS bucket
      FROM documents
      WHERE ${h("doc_id")} % 100 <
            CASE WHEN lang = 'en' THEN 10 WHEN lang = 'de' THEN 20 ELSE 5 END
      ORDER BY doc_id
    """
  )
}

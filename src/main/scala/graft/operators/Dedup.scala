package graft.operators

import graft.{QueryModule, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` (BASELINE.json mandate: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard — the training-data-pipeline ops).
  *
  * Cross-engine determinism rule (SURVEY.md §7.4#2): NEVER use engine hash
  * builtins (Spark Murmur3 ≠ DuckDB xxhash). Every hash here is explicit
  * integer arithmetic — a character-level polynomial rolling hash mod
  * p = 2^31−1, and affine MinHash permutations (aᵢ·x+bᵢ) mod p with fixed
  * constants — computed with identical 64-bit arithmetic in both engines
  * (products < 2^62, no overflow in either).
  *
  * Scale notes (100 TB):
  * - exact dedup is a single hash-shuffle on sha2(text) — never a sort;
  * - jaccard/minhash/simhash candidate generation shuffles on SHORT keys
  *   (shingle code / band key / 4-bit band), not on document text; document
  *   pairs are only materialized for candidates, never the n² cross join;
  * - common-shingle skew: at real scale add a document-frequency cap on
  *   shingles (drop shingles appearing in >0.1% of docs) before the
  *   self-join — omitted here because fixtures are uniform word soup;
  * - SimHash band recall is exact by pigeonhole: 32 bits in 4 bands ⇒ any
  *   pair with hamming ≤ 3 shares a band, so filtering candidates to ≤ 2
  *   loses nothing — the LSH is a pure pruning step, not an approximation.
  */
object Dedup extends QueryModule {
  import T._

  private val P = 2147483647L // 2^31 − 1

  // MinHash affine permutation constants (fixed, embedded in BOTH dialects).
  private val K = 16
  private val BANDS = 4
  private val ROWS = K / BANDS
  private val as: Seq[Long] = (1 to K).map(i => (1103515245L * i + 12345L) % P)
  private val bs: Seq[Long] = (1 to K).map(i => (2654435761L * i + 1013904223L) % P)

  /** Spark SQL + DuckDB-compatible expression fragments. Each has a Spark
    * (expr string) and a DuckDB form; kept adjacent so drift is visible.
    */
  // Spark: polynomial char hash of a token/shingle string.
  private def sparkCode(x: String): String =
    s"aggregate(transform(split($x, ''), c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), (a, c) -> (a * 31 + c) % $P)"
  // DuckDB: same fold (list_reduce needs the 0 seed prepended).
  private def duckCode(x: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($x, ''), c -> CAST(ascii(c) AS BIGINT))), (a, c) -> (a * 31 + c) % $P)"

  // Distinct 3-token-shingle codes per document (guarded for <3 tokens:
  // Spark sequence(1,0) counts DOWN, so the empty case must be explicit).
  private val sparkShingleCodes: String = {
    val sh = "transform(sequence(1, size(split(text, ' ')) - 2), i -> " +
      "concat_ws(' ', element_at(split(text, ' '), i), element_at(split(text, ' '), i + 1), element_at(split(text, ' '), i + 2)))"
    s"CASE WHEN size(split(text, ' ')) >= 3 THEN array_distinct(transform($sh, s -> ${sparkCode("s")})) ELSE CAST(array() AS ARRAY<BIGINT>) END"
  }
  private val duckShingleCodes: String = {
    val toks = "string_split(text, ' ')"
    val sh = s"list_transform(range(1, greatest(len($toks) - 2, 0) + 1), i -> $toks[i] || ' ' || $toks[i + 1] || ' ' || $toks[i + 2])"
    s"list_distinct(list_transform($sh, s -> ${duckCode("s")}))"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: one shuffle on the content hash; deterministic survivor
    // (min doc_id). Output = duplicate groups only.
    "dedup_exact" -> ((s, d) => {
      documents(s, d)
        .groupBy(sha2(col("text"), 256).as("text_sha"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy(col("canonical_id"))
    }),

    // N-gram Jaccard near-dup: inverted index on shingle code → candidate
    // pairs → exact Jaccard ≥ 0.8. Shuffles on the 8-byte shingle code.
    "dedup_ngram_jaccard" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), expr(sparkShingleCodes).as("codes"))
      val sh = docs.select(col("doc_id"), explode(col("codes")).as("sh"))
      val cnt = docs.select(col("doc_id"), size(col("codes")).as("nsh"))
      val pairs = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(cnt.as("ca"), col("a_id") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("b_id") === col("cb.doc_id"))
        .select(col("a_id"), col("b_id"),
          r6(col("inter") / (col("ca.nsh") + col("cb.nsh") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // MinHash + banded LSH: 16 affine permutations, 4 bands × 4 rows.
    // Candidates share ≥1 band; exact Jaccard (on the same shingle-code
    // sets) confirms ≥ 0.9. The arithmetic is literal-identical in the
    // oracle SQL, so results hash-match across engines.
    "dedup_near_minhash" -> ((s, d) => {
      val sigExprs = (0 until K).map { i =>
        expr(s"array_min(transform(codes, x -> (${as(i)} * x + ${bs(i)}) % $P))").as(s"sig$i")
      }
      val bandExprs = (0 until BANDS).map { j =>
        val parts = (0 until ROWS).map(r => s"CAST(sig${j * ROWS + r} AS STRING)")
        expr(s"named_struct('band', $j, 'key', concat_ws(':', ${parts.mkString(", ")}))")
      }
      val docs = documents(s, d)
        .select(col("doc_id"), expr(sparkShingleCodes).as("codes"))
        .filter(size(col("codes")) > 0)
      val sigs = docs.select(col("doc_id") +: col("codes") +: sigExprs: _*)
        .select(col("doc_id"), col("codes"), explode(array(bandExprs: _*)).as("b"))
        .select(col("doc_id"), col("codes"), col("b.band").as("band"), col("b.key").as("key"))
      val cand = sigs.as("a").join(sigs.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          col("a.codes").as("ca"), col("b.codes").as("cb"))
        .dropDuplicates("a_id", "b_id")
      cand
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("ca"), col("cb"))).as("inter"),
          size(col("ca")).as("na"), size(col("cb")).as("nb"))
        .select(col("a_id"), col("b_id"),
          r6(col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.9)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // SimHash (32-bit): token-frequency-weighted bit votes; banded join
    // (4 bands × 8 bits) prunes pairs; exact hamming ≤ 2 filter. Emits the
    // near-dup pairs with their hamming distance.
    "dedup_simhash" -> ((s, d) => {
      val sig = documents(s, d)
        .select(col("doc_id"),
          explode(expr(s"transform(split(text, ' '), t -> ${sparkCode("t")})")).as("code"))
        .select(col("doc_id"), col("code"), explode(expr("sequence(0, 31)")).as("bit"))
        .groupBy(col("doc_id"), col("bit"))
        .agg(sum(expr("CASE WHEN (shiftright(code, CAST(bit AS INT)) & 1) = 1 THEN 1 ELSE -1 END")).as("vote"))
        .groupBy(col("doc_id"))
        .agg(sum(expr("CASE WHEN vote > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) ELSE 0 END")).as("simhash"))
      val banded = sig.select(col("doc_id"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bkey", expr("shiftright(simhash, CAST(band * 8 AS INT)) & 255"))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .dropDuplicates("a_id", "b_id")
        .filter(col("hamming") <= 2)
        .orderBy(col("a_id"), col("b_id"))
    })
  )

  def oracleSql: Map[String, String] = {
    val sigSelects = (0 until K).map { i =>
      s"list_min(list_transform(codes, x -> (${as(i)} * x + ${bs(i)}) % $P)) AS sig$i"
    }.mkString(",\n               ")
    val bandRows = (0 until BANDS).map { j =>
      val parts = (0 until ROWS).map(r => s"CAST(sig${j * ROWS + r} AS VARCHAR)")
      s"SELECT doc_id, codes, $j AS band, concat_ws(':', ${parts.mkString(", ")}) AS key FROM sigs"
    }.mkString("\n        UNION ALL\n        ")

    Map(
      "dedup_exact" -> """
        SELECT sha256(text) AS text_sha, min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1 HAVING count(*) > 1
        ORDER BY canonical_id
      """,

      "dedup_ngram_jaccard" -> s"""
        WITH docs AS (SELECT doc_id, $duckShingleCodes AS codes FROM documents),
        sh AS (SELECT doc_id, unnest(codes) AS sh FROM docs),
        cnt AS (SELECT doc_id, len(codes) AS nsh FROM docs),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT a_id, b_id, jaccard FROM (
          SELECT a_id, b_id,
                 round(inter / (ca.nsh + cb.nsh - inter), 6) AS jaccard
          FROM pairs
          JOIN cnt ca ON a_id = ca.doc_id
          JOIN cnt cb ON b_id = cb.doc_id)
        WHERE jaccard >= 0.8
        ORDER BY a_id, b_id
      """,

      "dedup_near_minhash" -> s"""
        WITH docs AS (
          SELECT doc_id, $duckShingleCodes AS codes FROM documents),
        ne AS (SELECT * FROM docs WHERE len(codes) > 0),
        sigs AS (
          SELECT doc_id, codes,
               $sigSelects
          FROM ne),
        banded AS (
        $bandRows
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                 a.codes AS ca, b.codes AS cb
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        j AS (
          SELECT a_id, b_id,
                 round(len(list_intersect(ca, cb)) /
                       (len(ca) + len(cb) - len(list_intersect(ca, cb))), 6) AS jaccard
          FROM cand)
        SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= 0.9
        ORDER BY a_id, b_id
      """,

      "dedup_simhash" -> s"""
        WITH codes AS (
          SELECT doc_id, unnest(list_transform(string_split(text, ' '), t -> ${duckCode("t")})) AS code
          FROM documents),
        votes AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN ((code >> CAST(bit AS INT)) & 1) = 1 THEN 1 ELSE -1 END) AS vote
          FROM codes, range(0, 32) t(bit)
          GROUP BY doc_id, bit),
        sig AS (
          SELECT doc_id,
                 sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS simhash
          FROM votes GROUP BY doc_id),
        banded AS (
          SELECT doc_id, simhash, band,
                 (simhash >> CAST(band * 8 AS INT)) & 255 AS bkey
          FROM sig, range(0, 4) t(band)),
        pairs AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 2
        ORDER BY a_id, b_id
      """
    )
  }
}

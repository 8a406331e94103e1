package graft.operators

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis suite over `documents` (BASELINE.json mandate: language
  * ID, quality scoring, token counting, document fingerprinting).
  *
  * Everything is builtin-expression arithmetic (no UDFs) so each op is
  * codegen'd AND byte-reproducible in the DuckDB oracle. The lang-ID
  * marker lists and quality-score weights are fixed constants — the point
  * here is the distributed plumbing (tokenize → score → argmax per row;
  * explode → count at corpus scale), not linguistic accuracy.
  *
  * Scale notes (100 TB):
  * - per-document ops (lang-ID, quality, token counts, fingerprints) are
  *   pure map-side projections — zero shuffles, full WholeStageCodegen;
  * - corpus-level TF is the canonical two-phase hash aggregate: map-side
  *   partial counts per token, one shuffle on token, top-k via
  *   TakeOrderedAndProject (never a global sort of the vocabulary);
  * - lang_stats'  top-source-per-lang uses a window over the SMALL
  *   (lang × source) aggregate, not over raw rows.
  */
object TextAnalysis extends QueryModule {
  import T._

  private val P = 2147483647L

  /** Misra-Gries frequency summary with k counters: streams `tokens` in
    * one pass with O(k) memory and returns (token, lower_count) for the
    * surviving counters. Guarantee (the basis of text_heavy_hitters'
    * exactness, property-tested in GenPropertySpec): every token's true
    * count f satisfies m ≤ f ≤ m + n/(k+1), where n is the stream length
    * and m its surviving count (0 if evicted) — so any token with
    * f > n/(k+1) is guaranteed to survive.
    */
  private[graft] def misraGries(tokens: Iterator[String],
                                k: Int): Iterator[(String, Long)] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    tokens.foreach { tok =>
      if (counters.contains(tok) || counters.size < k)
        counters.update(tok, counters.getOrElse(tok, 0L) + 1L)
      else {
        // Eviction: decrement every counter, drop zeros; the arriving
        // token is NOT counted. O(k) amortized over ≥k arrivals between
        // evictions.
        val ks = counters.keysIterator.toArray
        var i = 0
        while (i < ks.length) {
          val v = counters(ks(i)) - 1L
          if (v == 0L) counters.remove(ks(i))
          else counters.update(ks(i), v)
          i += 1
        }
      }
    }
    counters.iterator
  }

  private def sparkCode(x: String): String =
    s"aggregate(transform(split($x, ''), c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), (a, c) -> (a * 31 + c) % $P)"
  private def duckCode(x: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($x, ''), c -> CAST(ascii(c) AS BIGINT))), (a, c) -> (a * 31 + c) % $P)"

  /** Marker tokens per language — tiny fixed profiles for the n-gram /
    * stopword language-ID heuristic. Tie-break: first lang in CASE order.
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "das", "nicht"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "una", "que"),
    "fr" -> Seq("le", "et", "les", "dans"),
    "zh" -> Seq("shi", "bu", "wo", "zhe"))

  private def inList(ts: Seq[String]) = ts.map("'" + _ + "'").mkString(", ")
  // Spark + DuckDB marker-count expressions (lambda filter over tokens).
  private def sparkScore(ts: Seq[String]) =
    s"size(filter(split(text, ' '), t -> t IN (${inList(ts)})))"
  private def duckScore(ts: Seq[String]) =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${inList(ts)})))"

  private val stop = Seq("the", "and", "of", "to", "a", "in", "is")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Corpus term frequency: tokenize → explode → count; top-50 terms.
    "text_tokenize_tf" -> ((s, d) => {
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(desc("tf"), col("token"))
        .limit(50)
    }),

    // Per-language corpus stats + most common source (window over the
    // small (lang, source) aggregate; count-desc, source-asc tie-break).
    "text_lang_stats" -> ((s, d) => {
      val perSrc = documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      val w = Window.partitionBy(col("lang")).orderBy(desc("n"), col("source"))
      perSrc
        .withColumn("rn", row_number().over(w))
        .groupBy(col("lang"))
        .agg(sum(col("n")).as("n_docs"),
          r4(sum(col("chars")) / sum(col("n"))).as("avg_chars"),
          max(when(col("rn") === 1, col("source"))).as("top_source"))
    }),

    // Language ID: marker-token voting with a deterministic CASE-order
    // tie-break; emits the winning lang and its score per document.
    "text_lang_id" -> ((s, d) => {
      // One JIT'd token pass per document via typed mapPartitions. The
      // expression form (5 HOF `filter` lambdas) is interpreted, and
      // CollapseProject re-tokenizes the text once PER marker set — the
      // round-1 trap again; this was the slowest key in the r2 bench.
      // The oracle's CASE tie-break ("first lang ≥ all later langs") is
      // exactly "first index achieving the max", proven: any earlier lang
      // that failed is strictly below some later score, hence below max.
      import s.implicits._
      val langNames = markers.map(_._1).toArray
      val markerSets = markers.map(_._2.toSet).toArray
      documents(s, d).select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, lang, text) =>
          val scores = new Array[Int](markerSets.length)
          text.split(" ", -1).foreach { t =>
            var i = 0
            while (i < markerSets.length) {
              if (markerSets(i)(t)) scores(i) += 1
              i += 1
            }
          }
          val max = scores.max
          (id, lang, langNames(scores.indexOf(max)), max)
        })
        .toDF("doc_id", "actual_lang", "pred_lang", "pred_score")
    }),

    // Quality scoring: length, stopword ratio, type-token ratio, mean
    // token length → fixed-weight composite in [0, 1].
    // r18 OPTIMIZATION (guide step 2 / §4.1): ONE JIT'd mapPartitions
    // token pass — the r2 text_lang_id lesson applied here. The
    // expression form ran interpreted HOF lambdas (filter / transform /
    // aggregate are CodegenFallback) and re-evaluated split(text) per
    // consuming expression (each formula held its own copy; the quality
    // composite repeated every component). Scala twins are exact:
    // split(" ", -1) matches Spark split's trailing-empty semantics
    // (the Dedup.codesDS rule), distinct-count matches array_distinct,
    // codePointCount matches length()'s code-point semantics (the
    // T.cpFold rule — a UTF-16 .length would diverge on astral chars),
    // Int-over-Double division promotes identically, and the composite
    // reuses the SAME raw doubles in the same order, so every emitted
    // double is bit-identical to the expression form
    // (TextParitySpec pins old-vs-new equality on adversarial corpora,
    // unicode included). Rounding stays the shared DuckRound column
    // (T.r6) applied above the fold — unchanged oracle contract.
    // r19 (r18 ADVICE): NULL text emits NULL metrics — the expression
    // form degraded that way (split(NULL) → NULL propagates through every
    // metric), and the r18 JIT rewrite must not tighten the contract to
    // an NPE just because the fixture happens to be non-null.
    "text_quality_score" -> ((s, d) => {
      import s.implicits._
      val stopSet = stop.toSet
      documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          if (text == null)
            (id, None: Option[Int], None: Option[Double],
              None: Option[Double], None: Option[Double], None: Option[Double])
          else {
          val toks = text.split(" ", -1)
          val nTokI = toks.length
          val nTok = nTokI.toDouble
          var stopN = 0
          var lenSum = 0
          toks.foreach { t =>
            if (stopSet(t)) stopN += 1
            lenSum += t.codePointCount(0, t.length)
          }
          val ttr = toks.distinct.length / nTok
          val stopRatio = stopN / nTok
          val avgLen = lenSum / nTok
          val lenScore = math.min(nTok, 100.0) / 100.0
          val quality = ttr * 0.4 + lenScore * 0.3 +
            math.min(avgLen / 10.0, 1.0) * 0.2 + stopRatio * 0.1
          (id, Some(nTokI), Some(ttr), Some(stopRatio), Some(avgLen),
            Some(quality))
          }
        })
        .toDF("doc_id", "n_tokens", "ttr", "stop_ratio", "avg_len", "q")
        .select(col("doc_id"), col("n_tokens"),
          r6(col("ttr")).as("type_token_ratio"),
          r6(col("stop_ratio")).as("stopword_ratio"),
          r6(col("avg_len")).as("avg_token_len"),
          r6(col("q")).as("quality"))
    }),

    // Token counting three ways: whitespace split, BPE-ish regex pieces
    // (letter runs / digit runs / other), chars-per-token estimate.
    "text_token_count" -> ((s, d) => {
      documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        expr("CAST(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS INT)").as("bpe_tokens"),
        expr("CAST(ceil(n_chars / 4.0) AS BIGINT)").as("est_tokens"))
    }),

    // TF-IDF: the two-aggregate composition (per-doc term counts, then
    // corpus document frequency) with smoothed idf = ln((N+1)/(df+1)) + 1.
    // Both aggregates are hash aggs shuffling on (doc, token) / token; the
    // df table and corpus size broadcast back onto the tf table — at
    // 100 TB the vocabulary side is small relative to the corpus, exactly
    // the broadcast-join shape.
    "text_tfidf" -> ((s, d) => {
      val docs = documents(s, d)
      // Cached once: the df broadcast build re-derived the whole
      // explode+aggregate otherwise (broadcast builds don't participate
      // in ReuseExchange) — the "explicit persist of tf halves the scan
      // work" note from the round-2 plan audit, applied in r9 with the
      // idiom adjudicated in Dedup.prefixJaccardPairs.
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
        .persist()
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(broadcast(df), "token")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          r6(col("tf") * (log((col("n_docs") + 1).cast("double")
            / (col("df") + 1)) + 1)).as("tfidf"))
    }),

    // Bigram language-model scoring: add-one-smoothed avg log
    // P(wᵢ | wᵢ₋₁) per document — the perplexity-style fluency filter for
    // training corpora. Corpus bigram/unigram tables are hash aggs; the
    // per-doc score joins bigrams back to both count tables (vocab-sized
    // ⇒ broadcast at real scale) and averages ln((c₁₂+1)/(c₁+V)).
    "text_bigram_lm" -> ((s, d) => {
      // r18 OPTIMIZATION (guide §2.4 "remove shuffles outright"): bigram
      // adjacency is a property of each document's OWN token array, so
      // the old lag-window derivation — Exchange(doc_id) + Sort + Window
      // over the whole exploded token stream — paid a full shuffle for
      // map-side information (plans/r18/text_bigram_lm_before.txt).
      // Now: zip the split array against itself shifted by one
      // (arrays_zip of two slices — plain codegen'd expressions, no
      // interpreted lambdas) and explode the pairs; the layered select
      // keeps ONE split per row (CollapseProject declines to inline a
      // non-cheap alias used more than once). Same (doc_id, prev, token)
      // multiset: position k pairs with k+1, first token never a
      // 'token', last never a 'prev'; a 1-token doc yields no bigrams
      // (slice length 0) exactly as the window's prev-NULL filter did.
      // The vocabulary scalar now counts rows of the unigram aggregate
      // (|distinct tokens| ≡ |uc groups|) instead of re-running a THIRD
      // explode+distinct chain over the corpus; uc persists (2 consumers:
      // broadcast build + vocab count), big persists as before (2
      // consumers), tok is single-consumer now and needs no cache.
      val big = documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(expr(
          "arrays_zip(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1))")).as("bg"))
        .select(col("doc_id"), col("bg.0").as("prev"), col("bg.1").as("token"))
        .persist()
      val bc = big.groupBy(col("prev"), col("token")).agg(count(lit(1)).as("c12"))
      val uc = documents(s, d)
        .select(explode(split(col("text"), " ")).as("prev"))
        .groupBy(col("prev")).agg(count(lit(1)).as("c1"))
        .persist()
      val v = uc.agg(count(lit(1)).as("vocab"))
      big.join(broadcast(bc), Seq("prev", "token"))
        .join(broadcast(uc), Seq("prev"))
        .crossJoin(broadcast(v))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          r6(avg(log((col("c12") + 1).cast("double") / (col("c1") + col("vocab")))))
            .as("avg_logp"))
    }),

    // PII scrubbing: regex redaction of emails/phones — the standard
    // pre-training cleanup pass. The fixtures carry no PII, so each row
    // deterministically injects a synthetic email (docs where id%3≠0) and
    // phone (id%2=0) before scrubbing — the point is the distributed
    // map-side regexp pipeline, byte-identical in the oracle. Patterns are
    // dialect-portable (greedy char classes only: Java regex and RE2 find
    // the same spans).
    "text_pii_scrub" -> ((s, d) => {
      val raw = concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) =!= 0,
          concat(lit(" contact u"), col("doc_id"), lit("@mail.example.org")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit("")))
      val email = "[a-z0-9._]+@[a-z0-9.]+"
      val phone = "555-[0-9]{4}"
      documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          regexp_count(col("raw"), lit(email)).as("n_emails"),
          regexp_count(col("raw"), lit(phone)).as("n_phones"),
          regexp_replace(regexp_replace(col("raw"), email, "<EMAIL>"),
            phone, "<PHONE>").as("scrubbed"))
    }),

    // Document fingerprinting: full-text rolling hash, winnowing-style
    // minimum shingle hash, and a 1024-way locality bucket. Typed
    // mapPartitions for the same reason as the Dedup signatures (HOF char
    // folds are interpreted — 9 s for this key at sf0.1 vs <1 s JIT'd);
    // arithmetic matches the DuckDB oracle fragment exactly.
    // Vocabulary coverage curve (Zipf head analysis): what share of all
    // corpus tokens do the top-k vocabulary entries cover — the question
    // behind every vocab-truncation / tokenizer-budget decision. Corpus
    // total is a broadcast 1-row cross join; the running share windows
    // over only the top-30 rows (TakeOrdered output), never the full
    // vocabulary.
    "text_zipf_coverage" -> ((s, d) => {
      // r18 OPTIMIZATION (guide §2.4): tf feeds TWO consumers — the
      // top-30 TakeOrdered and the corpus-total aggregate — and the
      // total rides a broadcast build, which re-derived the whole
      // explode+aggregate subtree (two full Scan+Generate chains in
      // plans/r18/text_zipf_coverage_before.txt; broadcast builds don't
      // participate in ReuseExchange, the r9 finding). persist() the
      // vocabulary-sized tf aggregate: one token-stream scan, the total
      // becomes a cheap cache re-read. Same fix PLANS.md round-3 noted
      // ("at 100 TB one would cache the tf aggregate") but never applied.
      val tf = documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("tf"))
        .persist()
      val total = tf.agg(sum(col("tf")).as("total"))
      val top = tf.orderBy(desc("tf"), col("token")).limit(30)
      // Constant partition key: the window input is the bounded top-30,
      // so one partition IS the plan — declaring it explicitly (instead
      // of an empty partition spec) keeps WindowExec's "moving all data
      // to a single partition" WARN out of every bench/driver log tail.
      // NOT a bare literal: ConstantFolding (plus the null-aware x*0
      // simplification on the non-nullable count) erases literal-valued
      // specs back to empty; pmod(tf,1) is constant 0 per row but opaque
      // to the simplifier.
      val onePart = pmod(col("tf"), lit(1))
      val w = Window.partitionBy(onePart).orderBy(desc("tf"), col("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.crossJoin(broadcast(total))
        .select(
          row_number().over(
            Window.partitionBy(onePart).orderBy(desc("tf"), col("token"))).as("rank"),
          col("token"), col("tf"),
          r6(sum(col("tf")).over(w) / col("total")).as("cum_share"))
    }),

    "text_fingerprint" -> ((s, d) => {
      import s.implicits._
      val p = P
      documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          def fold(str: String): Long = T.cpFold(str, 31, p)
          val fpFull = fold(text)
          val toks = text.split(" ", -1)
          val fpMin = if (toks.length >= 3)
            (0 until toks.length - 2)
              .map(i => fold(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")).min
          else fpFull
          (id, fpFull, fpMin, fpFull % 1024)
        })
        .toDF("doc_id", "fp_full", "fp_min_shingle", "fp_bucket")
    }),

    // Heavy hitters (tokens above 1/500 of the corpus) by the two-pass
    // scheme that survives 100 TB: pass 1 runs Misra-Gries with K=2048
    // counters PER PARTITION inside one mapPartitions — fixed memory no
    // matter how large the vocabulary — and keeps only merged candidates
    // that could still clear the threshold; pass 2 recounts exactly the
    // candidate tokens (a broadcast semi-probe: the full token stream
    // never shuffles — only candidate matches reach the hash agg).
    //
    // The result is EXACT, not approximate, hence hash-checkable: MG
    // guarantees per-partition undercount ≤ n_p/(K+1), so the summed
    // merged count m(x) satisfies f(x) − N/(K+1) ≤ m(x) ≤ f(x); any
    // token with f > N/500 therefore has m > N/500 − N/(K+1), which is
    // precisely the candidate filter below (cross-multiplied in exact
    // BIGINTs) — candidates ⊇ true heavy hitters, and the exact recount
    // removes false positives. Candidate count is bounded by
    // N / (N/500 − N/2049) < 662 regardless of data size, so the
    // broadcast is always tiny.
    "text_heavy_hitters" -> ((s, d) =>
      heavyHitters(documents(s, d).select(col("text")), 2048, 500))
  )

  /** The two-pass exact heavy-hitter pipeline over a `text` column:
    * tokens with frequency > N/`phiDen`, found with Misra-Gries `k`
    * summaries per partition + broadcast-probe exact recount. Exposed
    * with its parameters so GenPropertySpec can drive k BELOW the
    * vocabulary size (forcing real evictions) on random corpora and
    * compare against a direct aggregate; the query key fixes
    * (k=2048, phiDen=500). REQUIRES k > phiDen (else the MG survival
    * bound N/(k+1) exceeds the threshold and the superset proof fails).
    */
  private[graft] def heavyHitters(docs: DataFrame, k: Int,
                                  phiDen: Long): DataFrame = {
    require(k > phiDen, s"k=$k must exceed phiDen=$phiDen for the superset bound")
    import docs.sparkSession.implicits._
    // Exact corpus token total: map-side agg to ONE row, broadcast below.
    val tot = docs
      .agg(sum(size(split(col("text"), " "))).cast("long").as("n_tok"))
    val candidates = docs.as[String]
      .mapPartitions(it =>
        misraGries(it.flatMap(_.split(" ", -1).iterator), k))
      .toDF("token", "mg_count")
      .groupBy(col("token")).agg(sum(col("mg_count")).as("m"))
      .crossJoin(broadcast(tot))
      // Candidate bound m > N/phiDen − N/(k+1), in the overflow-safe
      // floor form m > ⌊N/phiDen⌋ − ⌊N/(k+1)⌋ − 1: every term is ≤ N (no
      // products — a cross-multiplied form overflows BIGINT once
      // m·phiDen·(k+1) passes 2⁶³, i.e. a dominant token in a ~10¹³-token
      // corpus, exactly the regime this key claims to survive). The
      // floor form is ≤ the exact bound (⌊a⌋−⌊b⌋−1 ≤ a−b always), so
      // candidates only LOOSEN — superset preserved, and the exact
      // recount below removes any extras.
      .filter(col("m") >
        expr(s"n_tok div $phiDen") - expr(s"n_tok div ${k + 1}") - lit(1L))
      .select(col("token"))
    docs
      .select(explode(split(col("text"), " ")).as("token"))
      .join(broadcast(candidates), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(tot))
      // freq·phiDen > N rewritten freq > ⌊N/phiDen⌋ — equivalent for
      // integer freq (phiDen·(⌊N/phiDen⌋+1) > N) and overflow-proof at
      // any N.
      .filter(col("freq") > expr(s"n_tok div $phiDen"))
      .select(col("token"), col("freq"),
        r6(col("freq").cast("double") / col("n_tok")).as("share"))
  }

  def oracleSql: Map[String, String] = {
    val langs = markers.map(_._1)
    val duckPred = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")

    Map(
      "text_tokenize_tf" -> """
        SELECT token, count(*) AS tf
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY tf DESC, token LIMIT 50
      """,

      "text_lang_stats" -> """
        WITH per_src AS (
          SELECT lang, source, count(*) AS n, sum(n_chars) AS chars
          FROM documents GROUP BY 1, 2),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, source) AS rn
          FROM per_src)
        SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
               round(sum(chars) / sum(n), 4) AS avg_chars,
               max(CASE WHEN rn = 1 THEN source END) AS top_source
        FROM ranked GROUP BY lang ORDER BY lang
      """,

      "text_lang_id" -> s"""
        WITH scored AS (
          SELECT doc_id, lang AS actual_lang,
                 ${markers.map { case (l, ts) => s"${duckScore(ts)} AS s_$l" }.mkString(",\n                 ")}
          FROM documents)
        SELECT doc_id, actual_lang,
               $duckPred AS pred_lang,
               CAST(greatest(${langs.map(l => s"s_$l").mkString(", ")}) AS INT) AS pred_score
        FROM scored ORDER BY doc_id
      """,

      "text_quality_score" -> s"""
        WITH t AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 len(list_distinct(string_split(text, ' '))) AS n_distinct,
                 len(list_filter(string_split(text, ' '), t -> t IN (${inList(stop)}))) AS n_stop,
                 list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS sum_len
          FROM documents)
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               round(n_distinct / CAST(n_tokens AS DOUBLE), 6) AS type_token_ratio,
               round(n_stop / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
               round(sum_len / CAST(n_tokens AS DOUBLE), 6) AS avg_token_len,
               round(n_distinct / CAST(n_tokens AS DOUBLE) * 0.4
                     + least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0 * 0.3
                     + least(sum_len / CAST(n_tokens AS DOUBLE) / 10.0, 1.0) * 0.2
                     + n_stop / CAST(n_tokens AS DOUBLE) * 0.1, 6) AS quality
        FROM t ORDER BY doc_id
      """,

      "text_token_count" -> """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_tokens,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
        FROM documents ORDER BY doc_id
      """,

      "text_tfidf" -> """
        WITH tf AS (
          SELECT doc_id, token, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
          GROUP BY doc_id, token),
        df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.token, tf.tf, df.df,
               round(tf.tf * (ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)) + 1), 6) AS tfidf
        FROM tf JOIN df USING (token), n
        ORDER BY doc_id, token
      """,

      "text_bigram_lm" -> """
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS token,
                 CAST(unnest(range(0, len(string_split(text, ' ')))) AS INT) AS pos
          FROM documents),
        big AS (
          SELECT doc_id, prev, token FROM (
            SELECT doc_id, token, pos,
                   lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM tok)
          WHERE prev IS NOT NULL),
        bc AS (SELECT prev, token, count(*) AS c12 FROM big GROUP BY 1, 2),
        uc AS (SELECT token AS prev, count(*) AS c1 FROM tok GROUP BY 1),
        v AS (SELECT count(DISTINCT token) AS vocab FROM tok)
        SELECT doc_id, count(*) AS n_bigrams,
               round(avg(ln(CAST(c12 + 1 AS DOUBLE) / (c1 + vocab))), 6) AS avg_logp
        FROM big JOIN bc USING (prev, token) JOIN uc USING (prev), v
        GROUP BY doc_id
        ORDER BY doc_id
      """,

      "text_pii_scrub" -> """
        WITH raw AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 3 <> 0
                         THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.org'
                         ELSE '' END
                 || CASE WHEN doc_id % 2 = 0
                         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                         ELSE '' END AS raw
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.]+')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS INT) AS n_phones,
               regexp_replace(regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                              '555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
        FROM raw ORDER BY doc_id
      """,

      "text_zipf_coverage" -> """
        WITH tf AS (
          SELECT token, count(*) AS tf
          FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          GROUP BY token),
        top AS (
          SELECT token, tf, row_number() OVER (ORDER BY tf DESC, token) AS rank
          FROM tf ORDER BY tf DESC, token LIMIT 30)
        SELECT CAST(rank AS INT) AS rank, token, tf,
               round(CAST(sum(tf) OVER (ORDER BY tf DESC, token
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / (SELECT CAST(sum(tf) AS DOUBLE) FROM tf), 6) AS cum_share
        FROM top ORDER BY rank
      """,

      "text_heavy_hitters" -> """
        WITH tc AS (
          SELECT token, count(*) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          GROUP BY token),
        tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n_tok FROM tc)
        SELECT token, freq, round(CAST(freq AS DOUBLE) / n_tok, 6) AS share
        FROM tc, tot
        WHERE freq * 500 > n_tok
        ORDER BY freq DESC, token
      """,

      "text_fingerprint" -> s"""
        WITH t AS (
          SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        sh AS (
          SELECT doc_id, text,
                 list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS sh3
          FROM t)
        SELECT doc_id,
               ${duckCode("text")} AS fp_full,
               CASE WHEN len(sh3) > 0
                    THEN list_min(list_transform(sh3, s -> ${duckCode("s")}))
                    ELSE ${duckCode("text")} END AS fp_min_shingle,
               ${duckCode("text")} % 1024 AS fp_bucket
        FROM sh ORDER BY doc_id
      """
    )
  }
}

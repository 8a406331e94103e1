package graft
import java.nio.file.{Files, Paths}
/** Dev tool: dump final physical plans for the plan audit (PLANS.md). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = SparkFixture.spark
    val d = "/root/testdata/sf0.01"
    val keys = Seq("agg_daily_counts", "scan_parquet_pushdown", "join_broadcast_dim",
      "topk_global", "win_trailing_30d", "dedup_ngram_jaccard", "sim_topk_neighbors",
      "join_asof_latest", "stream_session_5m", "sim_ivf_topk",
      "text_tfidf", "sample_hash_bernoulli", "sample_stratified", "text_pii_scrub",
      "agg_histogram", "agg_argminmax", "agg_percentiles", "fn_bitwise",
      "join_bucketed_colocated", "scan_partition_pruned", "agg_skew_kurt",
      "agg_corr_stats", "win_range_numeric", "text_zipf_coverage",
      "multimodal_chunks", "sql_tpch_q1", "sql_tpch_q3", "setop_multiset",
      "join_category_closure", "dedup_embed_cosine", "agg_approx_quantiles",
      "agg_approx_hll", "fn_json", "proj_url_decode",
      "sql_tpch_q5", "sql_tpch_q17", "scan_dpp",
      "sql_tpch_q18", "sql_tpch_q21", "sql_tpch_q22", "text_heavy_hitters",
      "agg_funnel_steps", "agg_retention_cohort", "join_lateral_topn")
    val sb = new StringBuilder
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(s, d)
      df.count() // finalize AQE
      sb.append(s"===== $k =====\n")
      sb.append(df.queryExecution.executedPlan.toString)
      sb.append("\n\n")
    }
    Files.writeString(Paths.get("/tmp/plans.txt"), sb.toString)
    println("[plandump] written")
  }
}

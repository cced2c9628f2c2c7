package graft

import org.apache.spark.sql.SparkSession

/** One-off: run [[graft.ops.Diagnostics.planLint]] over the current
  * round's new queries' FINAL (post-AQE) plans at sf0.01 and print
  * findings. Since round 8 the two formerly hand-adjudicated benign
  * classes (1-row-broadcast BNLJ; IvfIndex.sortedCells' interpreted
  * array_sort) are encoded as allowlist rules in planLint itself, so
  * this audit is expected to print ALL-clean — any output is a real
  * finding. */
object LintNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-lint").master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = Seq(
      // round 9 new queries
      "q187_warc_census", "q188_nfc_census", "q189_layout_skipping",
      "q190_warc_landing", "q191_robots_census", "q192_script_census",
      "q193_matryoshka_eval", "q194_k_anonymity", "q195_binary_quant_eval",
      "q196_ppjoin_exact",
      // r8 wave re-audit (must stay clean)
      "q154_minhash_calibration", "q175_negative_sampling",
      "q182_boilerplate_extract", "q183_syndication_communities",
      "q184_mp4_catalog",
      // round 9 late wave
      "q197_rendezvous_shards", "q198_column_stats",
      "q199_priority_sample", "q200_windowed_outlier",
      "q201_typo_join", "q202_benford_audit", "q203_groupwise_ols",
      // round 9 third wave
      "q204_pareto_frontier", "q205_chisq_independence",
      "q206_grid_proximity_join", "q207_transition_kappa",
      "q208_embargo_split", "q209_monthly_streaks",
      "q210_weighted_median", "q211_survival_table", "q212_langmix_tvd",
      // round 9 fourth wave: drift statistics
      "q213_ks_drift", "q214_ranksum_drift", "q215_kendall_signals",
      "q216_topk_drift", "q217_luhn_audit", "q218_cusum_changepoint",
      "q219_runs_test", "q220_importance_weights", "q221_group_variance",
      "q222_lag1_autocorr", "q223_fano_burstiness", "q224_quantile_norm",
      "q225_payload_drift", "q226_emd_drift", "q227_winsorized_totals",
      "q228_graph_mixing", "q229_weekday_profile", "q230_cohort_ltv",
      "q231_basket_affinity", "q232_transition_latency",
      "q233_mad_outliers", "q234_proportion_ab", "q235_concentration",
      "q236_head_coverage", "q237_gap_census",
      // round 10 wave
      "q238_gini_spend", "q239_time_weighted_value", "q240_dau_wau_mau",
      "q241_knn_label_noise", "q242_dedup_savings", "q243_bot_screen",
      // round 10 second wave
      "q244_sign_test", "q245_split_leakage", "q246_freq_spectrum",
      "q247_fd_discovery", "q248_dup_affinity", "q249_order_violations",
      "q250_kcore_backbone", "q251_attribution_panel",
      "q252_stratum_cap", "q253_decile_lift", "q254_holt_trend",
      "q255_t_closeness", "q256_join_skew_advisor",
      // round 10 third wave
      "q257_bfs_reach", "q258_r2_matrix", "q259_watermark_advisor",
      "q260_rfm_segments", "q261_event_trigrams", "q262_sample_bias",
      "q263_peak_concurrency", "q264_broadcast_advisor", "q265_nzv_screen",
      "q266_target_encoding", "q267_ab_sizing", "q268_cluster_purity",
      // round 11 registrations (authored r10, registered r11)
      "q269_hist_cardinality", "q270_bucket_balance", "q271_share_rollup",
      // round 11 wave: robust trend + corpus-coverage census family
      "q272_mann_kendall", "q273_sen_slope", "q274_source_vocab_overlap",
      "q275_oov_census", "q276_hash_collision_audit")
    // precommit gate (tools/precommit.sh) passes the queries touched
    // since the last full battery as a comma-separated arg — lint only
    // those; no args = the full round list above.
    val selected =
      if (args.nonEmpty) args.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSeq
      else names
    var nErrs = 0
    selected.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      df.collect() // materialize so AQE finalizes the plan
      val findings = graft.ops.Diagnostics.planLint(df)
      graft.ops.TrackedCache.release(spark)
      // errors fail the audit; warn-level findings (bounded-build BNLJ)
      // print for visibility but are clean by contract
      val errs = findings.filter(_.severity == "error")
      val warns = findings.filter(_.severity == "warn")
      nErrs += errs.size
      println(s"LINT $n: " + (if (errs.isEmpty) "clean" else
        errs.map(f => s"[${f.rule}] ${f.node}: ${f.detail}").mkString(" | ")) +
        (if (warns.isEmpty) "" else
          warns.map(f => s" (warn [${f.rule}] ${f.node})").mkString))
    }
    spark.stop()
    if (nErrs > 0) sys.exit(1) // gate: precommit.sh relies on the rc
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** One-off: run [[graft.ops.Diagnostics.planLint]] over the round-7
  * wave queries' FINAL (post-AQE) plans at sf0.01 and print findings. */
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
      "q166_token_budget", "q167_cell_balanced_sample", "q168_filtered_ann",
      "q169_source_score_norm", "q170_dup_direction", "q171_quality_lorenz",
      "q172_mmr_rerank", "q173_length_match_resample", "q174_spearman_signals",
      "q175_negative_sampling", "q176_ivf_probe_curve", "q177_audio_fp_dedup")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      df.collect() // materialize so AQE finalizes the plan
      val findings = graft.ops.Diagnostics.planLint(df)
      // expected-broadcast findings on intentionally tiny frames are
      // reported too — print everything, judge by hand
      println(s"LINT $n: " + (if (findings.isEmpty) "clean"
        else findings.map(f => s"[${f.rule}] ${f.node}: ${f.detail}").mkString(" | ")))
    }
    spark.stop()
  }
}

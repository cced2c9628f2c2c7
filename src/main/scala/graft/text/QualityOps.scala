package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-based quality signals (the Gopher-rules family,
  * Rae et al. 2021 §A1.1): documents dominated by a single token or
  * bigram, or with a high fraction of repeated tokens, are boilerplate
  * / generator junk that a training-data pipeline drops before dedup.
  *
  * Shape at 100 TB: explode to (doc_id, gram), then TWO-LEVEL hash
  * aggregation — count per (doc_id, gram), then max/sum/count per
  * doc_id. Both levels combine map-side and shuffle on well-distributed
  * keys; a per-doc higher-order-function formulation would avoid the
  * shuffle but evaluates interpreted per row (the same trade measured
  * for minhash — see [[graft.dedup.Dedup.minhashSignatures]]), and the
  * exploded row count is the same volume minhash already ships.
  */
object QualityOps {

  /** Per-document repetition fractions over `text`:
    * top_token_frac (most frequent token / all tokens), dup_token_frac
    * (1 − distinct/all), top_bigram_frac (most frequent bigram / all
    * bigrams), plus the `is_repetitive` flag at the given thresholds.
    * Documents with fewer than 2 tokens have no bigrams and drop out.
    */
  def repetitionStats(docs: DataFrame,
                      maxTopTokenFrac: Double = 0.12,
                      maxDupTokenFrac: Double = 0.6,
                      maxTopBigramFrac: Double = 0.06): DataFrame = {
    val toks = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
    val tok = toks.select(col("doc_id"), explode(col("tk")).as("g"))
    val bg = toks.where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(TextFunctions.bigrams(col("tk"))).as("g"))
    def perDoc(grams: DataFrame, top: String, nAll: String, nDist: String) =
      grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max(col("c")).as(top), sum(col("c")).as(nAll), count(lit(1)).as(nDist))
    val t = perDoc(tok, "top_tok", "n_tok", "nd_tok")
    val b = perDoc(bg, "top_bg", "n_bg", "nd_bg")
    val topTokFrac = col("top_tok") / col("n_tok")
    val dupTokFrac = lit(1) - col("nd_tok") / col("n_tok")
    val topBgFrac = col("top_bg") / col("n_bg")
    t.join(b, Seq("doc_id"))
      .select(col("doc_id"),
        topTokFrac.as("top_token_frac"),
        dupTokFrac.as("dup_token_frac"),
        topBgFrac.as("top_bigram_frac"),
        (topTokFrac > maxTopTokenFrac || dupTokFrac > maxDupTokenFrac ||
          topBgFrac > maxTopBigramFrac).as("is_repetitive"))
  }
}

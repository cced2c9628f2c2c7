package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary operators — the "build the vocab, encode the
  * corpus" step of a training-data pipeline: a deterministic top-N
  * vocabulary (count desc, token asc — reproducible across runs and
  * engines), documents re-encoded as id arrays, and the OOV rate a
  * curation pass thresholds on.
  *
  * Scale shape: vocab building is one map-side-combined token count +
  * a top-N over |vocab| rows (the global row_number window runs over
  * maxSize rows, not the corpus). Encoding explodes to (doc, pos,
  * token), equi-joins the vocab — BROADCAST: a vocabulary is bounded
  * (≤ a few 100k rows) by construction — and re-assembles per-doc
  * arrays with an explicit (pos) sort inside the aggregate, so the
  * result is deterministic under any partitioning. The corpus
  * shuffles once, on doc_id.
  */
object Vocab {

  /** Top `maxSize` tokens as (token, id, n) with ids 0..maxSize-1 in
    * (count desc, token asc) order. */
  def build(docs: DataFrame, maxSize: Int): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(maxSize)
    // id assignment over the ≤ maxSize surviving rows — bounded by the
    // limit, but routed through the distributed globalRowNumber anyway
    // so no unpartitioned ranking window exists in the engine at all
    // (a caller-supplied maxSize CAN be corpus-shaped).
    graft.ops.RelationalOps.globalRowNumber(counts,
        Seq(col("n").desc, col("token").asc), outCol = "id")
      .withColumn("id", (col("id") - 1).cast("int"))
  }

  /** Documents as id arrays: (doc_id, ids, n_tokens, n_oov, oov_rate);
    * out-of-vocabulary tokens encode as -1 and keep their position. */
  def encode(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val pos = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "token")))
    pos.join(broadcast(vocab.select("token", "id")), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), coalesce(col("id"), lit(-1)).as("id")))),
          s => s.getField("id")).as("ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov") / col("n_tokens"))
  }
}

package graft.text

import graft.ops.TrackedCache.TrackOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Token-budget shard packing — the training-data step that turns a
  * deduplicated, filtered corpus into contiguous fixed-token-budget
  * shards for the tokenizer/loader fleet.
  *
  * Sharding rule: documents in `doc_id` order; a document lands in
  * shard `floor(tokens_before_it / budget)` — contiguous quota shards,
  * deterministic, independent of partitioning. (A document straddling
  * a boundary belongs to the shard where it STARTS; true stateful
  * greedy packing would serialize the whole corpus through one
  * cursor, which is exactly what cannot happen at 100 TB.)
  *
  * The exclusive running sum is a DISTRIBUTED PREFIX SUM, not a
  * global window: a single `Window.orderBy(doc_id)` funnels every row
  * through ONE partition — the classic scale cliff of naive cumsum.
  * Here: (1) range-partition and sort by doc_id; (2) one tiny
  * aggregate collects per-partition token totals to the driver —
  * P numbers, kilobytes at any corpus size; (3) each partition
  * re-streams adding its prefix offset. Wall-clock is one range
  * shuffle + two narrow passes, every partition working in parallel.
  */
object Packing {

  /** (doc_id, n_tokens, tokens_before, shard) for every document —
    * `tokenCol` must be a non-null integral token count. */
  def tokenShards(docs: DataFrame, idCol: String, tokenCol: String,
                  budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // persisted because BOTH passes below consume it — without the
    // cache the range shuffle+sort would execute twice (pass 1 is an
    // eager collect at call time, pass 2 runs when the returned frame
    // does). Unpersist falls to the ContextCleaner (lazy plan).
    val sorted = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        col(tokenCol).cast(LongType).as("n_tokens"))
      .repartitionByRange(nParts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .persistT

    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("tokens_before", LongType, nullable = false),
      StructField("shard", LongType, nullable = false)))

    // pass 1: per-partition token totals — P longs to the driver
    val perPartition = sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var sum = 0L; it.foreach(sum += _.getLong(1)); Iterator((pid, sum))
      }
      .collect().sortBy(_._1)
    // exclusive prefix offsets per partition
    val offsets = perPartition.map(_._2).scanLeft(0L)(_ + _)

    // pass 2: stream each partition with its offset
    val out = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      var run = offsets(pid)
      it.map { r =>
        val before = run
        run += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), before, before / budget)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** CONCAT-AND-CHUNK sequence packing — the GPT-style pretraining
    * step the shard packer above does NOT do: the corpus token stream
    * (documents concatenated in `idCol` order) is cut into sequences
    * of EXACTLY `seqLen` tokens, documents crossing sequence
    * boundaries (that is the point — no padding waste; q122 is the
    * padded alternative). Returns one row per training sequence:
    * (seq_id, n_docs, n_docs_started) where n_docs counts documents
    * contributing ≥1 token to the sequence and n_docs_started those
    * whose FIRST token lands in it (= EOS/BOS boundary count the
    * attention mask cares about).
    *
    * Scale shape: rides [[tokenShards]]' distributed prefix sum (a
    * global window cumsum is the single-partition cliff), then one
    * narrow explode of each doc into the sequences it overlaps —
    * total exploded rows = Σ ceil(span) ≈ total_tokens/seqLen +
    * n_docs — and one map-side-combinable count. All integer
    * arithmetic: exactly oracle-able.
    *
    * Zero-token documents contribute nothing (they occupy no token
    * interval) and are excluded — same convention as a tokenizer
    * emitting nothing. */
  def fixedLengthSequences(docs: DataFrame, idCol: String, tokenCol: String,
                           seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    tokenShards(docs, idCol, tokenCol, budget = seqLen)
      .where(col("n_tokens") > 0)
      .select(col("doc_id"),
        expr(s"tokens_before div $seqLen").as("first_seq"),
        expr(s"(tokens_before + n_tokens - 1) div $seqLen").as("last_seq"))
      .select(col("first_seq"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("first_seq") === col("seq_id"), 1L).otherwise(0L))
          .as("n_docs_started"))
  }

  /** Per-shard manifest: how many documents and tokens each shard
    * carries — what a loader reads to schedule work. */
  def shardManifest(docs: DataFrame, idCol: String, tokenCol: String,
                    budget: Long): DataFrame =
    tokenShards(docs, idCol, tokenCol, budget)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("sum_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
      .orderBy("shard")
}

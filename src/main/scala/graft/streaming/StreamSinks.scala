package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Streaming sinks with replay protection.
  *
  * Structured Streaming guarantees foreachBatch sees each (batchId,
  * data) pair deterministically REPLAYED after a failure — it does NOT
  * guarantee the function ran only once. Idempotence is the sink's
  * job: this one partitions output by batch id and treats a committed
  * `_SUCCESS` marker as "this batch already landed", so a replayed
  * batch is skipped instead of appended twice. The same job-commit
  * marker protocol as [[graft.ref.Checkpoints]] (single writer per
  * directory — which foreachBatch provides: one concurrent invocation
  * per query).
  */
object StreamSinks {

  /** True iff `batchId` already committed under `dir`. */
  def batchCommitted(df: DataFrame, dir: String, batchId: Long): Boolean = {
    val marker = new Path(s"$dir/batch=$batchId/_SUCCESS")
    marker.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .exists(marker)
  }

  /** The foreachBatch function: `stream.writeStream.foreachBatch(
    * StreamSinks.idempotentParquet(dir)).start()`. Batch directories
    * compose into one readable parquet table partitioned by `batch`. */
  def idempotentParquet(dir: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      if (!batchCommitted(df, dir, batchId)) {
        // Overwrite, not Append: a HALF-written attempt (no _SUCCESS)
        // must be replaced wholesale on replay, never appended to
        df.write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$batchId")
      } else {
        // Already landed (crash after sink commit, before checkpoint
        // commit) — skip the WRITE but still drain every partition:
        // stateful operators upstream re-execute on the replayed batch
        // and their state stores only commit when consumed, and Spark's
        // per-batch commit validation fails the restarted query if a
        // foreachBatch returns without processing all partitions
        // (exposed by StreamRecoverySpec's kill/restart proof).
        df.foreach(_ => ())
      }
}

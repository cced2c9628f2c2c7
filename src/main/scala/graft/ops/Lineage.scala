package graft.ops

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame

/** Lineage truncation with a selectable durability/speed trade — the
  * one knob the iterative operators (union-find label propagation in
  * [[graft.dedup.Dedup.nearDupClusters]], MMR re-ranking in
  * [[graft.sim.Mmr]], the q183 community pipeline) need to run both
  * fast locally and safely on a 1000-executor cluster.
  *
  * Why cut at all: an iterative plan that references its previous
  * round R times grows ~Rⁿ analyzer nodes; after a handful of rounds
  * the OPTIMIZER, not the data, is the bottleneck (Mmr measured 8
  * rounds that never finished planning). A checkpoint leaf makes each
  * round plan against materialized data.
  *
  * Modes (`spark.graft.lineage.cut`):
  *  - `"local"` (default): `localCheckpoint` — materializes to
  *    executor block storage. Fastest (no replication, no FS), but the
  *    blocks are NON-REPLAYABLE: losing an executor mid-computation
  *    fails the job. The right default for `local[n]` where executor
  *    loss means JVM death anyway.
  *  - `"reliable"`: RDD `checkpoint()` to the Spark checkpoint
  *    directory (HDFS/object store on a real cluster) — survives
  *    executor loss; the 100 TB setting for hour-long union-find jobs
  *    where a single lost container must not kill the run. If no
  *    checkpoint dir was configured, one is created under
  *    `java.io.tmpdir` WITH A LOGGED WARNING: a local tmp dir defeats
  *    the executor-loss durability this mode exists for on a real
  *    cluster — deployments must call `sparkContext.setCheckpointDir`
  *    on durable storage.
  *
  * Checkpoint-file hygiene (ADVICE r9): Spark only deletes checkpoint
  * files itself when `spark.cleaner.referenceTracking.cleanCheckpoints`
  * was set at CONTEXT CREATION, so an hour-long union-find loop would
  * otherwise accumulate one full copy of the labels frame per round.
  * `cut` therefore deletes the PREVIOUS round's checkpoint directory
  * (per session) once the next round's checkpoint has materialized.
  * Contract: the caller discards its reference to the previous round's
  * frame when the next `cut` returns — exactly what every iterative
  * loop in this engine does (`var labels = ...; labels = cut(step)`).
  * Running two INDEPENDENT reliable iterative computations
  * concurrently in one session requires disabling pruning
  * (`spark.graft.lineage.pruneCheckpoints=false`).
  *
  * Both modes materialize eagerly and preserve values exactly
  * (LineageSpec pins equality); only failure-recovery semantics and
  * speed differ. Parquet-grain, driver-restart-surviving resumability
  * is a different contract — that is [[graft.ref.Checkpoints]].
  */
object Lineage extends Logging {

  val ConfKey = "spark.graft.lineage.cut"
  val PruneKey = "spark.graft.lineage.pruneCheckpoints"

  /** Previous reliable-checkpoint dir, keyed per SparkSession. */
  private val lastCheckpoint =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  /** Truncate `df`'s lineage per the session's configured mode. */
  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "reliable" =>
        val session = df.sparkSession
        val sc = session.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
          logWarning(s"Lineage 'reliable' mode: no checkpoint dir configured; " +
            s"falling back to LOCAL tmp dir $tmp — this does NOT survive " +
            "executor loss on a cluster; setCheckpointDir to durable storage")
          sc.setCheckpointDir(tmp)
        }
        val out = df.checkpoint(eager = true)
        if (session.conf.get(PruneKey, "true") == "true") {
          // the checkpointed frame is a LogicalRDD over the RDD that
          // carries the checkpoint data — ask it where it wrote
          val newDir = out.queryExecution.analyzed match {
            case l: org.apache.spark.sql.execution.LogicalRDD =>
              l.rdd.getCheckpointFile
            case _ => None
          }
          newDir.foreach { dir =>
            val key = Integer.valueOf(System.identityHashCode(session))
            val prev = lastCheckpoint.put(key, dir)
            if (prev != null && prev != dir) {
              val p = new org.apache.hadoop.fs.Path(prev)
              try p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
              catch { case e: java.io.IOException =>
                logWarning(s"could not prune superseded checkpoint $prev: $e")
              }
            }
          }
        }
        out
      case _ => df.localCheckpoint(eager = true)
    }
}

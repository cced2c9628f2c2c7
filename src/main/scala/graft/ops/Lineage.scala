package graft.ops

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
  *    `java.io.tmpdir` (fine locally; a cluster deployment should set
  *    `sparkContext.setCheckpointDir` to durable storage).
  *
  * Both modes materialize eagerly and preserve values exactly
  * (LineageSpec pins equality); only failure-recovery semantics and
  * speed differ. Parquet-grain, driver-restart-surviving resumability
  * is a different contract — that is [[graft.ref.Checkpoints]].
  */
object Lineage {

  val ConfKey = "spark.graft.lineage.cut"

  /** Truncate `df`'s lineage per the session's configured mode. */
  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "reliable" =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
}

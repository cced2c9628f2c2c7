package graft.ref

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet stage checkpoints — the Spark-native counterpart of the
  * reference's pickle relay resumability (`dags/icpe-siretisation.py:143,152`
  * pickles each stage so a failed DAG resumes from the last stage;
  * SURVEY.md §3.4). A stage that already materialized is READ, not
  * recomputed, so a restarted pipeline picks up where it stopped.
  *
  * Unlike `persist()` (lost with the session) or `localCheckpoint()`
  * (lost with the executors), a parquet checkpoint survives a driver
  * restart — which is the actual resumability contract the reference's
  * pickles provide. It also cuts lineage: downstream stages plan
  * against a fresh scan of columnar files with statistics, not the
  * upstream query tree.
  */
object Checkpoints {

  /** True iff the stage directory holds a complete write (_SUCCESS). */
  def isComplete(spark: SparkSession, dir: String, name: String): Boolean = {
    val marker = new Path(s"$dir/$name/_SUCCESS")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker)
  }

  /** Return the checkpointed stage if complete; otherwise compute it,
    * write it atomically (parquet job commit — partial output from a
    * crashed attempt carries no _SUCCESS and is overwritten), and read
    * it back. `compute` is by-name: a resumed run never builds the
    * upstream plan at all.
    *
    * Concurrency contract: ONE writer per `ckptDir` at a time — the
    * check-then-write is not atomic across processes, so two
    * concurrent runs sharing a stage directory can both see
    * `!isComplete` and interleave writes. This matches the reference's
    * single-DAG pickle relay (one Airflow task instance per stage).
    * Completeness detection also requires the default committer
    * setting `mapreduce.fileoutputcommitter.marksuccessfuljobs=true`
    * (on by default) so that job commit drops the _SUCCESS marker. */
  def stage(spark: SparkSession, dir: String, name: String)
           (compute: => DataFrame): DataFrame = {
    val path = s"$dir/$name"
    if (!isComplete(spark, dir, name))
      compute.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  /** Drop a stage so the next run recomputes it (e.g. after upstream
    * data changed). */
  def invalidate(spark: SparkSession, dir: String, name: String): Unit = {
    val p = new Path(s"$dir/$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}

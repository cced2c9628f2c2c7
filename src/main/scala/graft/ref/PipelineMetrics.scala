package graft.ref

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Single-pass pipeline stage metrics — the counterpart of the
  * reference's logged row counts (`dags/icpe-siretisation.py:305-357`
  * runs THREE separate count scans for its stats block). `observe`
  * attaches commutative aggregates to the plan itself: the metrics
  * materialize as a side effect of whatever action the pipeline
  * already runs (a write, the stats aggregation), costing zero extra
  * jobs — the difference between "log a count" and "rescan 100 TB to
  * log a count".
  */
object PipelineMetrics {

  /** Attach named metrics to a stage; read them AFTER an action with
    * [[metrics]]. Aggregates must be commutative (count/sum/min/max —
    * Spark rejects distinct aggregates here by design). */
  def observed(df: DataFrame, name: String,
               first: Column, rest: Column*): (Observation, DataFrame) = {
    val obs = Observation(name)
    (obs, df.observe(obs, first, rest: _*))
  }

  /** Block until the observed action finished and return the metrics
    * row as a name→value map. */
  def metrics(obs: Observation): Map[String, Any] = obs.get
}

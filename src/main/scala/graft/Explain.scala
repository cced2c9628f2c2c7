package graft
import org.apache.spark.sql.SparkSession
/** Plan audit helper (not part of the driver contract — used to keep
  * shuffle counts honest while iterating):
  *   runMain graft.Explain <queryName> <sfDir>  → formatted plan
  *   runMain graft.Explain ALL <sfDir>          → one audit line per
  *     query: Exchange / Sort / CartesianProduct / NestedLoop counts
  *     in the pre-AQE physical plan, flagging scale red flags.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (name == "ALL") {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (qn, fn) =>
        val line = try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          def n(p: String) = p.r.findAllIn(plan).size
          f"$qn%-26s exchanges=${n("Exchange")}%2d sorts=${n("(?m)^[^\\n]*\\bSort\\b")}%2d " +
            f"cartesian=${n("CartesianProduct")} bnlj=${n("BroadcastNestedLoop")} smj=${n("SortMergeJoin")}"
        } catch { case e: Throwable => s"$qn ERROR ${e.getClass.getSimpleName}" }
        println(line)
      }
    } else {
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

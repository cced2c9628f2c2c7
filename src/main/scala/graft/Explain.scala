package graft
import org.apache.spark.sql.SparkSession
/** Plan audit helper: print the formatted physical plan of one named
  * query (args: <queryName> <sfDir>). Not part of the driver contract —
  * used to keep shuffle counts honest while iterating. */
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
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}

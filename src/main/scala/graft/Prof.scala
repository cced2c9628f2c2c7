package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local stage-level profiling harness (builder tool; the driver never
  * runs this). Times named sub-stages of the expensive operators so
  * optimization effort lands where the time actually goes — per-query
  * bench numbers alone can't attribute cost inside a pipeline.
  * Methodology matches Bench: toRdd.count() on the compiled plan,
  * untimed warmup, min of n, caches cleared between runs.
  *
  * The profiled slice rotates with whatever is currently under
  * optimization; earlier rounds' sections (minhash pair decomposition,
  * PQ encode/search split, signature-index probe anatomy) live in git
  * history.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        spark.sharedState.cacheManager.clearCache()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = (1 to 3).map(_ => once()).min
      println(f"PROF $name%-40s $best%8.3f s")
    }

    // q117 trade-PageRank decomposition
    def edges(): DataFrame = {
      val li = Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"),
        col("l_extendedprice").cast("decimal(18,4)").as("price"))
      val ord = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.load(spark, sfDir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables.load(spark, sfDir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"), col("price"))
        .groupBy("src", "dst")
        .agg((sum(col("price")) * lit(10000)).cast("long").as("w"))
    }
    val nations = Tables.load(spark, sfDir, "nation").select("n_nationkey")
    time("q117_edges_only")(edges())
    time("q117_pr_iters0")(graft.ops.Graph.pageRank(edges(), nations, iters = 0))
    time("q117_pr_iters1")(graft.ops.Graph.pageRank(edges(), nations, iters = 1))
    time("q117_pr_iters3")(graft.ops.Graph.pageRank(edges(), nations, iters = 3))
    time("q117_registered")(SparkEntry.queries("q117_trade_pagerank")(spark, sfDir))
    spark.stop()
  }
}

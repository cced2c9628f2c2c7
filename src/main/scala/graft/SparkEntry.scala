package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtendedQueries, MultimodalQueries, ParityQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 + the
  * LLM-pipeline extension ops); each entry that has an ANSI-SQL
  * equivalent also appears in `oracleSql` for the driver's DuckDB
  * hash-compare at sf0.01.
  */
object SparkEntry {

  private def allDefs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    ParityQueries.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      MultimodalQueries.defs ++ ExtendedQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q22_star_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, q, _) => n -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}

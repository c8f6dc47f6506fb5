package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared query inventory (SURVEY.md §2-B) lives in graft.ops.*; this
  * object just assembles the maps the driver consumes. Each `Q` carries its
  * Spark plan and (when ANSI-SQL-expressible) the DuckDB oracle SQL; keys
  * with `oracle = None` are verified by ScalaTest instead.
  */
object SparkEntry {

  /** Every declared query, one Q per SURVEY.md §2-B key. */
  val inventory: Seq[Q] =
    Relational.all ++ Aggregates.all ++ Windows.all ++ SetOps.all ++
      Scalars.all ++ TimeWindows.all ++ TextOps.all ++ Similarity.all ++
      Dedup.all ++ Multimodal.all ++ BusE2E.all ++ Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Curation, Graph, GraphXQueries, Lang, Pipeline, RegQuery, Relational, Streaming}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is represented by one
  * entry in `queries`; SQL-expressible ones also carry DuckDB oracle SQL
  * in `oracleSql` (same column names as the Spark result — the driver
  * compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** All query registries, concatenated. Extended per milestone. */
  def registry: Seq[RegQuery] =
    Relational.registry ++ Graph.registry ++ Pipeline.registry ++
      Curation.registry ++ Streaming.registry ++ GraphXQueries.registry ++
      Lang.registry

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

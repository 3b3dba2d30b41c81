package graft

import graft.hll.functions._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   *
   * The library's signature move end-to-end: per-day distinct-user sketches
   * (map-side collapsed, shuffle bounded by |days|×sketch bytes), then
   * re-aggregated to a total without rescanning raw events. */
  def entry(spark: SparkSession): DataFrame = {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_init_agg(col("user_id"), 0.02).as("users_hll"),
        count(lit(1)).as("n_events"))
    daily.select(col("day"), hll_cardinality(col("users_hll")).as("daily_users"),
      col("n_events"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.PipelineQueries.queries ++
      graft.queries.SqlSurfaceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++ graft.queries.PipelineQueries.oracles ++
      graft.queries.SqlSurfaceQueries.oracles
}

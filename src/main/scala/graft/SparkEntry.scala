package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.9. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (RelationalQueries.q01PricingSummary _),
    "q02_top_customers" -> (RelationalQueries.q02TopCustomers _),
    "q03_star_join" -> (RelationalQueries.q03StarJoin _),
    "q04_semi_anti" -> (RelationalQueries.q04SemiAnti _),
    "q05_rollup_cube" -> (RelationalQueries.q05RollupCube _),
    "q06_window_rank" -> (RelationalQueries.q06WindowRank _),
    "q07_running_window" -> (RelationalQueries.q07RunningWindow _),
    "q08_lag_sessions" -> (RelationalQueries.q08LagSessions _),
    "q09_event_windows" -> (RelationalQueries.q09EventWindows _),
    "q10_json_props" -> (RelationalQueries.q10JsonProps _),
    "q11_distinct_users" -> (RelationalQueries.q11DistinctUsers _),
    "q11b_approx_distinct" -> (RelationalQueries.q11bApproxDistinct _),
    "q12_set_ops" -> (RelationalQueries.q12SetOps _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> OracleSql.q01,
    "q02_top_customers" -> OracleSql.q02,
    "q03_star_join" -> OracleSql.q03,
    "q04_semi_anti" -> OracleSql.q04,
    "q05_rollup_cube" -> OracleSql.q05,
    "q06_window_rank" -> OracleSql.q06,
    "q07_running_window" -> OracleSql.q07,
    "q08_lag_sessions" -> OracleSql.q08,
    "q09_event_windows" -> OracleSql.q09,
    "q10_json_props" -> OracleSql.q10,
    "q11_distinct_users" -> OracleSql.q11,
    "q12_set_ops" -> OracleSql.q12
  )
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational query surface (SURVEY §2.9 q01–q12): scans, star joins,
  * semi/anti joins, rollup/cube, windows, sessionization, JSON, set ops.
  *
  * Determinism conventions for the DuckDB-oracle hash match (SURVEY §7):
  *   - money/double aggregates are computed over exact DECIMAL casts
  *     (sums of decimals are order-independent; double sums are not),
  *     then cast to DOUBLE at the very end — identically in the oracle;
  *   - every query ends with ORDER BY over its full output column list;
  *   - column names are aliased identically on both sides.
  *
  * Scale posture: all aggregations are plain groupBy (partial+final hash
  * agg), all dimension joins are broadcast-able (Catalyst/AQE decide; the
  * dims here are KB-sized even at 100 TB fact scale), and all filters are
  * simple column predicates that push into the parquet scan.
  */
object RelationalQueries {

  /** Exact 2-decimal cast: the driver data carries at most 2 decimals in
    * every money column (verified against sf0.001), so DECIMAL(12,2) is a
    * lossless representation and decimal aggregation is exact. */
  private def dec(c: String): Column = col(c).cast(DecimalType(12, 2))

  /** q01 — TPC-H Q1-shaped pricing summary: scan → filter (pushed) →
    * partial+final hash agg → order. Ref analogue: per-group counting in
    * rules.cpp:12-15 scaled to fact-table aggregation [north-star A7]. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")) *
            (lit(1) + dec("l_tax"))).cast("double").as("sum_charge"),
        round(sum(dec("l_quantity")).cast("double") / count(lit(1)), 6)
          .as("avg_qty"),
        round(sum(dec("l_extendedprice")).cast("double") / count(lit(1)), 6)
          .as("avg_price"),
        round(sum(dec("l_discount")).cast("double") / count(lit(1)), 6)
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }
}
